"""Device mesh construction helpers.

Thin wrappers over ``jax.sharding`` so the rest of the framework speaks one
vocabulary: a ``graph`` axis for graph/edge partitioning (the SP analog),
a ``data`` axis for graph-minibatch DP, and an optional ``model`` axis for
feature-dim tensor parallelism.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

__all__ = ["make_mesh", "graph_sharding", "replicated", "P", "Mesh"]


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("graph",),
    *,
    devices=None,
) -> Mesh:
    """Build a mesh over available devices (default: 1-D ``graph`` axis).

    ``jax.experimental.mesh_utils`` lays devices out so that neighboring
    mesh coordinates are ICI neighbors on real TPU slices.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def graph_sharding(mesh: Mesh, axis: str = "graph") -> NamedSharding:
    """Shard the leading (partition) axis of per-part arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
