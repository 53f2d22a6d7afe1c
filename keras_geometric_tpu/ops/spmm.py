"""SpMM dispatch tier: scatter-reduce of edge messages into node rows.

This is the framework's single hottest op — every conv layer funnels its
``[E, F]`` messages through one of these reductions (the reference funnels
through ``keras.ops.segment_sum``/``segment_max``, aggregators.py:72,108).

Dispatch policy:
- default: XLA segment ops (``ops.segment``) — XLA already emits a good
  sorted-segmented reduction on TPU when ``indices_are_sorted=True``;
- opt-in: a Pallas gather-SpMM kernel (``kernels.spmm_pallas``) operating on
  receiver-sorted CSR, enabled via ``use_pallas=True`` or the
  ``KGT_USE_PALLAS=1`` environment variable on TPU backends.

Both paths are numerically identical (allclose-tested) and differentiable;
the Pallas path defines a custom VJP whose backward is an SpMM over the
transposed graph.
"""

from __future__ import annotations

import os

import jax

from . import segment

__all__ = ["scatter_sum", "use_pallas_default"]


def use_pallas_default() -> bool:
    if os.environ.get("KGT_USE_PALLAS", "") == "1":
        return True
    if os.environ.get("KGT_USE_PALLAS", "") == "0":
        return False
    return False  # conservative default; flipped by bench/config on TPU


def scatter_sum(
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
    use_pallas: bool | None = None,
    tables=None,
) -> jax.Array:
    """Sum-reduce ``[E, F]`` messages into ``[N, F]`` node rows.

    ``tables`` (a ``kernels.spmm_pallas.RowTables`` from graph
    preprocessing) selects the Pallas kernel explicitly; otherwise the
    Pallas path is taken when enabled, sorted, and running on TPU.
    """
    on_tpu = jax.default_backend() == "tpu" or (
        jax.devices() and jax.devices()[0].platform not in ("cpu", "gpu")
    )
    if tables is not None and indices_are_sorted and on_tpu:
        from ..kernels import spmm_pallas

        return spmm_pallas.scatter_sum_sorted(
            messages, receivers, num_nodes, mask=mask, tables=tables
        )
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas and indices_are_sorted and on_tpu:
        from ..kernels import spmm_pallas

        return spmm_pallas.scatter_sum_sorted(
            messages, receivers, num_nodes, mask=mask
        )
    return segment.segment_sum(
        messages,
        receivers,
        num_nodes,
        mask=mask,
        indices_are_sorted=indices_are_sorted,
    )
