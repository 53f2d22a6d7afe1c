"""Graph-structure operations: self-loops, GCN normalization, CSR, padding.

Reference semantics pinned here (see /root/reference/src/keras_geometric/
utils/main.py:8-33):

- ``add_self_loops``: appends one ``(i, i)`` edge per node *after* the user
  edges, preserving order (utils/main.py:13-15).
- ``gcn_norm``: per-edge weight ``(d[tgt]+1e-12)^-1/2 * (d[src]+1e-12)^-1/2``
  where ``d`` is the **in-degree computed from receiver indices** (including
  any self-loops already present in ``edge_index``), inf -> 0
  (utils/main.py:22-33).

TPU-first additions with no reference analog: mask-aware variants of both (so
padded graphs keep exact numerics), host-side COO->CSR conversion with
receiver-sorted edge permutation (XLA lowers sorted segment reductions to a
fast path), and bucket padding utilities that make every shape static under
jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .segment import segment_count

__all__ = [
    "ensure_edge_index",
    "add_self_loops",
    "gcn_norm",
    "sort_edges_by_receiver",
    "coo_to_csr",
    "pad_edges",
    "pad_nodes",
    "round_up",
    "CSRGraph",
]


def ensure_edge_index(edge_index: jax.Array) -> jax.Array:
    """Canonicalize edge_index to int32 ``[2, E]``.

    Accepts ``[2, E]`` or ``[E, 2]`` (auto-transposed, matching the
    reference's convention at gcn_conv.py:310-318). Shapes are static under
    jit so this branch resolves at trace time. The ambiguous 2x2 case is
    treated as already ``[2, E]``.
    """
    edge_index = jnp.asarray(edge_index)
    if edge_index.ndim != 2:
        raise ValueError(f"edge_index must be rank-2, got shape {edge_index.shape}")
    if edge_index.shape[0] != 2:
        if edge_index.shape[1] == 2:
            edge_index = edge_index.T
        else:
            raise ValueError(
                f"edge_index must be [2, E] or [E, 2], got {edge_index.shape}"
            )
    return edge_index.astype(jnp.int32)


def add_self_loops(
    edge_index: jax.Array,
    num_nodes: int,
    *,
    edge_mask: jax.Array | None = None,
    node_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array | None]:
    """Append one self-loop per node after the existing edges.

    Returns ``(edge_index_with_loops, edge_mask_with_loops)``. When masks are
    supplied, loops are appended for all ``num_nodes`` slots but loops on
    padded (masked-out) nodes are masked, keeping padded-graph numerics
    identical to the unpadded graph.
    """
    edge_index = ensure_edge_index(edge_index)
    loops = jnp.arange(num_nodes, dtype=edge_index.dtype)
    loop_edges = jnp.stack([loops, loops], axis=0)
    out = jnp.concatenate([edge_index, loop_edges], axis=1)
    if edge_mask is None and node_mask is None:
        return out, None
    e = edge_index.shape[1]
    em = (
        edge_mask
        if edge_mask is not None
        else jnp.ones((e,), dtype=jnp.bool_)
    )
    nm = (
        node_mask
        if node_mask is not None
        else jnp.ones((num_nodes,), dtype=jnp.bool_)
    )
    return out, jnp.concatenate([em, nm], axis=0)


def gcn_norm(
    edge_index: jax.Array,
    num_nodes: int,
    *,
    edge_mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Symmetric GCN edge weights from receiver in-degree.

    ``w_e = (d[recv]+1e-12)^-1/2 * (d[send]+1e-12)^-1/2``; inf -> 0.
    Masked edges contribute nothing to degrees and get weight for the dummy
    degree they see (their message is masked downstream anyway).
    """
    edge_index = ensure_edge_index(edge_index)
    senders, receivers = edge_index[0], edge_index[1]
    deg = segment_count(
        receivers,
        num_nodes,
        mask=edge_mask,
        dtype=dtype,
        indices_are_sorted=indices_are_sorted,
    )
    inv_sqrt = jnp.power(deg + jnp.asarray(1e-12, dtype=dtype), -0.5)
    inv_sqrt = jnp.where(jnp.isinf(inv_sqrt), jnp.zeros_like(inv_sqrt), inv_sqrt)
    return jnp.take(inv_sqrt, receivers, axis=0) * jnp.take(inv_sqrt, senders, axis=0)


# ---------------------------------------------------------------------------
# Host-side preprocessing (numpy): CSR build, sorting, padding.
# These run once per graph outside jit; the reference instead re-branches on
# dynamic sizes inside every forward call (message_passing.py:180-188).
# ---------------------------------------------------------------------------


class CSRGraph(NamedTuple):
    """Receiver-sorted (CSR) static-shape graph structure.

    ``senders``/``receivers`` are sorted by receiver; ``row_ptr[i]:row_ptr[i+1]``
    spans the incoming edges of node ``i``. ``perm`` maps sorted-edge position
    back to original edge id (for edge features). Padded edge slots (if any)
    point at node ``num_nodes - 1`` with ``edge_mask`` False.
    """

    senders: np.ndarray  # [E_pad] int32, receiver-sorted
    receivers: np.ndarray  # [E_pad] int32, non-decreasing
    row_ptr: np.ndarray  # [N+1] int32
    perm: np.ndarray  # [E_pad] int32 (original edge ids; pad slots = E)
    edge_mask: np.ndarray  # [E_pad] bool
    num_nodes: int
    num_edges: int  # true (unpadded) edge count


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def sort_edges_by_receiver(
    senders: np.ndarray, receivers: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable-sort edges by receiver; returns (senders, receivers, perm)."""
    perm = np.argsort(receivers, kind="stable").astype(np.int32)
    return (
        np.asarray(senders, np.int32)[perm],
        np.asarray(receivers, np.int32)[perm],
        perm,
    )


def coo_to_csr(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    pad_to: int | None = None,
) -> CSRGraph:
    """Build a receiver-sorted CSR structure, optionally padded to ``pad_to``."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    num_edges = int(senders.shape[0])
    s, r, perm = sort_edges_by_receiver(senders, receivers)
    row_counts = np.bincount(r, minlength=num_nodes).astype(np.int32)
    row_ptr = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(row_counts, out=row_ptr[1:])
    if pad_to is not None:
        if pad_to < num_edges:
            raise ValueError(f"pad_to={pad_to} < num_edges={num_edges}")
        pad = pad_to - num_edges
        dummy = max(num_nodes - 1, 0)
        s = np.concatenate([s, np.full(pad, dummy, np.int32)])
        r = np.concatenate([r, np.full(pad, dummy, np.int32)])
        perm = np.concatenate([perm, np.full(pad, num_edges, np.int32)])
    mask = np.arange(s.shape[0]) < num_edges
    return CSRGraph(
        senders=s,
        receivers=r,
        row_ptr=row_ptr,
        perm=perm,
        edge_mask=mask,
        num_nodes=num_nodes,
        num_edges=num_edges,
    )


def pad_edges(
    edge_index: np.ndarray, target_e: int, num_nodes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a ``[2, E]`` COO edge list to ``[2, target_e]`` with masked dummies."""
    edge_index = np.asarray(edge_index, np.int32)
    if edge_index.shape[0] != 2:
        edge_index = edge_index.T
    e = edge_index.shape[1]
    if target_e < e:
        raise ValueError(f"target_e={target_e} < E={e}")
    dummy = max(num_nodes - 1, 0)
    pad = np.full((2, target_e - e), dummy, np.int32)
    mask = np.arange(target_e) < e
    return np.concatenate([edge_index, pad], axis=1), mask


def pad_nodes(
    x: np.ndarray, target_n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad node features ``[N, F]`` to ``[target_n, F]`` with a mask."""
    x = np.asarray(x)
    n = x.shape[0]
    if target_n < n:
        raise ValueError(f"target_n={target_n} < N={n}")
    pad = np.zeros((target_n - n,) + x.shape[1:], dtype=x.dtype)
    mask = np.arange(target_n) < n
    return np.concatenate([x, pad], axis=0), mask
