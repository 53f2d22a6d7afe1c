"""Tensor (feature-dim) model parallelism for wide GNN layers.

SURVEY.md §2.4 item 3: shard the feature dimension of layer weights over
a ``model`` mesh axis — the Megatron column/row-parallel pattern, adapted
to message passing. The key structural fact making TP cheap for GNNs:
**graph aggregation is feature-wise independent**, so a feature-sharded
activation passes through gather/scatter/segment ops with ZERO extra
communication; collectives appear only where the math contracts over the
feature dim (a row-parallel matmul's ``psum``).

Layout (per layer pair, Megatron-style):

1. column-parallel: ``h_shard = x @ W1[:, shard]`` — output features
   sharded, no comm;
2. graph aggregation on the shard (spmm/segment ops) — no comm;
3. row-parallel: ``out = psum_model(h_shard @ W2[shard, :]) + b`` — one
   ``psum`` over the model axis re-materializes the full output.

These are ``shard_map`` body functions (like parallel.spmd) and compose
with the ``graph`` axis: a 2-D mesh ``(graph, model)`` shards nodes over
``graph`` and features over ``model``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "column_parallel_dense",
    "row_parallel_dense",
    "shard_params_tp",
    "tp_gcn_block_local",
    "tp_graph_gcn_block_local",
]


def column_parallel_dense(
    x: jax.Array, kernel_shard: jax.Array,
    bias_shard: jax.Array | None = None,
) -> jax.Array:
    """``[.., F_in] @ [F_in, F_out/T] -> [.., F_out/T]`` — no collective;
    outputs stay feature-sharded over the model axis."""
    out = x @ kernel_shard
    if bias_shard is not None:
        out = out + bias_shard
    return out


def row_parallel_dense(
    x_shard: jax.Array, kernel_shard: jax.Array,
    bias: jax.Array | None = None, *, axis: str = "model",
) -> jax.Array:
    """``[.., F_in/T] @ [F_in/T, F_out] -> psum -> [.., F_out]``.

    The contraction over the sharded input dim completes with one
    ``psum`` over the model axis; ``bias`` is replicated and added after.
    """
    partial = x_shard @ kernel_shard
    out = jax.lax.psum(partial, axis)
    if bias is not None:
        out = out + bias
    return out


def shard_params_tp(params: dict, num_shards: int) -> list[dict]:
    """Host-side: split a 2-layer dense param dict into per-shard pieces.

    ``layer_0.kernel [F_in, H]`` splits column-wise, ``layer_1.kernel
    [H, F_out]`` row-wise; ``layer_0.bias`` splits with its columns,
    ``layer_1.bias`` is replicated. Returns ``num_shards`` dicts to stack
    for a shard_map model axis.
    """
    import numpy as np

    k0 = np.asarray(params["layer_0"]["kernel"])
    k1 = np.asarray(params["layer_1"]["kernel"])
    h = k0.shape[1]
    assert h % num_shards == 0, "hidden dim must divide the model axis"
    s = h // num_shards
    shards = []
    for t in range(num_shards):
        p = {
            "layer_0": {"kernel": k0[:, t * s: (t + 1) * s]},
            "layer_1": {"kernel": k1[t * s: (t + 1) * s, :]},
        }
        if "bias" in params["layer_0"]:
            p["layer_0"]["bias"] = np.asarray(
                params["layer_0"]["bias"]
            )[t * s: (t + 1) * s]
        if "bias" in params["layer_1"]:
            p["layer_1"]["bias"] = np.asarray(params["layer_1"]["bias"])
        shards.append(p)
    return shards


def tp_graph_gcn_block_local(
    p_shard: dict,
    x_local: jax.Array,
    senders_global: jax.Array,
    receivers_local: jax.Array,
    edge_weight: jax.Array,
    edge_mask: jax.Array,
    *,
    graph_axis: str = "graph",
    model_axis: str = "model",
    activation=jax.nn.relu,
) -> jax.Array:
    """Per-chip body of a 2-layer GCN block on a 2-D ``(graph, model)``
    mesh — nodes sharded over ``graph`` (receiver-range partitioning,
    parallel.partition), features sharded over ``model`` (Megatron
    column/row pattern).

    The two axes compose multiplicatively in comm savings: the sender
    feature table is materialized by an all_gather over ``graph`` of the
    FEATURE-SHARDED activations, so each chip moves ``N * F/T`` bytes
    instead of ``N * F`` — tensor parallelism divides the graph axis'
    dominant collective. The aggregation itself stays feature-wise
    independent (no comm on ``model``); the single ``psum`` of the
    row-parallel output is the only model-axis collective per block.

    Numerically identical to the unsharded block (tests pin it on a
    (graph=4, model=2) virtual mesh).
    """
    from ..ops.segment import segment_sum

    num_local = x_local.shape[0]

    def propagate(h_local):
        # Feature-sharded all_gather over the graph axis: [L, F/T] ->
        # [N, F/T] — T-fold smaller than the unsharded exchange.
        h_full = jax.lax.all_gather(
            h_local, graph_axis, axis=0, tiled=True
        )
        msgs = jnp.take(h_full, senders_global, axis=0)
        msgs = msgs * edge_weight[:, None]
        return segment_sum(
            msgs, receivers_local, num_local, mask=edge_mask,
            indices_are_sorted=True,
        )

    h = column_parallel_dense(x_local, p_shard["layer_0"]["kernel"])
    h = propagate(h)  # node- AND feature-sharded: graph comm only
    b0 = p_shard["layer_0"].get("bias")
    if b0 is not None:
        h = h + b0  # GCN adds bias AFTER aggregation (update hook)
    h = activation(h)
    h = propagate(h)
    return row_parallel_dense(
        h, p_shard["layer_1"]["kernel"], p_shard["layer_1"].get("bias"),
        axis=model_axis,
    )


def tp_gcn_block_local(
    p_shard: dict,
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    edge_mask: jax.Array,
    *,
    axis: str = "model",
    activation=jax.nn.relu,
) -> jax.Array:
    """Per-chip body of a 2-layer tensor-parallel GCN block.

    ``W1`` column-parallel -> per-shard GCN propagate (feature-wise
    independent: no comm) -> activation -> per-shard propagate of layer 2
    inputs -> ``W2`` row-parallel (one psum). Numerically identical to the
    unsharded 2-layer GCN block with the same weights.
    """
    from ..ops.segment import segment_sum

    n = x.shape[0]

    def propagate(h):
        msgs = jnp.take(h, senders, axis=0) * edge_weight[:, None]
        return segment_sum(msgs, receivers, n, mask=edge_mask)

    h = column_parallel_dense(x, p_shard["layer_0"]["kernel"])
    h = propagate(h)  # feature-sharded: no collective
    b0 = p_shard["layer_0"].get("bias")
    if b0 is not None:
        h = h + b0  # GCN adds bias AFTER aggregation (update hook)
    h = activation(h)
    h = propagate(h)  # second layer propagates its input shard
    return row_parallel_dense(
        h, p_shard["layer_1"]["kernel"], p_shard["layer_1"].get("bias"),
        axis=axis,
    )
