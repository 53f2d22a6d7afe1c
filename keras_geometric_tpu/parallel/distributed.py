"""Distributed full-graph training: shard_map train/eval step factories.

Composes the per-chip SPMD kernels (parallel.spmd) into jitted multi-chip
training steps over a ``Mesh``:

- node features, labels, masks: sharded over the ``graph`` axis
  (``[P, L, ...]`` leading partition dim);
- edge shards: sharded over ``graph``;
- parameters/optimizer state: replicated (in_spec ``P()``); shard_map
  autodiff transposes the replication into a gradient ``psum`` — the
  canonical DP-style gradient all-reduce, inserted automatically;
- the masked loss is computed per chip and ``psum``-combined, so the jitted
  step returns a replicated scalar.

This is the "sequence-parallel" layout for GNNs (SURVEY.md §2.4): the node
set is the sequence, the adjacency is the attention pattern, and the
all-gather of transformed features is the analog of ring-attention's k/v
exchange — realized with XLA collectives over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from jax import shard_map

from .partition import PartitionedGraph, partition_graph
from .spmd import encoder_apply_local
from ..training.train import label_nll

__all__ = [
    "shard_partitioned_graph",
    "make_distributed_train_step",
    "make_distributed_eval_fn",
    "distributed_gcn_encoder",
    "partition_graph",
]


def _node_shards(arr, pg: PartitionedGraph):
    """Reshape a global ``[N, ...]`` array into ``[P, L, ...]`` shards."""
    import numpy as np

    arr = np.asarray(arr)
    n_pad = pg.padded_num_nodes
    pad_width = [(0, n_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    padded = np.pad(arr, pad_width)
    return padded.reshape((pg.num_parts, pg.nodes_per_part) + arr.shape[1:])


def shard_partitioned_graph(
    pg: PartitionedGraph,
    mesh: Mesh,
    *,
    x,
    y=None,
    masks: dict[str, Any] | None = None,
    axis: str = "graph",
    halo_plan=None,
    kernel_plan=None,
    attend_plan=None,
):
    """Device-put node data + edge shards with graph-axis sharding.

    Returns a dict of arrays, all ``[P, ...]`` with the leading axis sharded
    over the mesh: x, senders, receivers, edge_weight, edge_mask, node_mask,
    plus y/masks when given (mask values are combined with the partition's
    node validity mask so padded nodes never contribute to loss/metrics).
    With ``kernel_plan`` (parallel.kernel_plan.build_kernel_plan), the
    Pallas-kernelized overlapped-halo arrays are added under ``kp_*`` keys.
    """
    import numpy as np

    shard = NamedSharding(mesh, P(axis))
    edge_weight = (
        pg.edge_weight
        if pg.edge_weight is not None
        else np.ones_like(pg.edge_mask, dtype=np.float32)
    )
    senders = (
        halo_plan.senders_local if halo_plan is not None else pg.senders_global
    )
    out: dict[str, Any] = {
        "x": jax.device_put(_node_shards(x, pg), shard),
        "senders": jax.device_put(senders, shard),
        "receivers": jax.device_put(pg.receivers_local, shard),
        "edge_mask": jax.device_put(pg.edge_mask, shard),
        "edge_weight": jax.device_put(edge_weight, shard),
        "node_mask": jax.device_put(pg.node_mask, shard),
    }
    if halo_plan is not None:
        out["send_idx"] = jax.device_put(halo_plan.send_idx, shard)
    if kernel_plan is not None:
        from .kernel_plan import plan_device_data

        for k, v in plan_device_data(kernel_plan).items():
            out[f"kp_{k}"] = jax.device_put(v, shard)
    if attend_plan is not None:
        from .attend_plan import plan_device_data as attend_device_data

        for k, v in attend_device_data(attend_plan).items():
            out[f"kp_ap_{k}"] = jax.device_put(v, shard)
    if y is not None:
        out["y"] = jax.device_put(_node_shards(y, pg), shard)
    for name, m in (masks or {}).items():
        m_shards = _node_shards(np.asarray(m), pg) & pg.node_mask
        out[name] = jax.device_put(m_shards, shard)
    return out


def distributed_gcn_encoder(hidden_dims, **kwargs):
    """A GNNEncoder configured for distributed execution (self-loops + GCN
    normalization folded into the partition)."""
    from ..models.gnn import GNNEncoder

    conv_kwargs = tuple(
        {"add_self_loops": False, "normalize": False}.items()
    )
    return GNNEncoder(
        conv="gcn", hidden_dims=tuple(hidden_dims), conv_kwargs=conv_kwargs,
        **kwargs,
    )


def _loss_local(
    encoder, params, x, senders, receivers, ew, em, y, mask, rng, axis,
    training, halo_send_idx=None,
):
    """Per-chip masked-CE loss; psum'd to a replicated global mean."""
    logits = encoder_apply_local(
        encoder, params, x, senders, receivers, ew, em,
        axis=axis, training=training, rng=rng, halo_send_idx=halo_send_idx,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = label_nll(logp, y)
    m = mask.astype(nll.dtype)
    local_sum = jnp.sum(nll * m)
    local_cnt = jnp.sum(m)
    total = jax.lax.psum(local_sum, axis)
    count = jax.lax.psum(local_cnt, axis)
    return total / jnp.maximum(count, 1.0)


def make_distributed_train_step(
    encoder: Any,
    tx: Any,
    mesh: Mesh,
    *,
    axis: str = "graph",
    donate: bool = True,
    halo: bool = False,
    kernel_plan=None,
    attend_plan=None,
    compute_dtype=None,
) -> Callable:
    """Build a jitted multi-chip train step.

    Signature: ``step(state, data) -> (state, loss)`` where ``data`` is the
    dict from :func:`shard_partitioned_graph` (requires ``y`` and
    ``train_mask`` entries; with ``halo=True`` it must have been built with
    a ``halo_plan`` so senders are table-local and ``send_idx`` exists).
    With ``kernel_plan`` (and data built with the same plan), the per-chip
    body runs the Pallas sorted scatter with the halo all_to_all overlapped
    against local aggregation (parallel.kernel_plan).
    """
    import optax

    from ..training.train import TrainState

    if kernel_plan is not None:
        from .kernel_plan import plan_device_data
        from .spmd import encoder_apply_local_kernelized

        kp_keys = tuple(
            f"kp_{k}" for k in plan_device_data(kernel_plan)
        )
        if attend_plan is not None:
            from .attend_plan import plan_device_data as attend_device_data

            kp_keys = kp_keys + tuple(
                f"kp_ap_{k}" for k in attend_device_data(attend_plan)
            )
        data_keys = ("x", "y", "train_mask") + kp_keys
    else:
        data_keys = (
            "x", "senders", "receivers", "edge_weight", "edge_mask", "y",
            "train_mask",
        ) + (("send_idx",) if halo else ())
    data_specs = {k: P(axis) for k in data_keys}

    def loss_fn(params, data, rng):
        # Inside shard_map: leading partition axis is size-1; drop it.
        sq = lambda a: a[0]
        if kernel_plan is not None:
            kp_shard = {
                k[len("kp_"):]: sq(v)
                for k, v in data.items() if k.startswith("kp_")
            }
            x_local = sq(data["x"])
            p = params
            if compute_dtype is not None:
                # bf16 IO / f32 master params + loss (the single-chip
                # precision policy, bench.py): cast per step; gradients
                # accumulate in f32 through shard_map autodiff.
                cast = lambda a: (
                    a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a
                )
                p = jax.tree_util.tree_map(cast, params)
                x_local = cast(x_local)
                kp_shard = {k: cast(v) if k.endswith("weight") else v
                            for k, v in kp_shard.items()}
            logits = encoder_apply_local_kernelized(
                encoder, p, x_local, kp_shard, kernel_plan, attend_plan,
                axis=axis, training=True, rng=rng,
            ).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = label_nll(logp, sq(data["y"]))
            m = sq(data["train_mask"]).astype(nll.dtype)
            total = jax.lax.psum(jnp.sum(nll * m), axis)
            count = jax.lax.psum(jnp.sum(m), axis)
            return total / jnp.maximum(count, 1.0)
        return _loss_local(
            encoder,
            params,
            sq(data["x"]),
            sq(data["senders"]),
            sq(data["receivers"]),
            sq(data["edge_weight"]),
            sq(data["edge_mask"]),
            sq(data["y"]),
            sq(data["train_mask"]),
            rng,
            axis,
            True,
            halo_send_idx=sq(data["send_idx"]) if halo else None,
        )

    sharded_loss = shard_map(
        loss_fn,
        mesh=mesh,
        in_specs=(P(), data_specs, P()),
        out_specs=P(),
        check_vma=False,
    )

    def step(state: TrainState, data: dict):
        rng, sub = jax.random.split(state.rng)
        d = {k: data[k] for k in data_keys}
        loss, grads = jax.value_and_grad(sharded_loss)(state.params, d, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1, rng=rng),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_distributed_eval_fn(
    encoder: Any,
    mesh: Mesh,
    *,
    axis: str = "graph",
) -> Callable:
    """Jitted multi-chip masked accuracy: ``evaluate(params, data, mask)``."""

    def acc_local(params, x, senders, receivers, ew, em, y, mask):
        sq = lambda a: a[0]
        logits = encoder_apply_local(
            encoder, params, sq(x), sq(senders), sq(receivers), sq(ew), sq(em),
            axis=axis,
        )
        pred = jnp.argmax(logits, axis=-1)
        m = sq(mask).astype(jnp.float32)
        hit = (pred == sq(y)).astype(jnp.float32) * m
        return jax.lax.psum(jnp.sum(hit), axis) / jnp.maximum(
            jax.lax.psum(jnp.sum(m), axis), 1.0
        )

    sharded = shard_map(
        acc_local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(params, data, mask):
        return sharded(
            params,
            data["x"],
            data["senders"],
            data["receivers"],
            data["edge_weight"],
            data["edge_mask"],
            data["y"],
            mask,
        )

    return evaluate
