"""GraphSAGE convolution (Hamilton et al. 2017), TPU-native.

``h' = act(W_self h + W_neigh AGG(h_j) + b)`` with optional L2 normalize.

Parity contract with the reference
(/root/reference/src/keras_geometric/layers/sage_conv.py:10-509):

- aggregators: mean/max/sum/min/std/pooling; ``pooling`` = elementwise max
  over ``Dense(pool_dim, pool_activation)`` of neighbor features
  (sage_conv.py:184-198 + aggregators.py:254-274);
- ``lin_neigh``/``lin_self`` are bias-free Dense layers; a single shared bias
  is added after combining (sage_conv.py:203-233, 428-429);
- dropout applied to neighbor messages and (separately) to root features
  before ``lin_self`` (sage_conv.py:259-298, 414-423);
- no-edge graphs aggregate to zeros (pool-dim aware, sage_conv.py:318-326),
  so output degenerates to ``act(W_self x + b)``;
- default activation is relu; optional L2 normalization over features
  (sage_conv.py:436-437).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.graph_ops import ensure_edge_index
from ..ops.segment import segment_max
from .aggregators import aggregate
from .module import Dense, Module, dropout, get_activation

__all__ = ["SAGEConv"]

_VALID_AGGREGATORS = ("mean", "max", "sum", "min", "std", "pooling")


@dataclasses.dataclass(frozen=True)
class SAGEConv(Module):
    """GraphSAGE convolution with six aggregation strategies."""

    output_dim: int
    aggregator: str = "mean"
    normalize: bool = False
    root_weight: bool = True
    use_bias: bool = True
    activation: str | None = "relu"
    pool_activation: str | None = "relu"
    pool_hidden_dim: int | None = None
    dropout_rate: float = 0.0
    kernel_initializer: str = "glorot_uniform"
    bias_initializer: str = "zeros"

    def __post_init__(self):
        if self.aggregator not in _VALID_AGGREGATORS:
            raise ValueError(
                f"Invalid aggregator '{self.aggregator}'. "
                f"Must be one of {list(_VALID_AGGREGATORS)}"
            )

    def _pool_mlp(self, input_dim: int) -> Dense:
        return Dense(
            self.pool_hidden_dim or input_dim,
            activation=self.pool_activation,
            use_bias=self.use_bias,
            kernel_initializer=self.kernel_initializer,
            bias_initializer=self.bias_initializer,
        )

    def _lin(self) -> Dense:
        return Dense(
            self.output_dim,
            use_bias=False,
            kernel_initializer=self.kernel_initializer,
        )

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        k_pool, k_neigh, k_self, k_bias = jax.random.split(rng, 4)
        params: dict = {}
        neigh_in = input_dim
        if self.aggregator == "pooling":
            pool = self._pool_mlp(input_dim)
            params["pool_mlp"] = pool.init(k_pool, input_dim, dtype)
            neigh_in = pool.units
        params["lin_neigh"] = self._lin().init(k_neigh, neigh_in, dtype)
        if self.root_weight:
            params["lin_self"] = self._lin().init(k_self, input_dim, dtype)
        if self.use_bias:
            params["bias"] = jnp.zeros((self.output_dim,), dtype=dtype)
        return params

    def apply(
        self,
        params: dict,
        x: jax.Array,
        edge_index: jax.Array | None = None,
        *,
        edge_mask: jax.Array | None = None,
        training: bool = False,
        rng: jax.Array | None = None,
        indices_are_sorted: bool = False,
        context=None,
    ) -> jax.Array:
        if context is not None and isinstance(x, (tuple, list)):
            raise ValueError(
                "bipartite (x_target, x_source) inputs are not supported on "
                "the GraphContext path — a context is built for one node "
                "set; use the plain edge_index path instead."
            )
        num_nodes = x.shape[0]
        if num_nodes == 0:
            return jnp.zeros((0, self.output_dim), dtype=x.dtype)

        msg_rng = root_rng = None
        if rng is not None:
            msg_rng, root_rng = jax.random.split(rng)

        input_dim = x.shape[1]
        pool_dim = (
            (self.pool_hidden_dim or input_dim)
            if self.aggregator == "pooling"
            else input_dim
        )

        if context is not None:
            # Kernelized path: gathers carry sorted-scatter VJPs; sum/mean
            # aggregate via the Pallas SpMM, the rest via sorted XLA.
            # Without message dropout and with unit weights, sum/mean use
            # the fused spmm VJP (no [E, F] edge permutation in backward);
            # dropout on messages breaks linearity, so it keeps the
            # edge-level path.
            drop_active = training and self.dropout_rate > 0
            if (
                context.has_unit_weights
                and not drop_active
                and self.aggregator in ("sum", "mean")
            ):
                agg = (
                    context.spmm(x)
                    if self.aggregator == "sum"
                    else context.spmm_mean(x)
                )
                messages = None
            else:
                # Per-edge path: band/densified contexts route via the
                # full-stream companion (ops/csr.full_stream).
                fctx = context.full_stream()
                messages = fctx.gather(x)
                messages = dropout(
                    msg_rng, messages, self.dropout_rate, training
                )
            if messages is None:
                pass
            elif self.aggregator == "pooling":
                messages = self._pool_mlp(input_dim).apply(
                    params["pool_mlp"], messages
                )
                agg = segment_max(
                    messages, fctx.receivers, num_nodes,
                    mask=fctx.edge_mask, indices_are_sorted=True,
                )
            elif self.aggregator == "sum":
                agg = fctx.scatter(messages, masked=True)
            elif self.aggregator == "mean":
                agg = fctx.scatter_mean(messages)
            elif messages is not None:
                agg = aggregate(
                    self.aggregator, messages, fctx.receivers, num_nodes,
                    mask=fctx.edge_mask, indices_are_sorted=True,
                )
        elif edge_index is None:
            raise ValueError("edge_index required when no context is given")
        elif edge_index.size == 0:
            agg = jnp.zeros((num_nodes, pool_dim), dtype=x.dtype)
        else:
            edge_index = ensure_edge_index(edge_index)
            senders, receivers = edge_index[0], edge_index[1]
            messages = jnp.take(x, senders, axis=0)
            messages = dropout(msg_rng, messages, self.dropout_rate, training)
            if self.aggregator == "pooling":
                messages = self._pool_mlp(input_dim).apply(
                    params["pool_mlp"], messages
                )
                agg = segment_max(
                    messages,
                    receivers,
                    num_nodes,
                    mask=edge_mask,
                    indices_are_sorted=indices_are_sorted,
                )
            else:
                agg = aggregate(
                    self.aggregator,
                    messages,
                    receivers,
                    num_nodes,
                    mask=edge_mask,
                    indices_are_sorted=indices_are_sorted,
                )

        out = self._lin().apply(params["lin_neigh"], agg)
        if self.root_weight:
            x_root = dropout(root_rng, x, self.dropout_rate, training)
            out = out + self._lin().apply(params["lin_self"], x_root)
        if self.use_bias:
            out = out + params["bias"]
        out = get_activation(self.activation)(out)
        if self.normalize:
            norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
            out = out / jnp.maximum(norm, jnp.asarray(1e-12, dtype=out.dtype))
        return out
