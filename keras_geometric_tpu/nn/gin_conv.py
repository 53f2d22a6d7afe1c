"""Graph Isomorphism Network layer (Xu et al. 2019), TPU-native.

``h' = MLP((1 + eps) * h + AGG_{j in N(i)} h_j)``

Parity contract with the reference
(/root/reference/src/keras_geometric/layers/gin_conv.py:10-358):

- aggregator restricted to {mean, max, sum} (gin_conv.py:80-84);
- eps either fixed or a trainable scalar initialized to ``eps_init``
  (gin_conv.py:117-125);
- MLP = ``[Dense(h, act) + Dropout]* + Dense(out, linear)``
  (gin_conv.py:129-162);
- no-edge graphs compute ``MLP((1+eps) x)`` (gin_conv.py:269-280);
  empty graphs return ``[0, out]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.graph_ops import ensure_edge_index
from .aggregators import aggregate
from .module import MLP, Module

__all__ = ["GINConv"]

_VALID_AGGREGATORS = ("mean", "max", "sum")


@dataclasses.dataclass(frozen=True)
class GINConv(Module):
    """GIN convolution with configurable MLP and (optionally trainable) eps."""

    output_dim: int
    mlp_hidden: tuple[int, ...] = ()
    aggregator: str = "sum"
    eps_init: float = 0.0
    train_eps: bool = False
    use_bias: bool = True
    activation: str | None = "relu"
    dropout_rate: float = 0.0
    kernel_initializer: str = "glorot_uniform"
    bias_initializer: str = "zeros"

    def __post_init__(self):
        object.__setattr__(self, "mlp_hidden", tuple(self.mlp_hidden))
        if self.aggregator not in _VALID_AGGREGATORS:
            raise ValueError(
                f"Invalid aggregator: {self.aggregator}. "
                f"Must be one of {list(_VALID_AGGREGATORS)}"
            )

    def _mlp(self) -> MLP:
        return MLP(
            hidden_dims=self.mlp_hidden,
            output_dim=self.output_dim,
            activation=self.activation,
            use_bias=self.use_bias,
            dropout_rate=self.dropout_rate,
            kernel_initializer=self.kernel_initializer,
            bias_initializer=self.bias_initializer,
        )

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        params = {"mlp": self._mlp().init(rng, input_dim, dtype)}
        if self.train_eps:
            params["eps"] = jnp.full((1,), self.eps_init, dtype=dtype)
        return params

    def _eps(self, params: dict):
        return params["eps"] if self.train_eps else self.eps_init

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
        num_nodes = x.shape[0]
        if num_nodes == 0:
            return jnp.zeros((0, self.output_dim), dtype=x.dtype)
        mlp = self._mlp()
        eps = self._eps(params)

        if context is not None:
            # Kernelized path: sum/mean run the Pallas sorted SpMM. With
            # unit edge weights the fused spmm VJP applies (backward is a
            # node-cotangent gather + sorted scatter — no [E, F] edge
            # permutation).
            if context.has_unit_weights and self.aggregator == "sum":
                agg = context.spmm(x)
            elif context.has_unit_weights and self.aggregator == "mean":
                agg = context.spmm_mean(x)
            else:
                # Per-edge paths need every edge in the stream —
                # band/densified contexts route via the full companion.
                fctx = context.full_stream()
                if self.aggregator == "sum":
                    agg = fctx.scatter(fctx.gather(x), masked=True)
                elif self.aggregator == "mean":
                    agg = fctx.scatter_mean(fctx.gather(x))
                else:  # max: XLA sorted segment path
                    messages = fctx.gather(x)
                    from ..ops.segment import segment_max

                    agg = segment_max(
                        messages, fctx.receivers, num_nodes,
                        mask=fctx.edge_mask, indices_are_sorted=True,
                    )
            h = (1 + eps) * x + agg
            return mlp.apply(params["mlp"], h, training=training, rng=rng)
        if edge_index is None:
            raise ValueError("edge_index required when no context is given")

        if edge_index.size == 0:
            h = (1 + eps) * x
            return mlp.apply(params["mlp"], h, training=training, rng=rng)

        edge_index = ensure_edge_index(edge_index)
        senders, receivers = edge_index[0], edge_index[1]
        messages = jnp.take(x, senders, axis=0)
        agg = aggregate(
            self.aggregator,
            messages,
            receivers,
            num_nodes,
            mask=edge_mask,
            indices_are_sorted=indices_are_sorted,
        )
        h = (1 + eps) * x + agg
        return mlp.apply(params["mlp"], h, training=training, rng=rng)
