"""Attention-based readouts: AttentionPooling and Set2Set.

Parity contracts with the reference
(/root/reference/src/keras_geometric/layers/pooling/attention_pooling.py):

- ``AttentionPooling``: ``tanh`` Dense transform -> scalar score Dense ->
  softmax over the node axis -> weighted sum, output ``[1, F]``
  (attention_pooling.py:394-414);
- ``Set2Set``: T processing steps of {attend with ``Dense(1, tanh)`` over
  ``[x, h]``, softmax over nodes, weighted-sum read, LSTM-cell state update},
  then one final attention pass; output ``[1, lstm_units + F]`` = concat of
  the last LSTM hidden state with the attended features
  (attention_pooling.py:146-217).

TPU-first: the reference's Python ``for`` loop over processing steps
(attention_pooling.py:155-193) becomes ``lax.scan`` so the step count does
not unroll into the trace, and the LSTM cell is implemented functionally
(standard LSTM equations, forget-bias 1.0, matching Keras ``LSTMCell``
defaults: glorot kernel, orthogonal recurrent kernel, unit_forget_bias).
Both support an optional ``node_mask`` for padded graphs (masked nodes get
zero attention weight).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..module import Dense, Module, get_initializer

__all__ = ["AttentionPooling", "Set2Set"]


def _masked_softmax_over_nodes(
    scores: jax.Array, node_mask: jax.Array | None
) -> jax.Array:
    """Softmax over axis 0 of ``[N, 1]`` scores, masked nodes -> weight 0."""
    if node_mask is not None:
        neg = jnp.asarray(-jnp.inf, dtype=scores.dtype)
        scores = jnp.where(node_mask[:, None], scores, neg)
    return jax.nn.softmax(scores, axis=0)


@dataclasses.dataclass(frozen=True)
class AttentionPooling(Module):
    """Softmax-over-nodes weighted-sum readout."""

    attention_dim: int | None = None
    dropout: float = 0.0

    def __post_init__(self):
        if self.attention_dim is not None and self.attention_dim <= 0:
            raise ValueError(
                f"attention_dim must be positive, got {self.attention_dim}"
            )
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")

    def _layers(self, input_dim: int) -> tuple[Dense, Dense]:
        att_dim = self.attention_dim if self.attention_dim is not None else input_dim
        return (
            Dense(att_dim, activation="tanh"),
            Dense(1, activation=None),
        )

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        transform, score = self._layers(input_dim)
        k1, k2 = jax.random.split(rng)
        return {
            "attention_transform": transform.init(k1, input_dim, dtype),
            "attention_score": score.init(k2, transform.units, dtype),
        }

    def apply(
        self,
        params: dict,
        x: jax.Array,
        *,
        node_mask: jax.Array | None = None,
        training: bool = False,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        from ..module import dropout as _dropout

        input_dim = x.shape[1]
        transform, score = self._layers(input_dim)
        # Dropout feeds only the attention computation; the weighted sum uses
        # the original features (attention_pooling.py:398-414).
        dropped = _dropout(rng, x, self.dropout, training)
        feats = transform.apply(params["attention_transform"], dropped)
        scores = score.apply(params["attention_score"], feats)  # [N, 1]
        weights = _masked_softmax_over_nodes(scores, node_mask)
        return jnp.sum(weights * x, axis=0, keepdims=True)


def _lstm_cell_apply(
    params: dict, x: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Standard LSTM cell step (Keras gate order i, f, c, o)."""
    z = x @ params["kernel"] + h @ params["recurrent_kernel"] + params["bias"]
    units = h.shape[-1]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    del units
    return h_new, c_new


@dataclasses.dataclass(frozen=True)
class Set2Set(Module):
    """LSTM-attention readout over T processing steps (Vinyals et al. 2016)."""

    output_dim: int
    processing_steps: int = 3
    lstm_units: int | None = None
    dropout: float = 0.0

    def __post_init__(self):
        if self.output_dim <= 0:
            raise ValueError(f"output_dim must be positive, got {self.output_dim}")
        if self.processing_steps <= 0:
            raise ValueError(
                f"processing_steps must be positive, got {self.processing_steps}"
            )
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")

    @property
    def units(self) -> int:
        return self.lstm_units if self.lstm_units is not None else self.output_dim

    def out_features(self, input_dim: int) -> int:
        return self.units + input_dim

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        k_kernel, k_rec, k_att = jax.random.split(rng, 3)
        units = self.units
        glorot = get_initializer("glorot_uniform")
        orth = get_initializer("orthogonal")
        # unit_forget_bias: bias = [0, 1, 0, 0] blocks (Keras LSTMCell default).
        bias = jnp.concatenate(
            [
                jnp.zeros((units,), dtype),
                jnp.ones((units,), dtype),
                jnp.zeros((2 * units,), dtype),
            ]
        )
        att = Dense(1, activation="tanh")
        return {
            "lstm": {
                "kernel": glorot(k_kernel, (input_dim, 4 * units), dtype),
                "recurrent_kernel": orth(k_rec, (units, 4 * units), dtype),
                "bias": bias,
            },
            "attention_dense": att.init(k_att, input_dim + units, dtype),
        }

    def apply(
        self,
        params: dict,
        x: jax.Array,
        *,
        node_mask: jax.Array | None = None,
        training: bool = False,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        from ..module import dropout as _dropout

        num_nodes, input_dim = x.shape
        units = self.units
        att = Dense(1, activation="tanh")
        drop_active = training and self.dropout > 0.0
        if drop_active and rng is None:
            raise ValueError("dropout requires an rng key when training")

        def attend(h: jax.Array, key) -> jax.Array:
            """One attention read: [1, units] hidden -> [1, F] features.

            Dropout hits the attention INPUT (the [x, h] concat) each step
            and in the final pass, exactly like the reference
            (attention_pooling.py:166-172, 202-205); the weighted sum uses
            the original features.
            """
            h_expanded = jnp.broadcast_to(h, (num_nodes, units))
            att_in = jnp.concatenate([x, h_expanded], axis=-1)
            if drop_active:
                att_in = _dropout(key, att_in, self.dropout, training)
            scores = att.apply(params["attention_dense"], att_in)  # [N, 1]
            weights = _masked_softmax_over_nodes(scores, node_mask)
            return jnp.sum(weights * x, axis=0, keepdims=True)

        if drop_active:
            keys = jax.random.split(rng, self.processing_steps + 1)
            step_keys, final_key = keys[:-1], keys[-1]
        else:
            step_keys = jnp.zeros((self.processing_steps, 2), jnp.uint32)
            final_key = None

        def step(carry, key):
            h, c = carry
            read = attend(h, key)
            h_new, c_new = _lstm_cell_apply(params["lstm"], read, h, c)
            return (h_new, c_new), None

        h0 = jnp.zeros((1, units), dtype=x.dtype)
        c0 = jnp.zeros((1, units), dtype=x.dtype)
        (h, _), _ = jax.lax.scan(step, (h0, c0), step_keys)
        final_read = attend(h, final_key)
        return jnp.concatenate([h, final_read], axis=-1)
