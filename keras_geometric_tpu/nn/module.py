"""Lightweight functional module system.

Design: a *module* is a frozen dataclass of hyperparameters with two methods:

- ``init(rng, input_dim) -> params`` — build the parameter pytree (plain
  nested dicts of jnp arrays), analogous to Keras ``build()``.
- ``apply(params, *args, **kwargs) -> output`` — pure function of params and
  inputs; safe under ``jit``/``grad``/``shard_map``.

This replaces the reference's Keras ``Layer`` (stateful build/call,
message_passing.py:9-320) with explicit-parameter functional style — the
idiomatic shape for JAX/XLA: params are first-class pytrees you can shard
with ``jax.sharding``, donate, or checkpoint with orbax directly.

Serialization parity with the reference's ``get_config``/``from_config``
(e.g. gcn_conv.py:366-426) comes for free from the dataclass fields:
``get_config()`` returns the field dict, ``from_config`` reconstructs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = [
    "Module",
    "Dense",
    "MLP",
    "get_initializer",
    "get_activation",
    "dropout",
]

_INITIALIZERS: dict[str, Callable[..., Any]] = {
    "glorot_uniform": jax.nn.initializers.glorot_uniform,
    "glorot_normal": jax.nn.initializers.glorot_normal,
    "he_uniform": jax.nn.initializers.he_uniform,
    "he_normal": jax.nn.initializers.he_normal,
    "lecun_uniform": jax.nn.initializers.lecun_uniform,
    "lecun_normal": jax.nn.initializers.lecun_normal,
    "orthogonal": jax.nn.initializers.orthogonal,
}


def get_initializer(name_or_fn) -> Callable[[jax.Array, tuple, Any], jax.Array]:
    """Resolve an initializer by name (Keras-style strings) or pass through.

    Zero-size fan dimensions (a graph with 0 input features — the
    reference supports this, tests/unit/test_error_handling.py:397)
    degrade variance-scaled initializers to zeros instead of the
    ZeroDivisionError jax's glorot raises.
    """
    base = _resolve_initializer(name_or_fn)

    def guarded(rng, shape, dtype=jnp.float32):
        if any(int(s) == 0 for s in shape):
            return jnp.zeros(shape, dtype)
        return base(rng, shape, dtype)

    return guarded


def _resolve_initializer(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    name = str(name_or_fn)
    if name in _INITIALIZERS:
        return _INITIALIZERS[name]()
    if name == "zeros":
        return jax.nn.initializers.zeros
    if name == "ones":
        return jax.nn.initializers.ones
    if name.startswith("constant:"):
        return jax.nn.initializers.constant(float(name.split(":", 1)[1]))
    raise ValueError(f"Unknown initializer: {name_or_fn!r}")


_ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": jax.nn.softmax,
    "linear": lambda x: x,
}


def get_activation(name_or_fn):
    """Resolve an activation by Keras-style name, None -> identity."""
    if name_or_fn is None:
        return lambda x: x
    if callable(name_or_fn):
        return name_or_fn
    name = str(name_or_fn)
    if name in _ACTIVATIONS:
        return _ACTIVATIONS[name]
    raise ValueError(f"Unknown activation: {name_or_fn!r}")


def dropout(
    rng: jax.Array | None,
    x: jax.Array,
    rate: float,
    training: bool,
) -> jax.Array:
    """PRNG-keyed functional dropout (inverted scaling).

    Replaces the reference's per-call ``layers.Dropout`` construction
    (gcn_conv.py:239-241) with the jit-stable functional form. ``training``
    and ``rate`` are static; when either disables dropout this is identity.
    """
    if not training or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng key when training with rate > 0")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


@dataclasses.dataclass(frozen=True)
class Module:
    """Base class: hyperparameter dataclass + init/apply."""

    def init(self, rng: jax.Array, input_dim: int) -> dict:
        raise NotImplementedError

    def apply(self, params: dict, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params: dict, *args, **kwargs):
        return self.apply(params, *args, **kwargs)

    # -- config round-trip (parity with Keras get_config/from_config) -------
    def get_config(self) -> dict[str, Any]:
        cfg = {"class_name": type(self).__name__}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Module):
                v = v.get_config()
            elif isinstance(v, tuple):
                v = list(v)
            cfg[f.name] = v
        return cfg

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "Module":
        cfg = dict(config)
        cfg.pop("class_name", None)
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in cfg.items():
            if k not in fields:
                continue
            if isinstance(v, list) and fields[k].type in ("tuple[int, ...]",):
                v = tuple(v)
            kwargs[k] = v
        return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class Dense(Module):
    """Affine transform ``x @ kernel (+ bias)`` with optional activation."""

    units: int
    activation: str | None = None
    use_bias: bool = True
    kernel_initializer: str = "glorot_uniform"
    bias_initializer: str = "zeros"

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        k_init = get_initializer(self.kernel_initializer)
        params = {"kernel": k_init(rng, (input_dim, self.units), dtype)}
        if self.use_bias:
            b_init = get_initializer(self.bias_initializer)
            params["bias"] = b_init(rng, (self.units,), dtype)
        return params

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        out = x @ params["kernel"]
        if self.use_bias:
            out = out + params["bias"]
        return get_activation(self.activation)(out)


@dataclasses.dataclass(frozen=True)
class MLP(Module):
    """Dense stack: hidden layers with activation (+dropout), linear output.

    Mirrors the reference GIN MLP structure exactly (gin_conv.py:129-162):
    ``[Dense(h, act) + Dropout]* + Dense(out, linear)``.
    """

    hidden_dims: tuple[int, ...]
    output_dim: int
    activation: str | None = "relu"
    use_bias: bool = True
    dropout_rate: float = 0.0
    kernel_initializer: str = "glorot_uniform"
    bias_initializer: str = "zeros"

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))

    def _layers(self) -> list[Dense]:
        layers = [
            Dense(
                h,
                activation=self.activation,
                use_bias=self.use_bias,
                kernel_initializer=self.kernel_initializer,
                bias_initializer=self.bias_initializer,
            )
            for h in self.hidden_dims
        ]
        layers.append(
            Dense(
                self.output_dim,
                activation=None,
                use_bias=self.use_bias,
                kernel_initializer=self.kernel_initializer,
                bias_initializer=self.bias_initializer,
            )
        )
        return layers

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        layers = self._layers()
        keys = jax.random.split(rng, len(layers))
        params, dim = {}, input_dim
        for i, (layer, key) in enumerate(zip(layers, keys)):
            params[f"dense_{i}"] = layer.init(key, dim, dtype)
            dim = layer.units
        return params

    def apply(
        self,
        params: dict,
        x: jax.Array,
        *,
        training: bool = False,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        layers = self._layers()
        n_hidden = len(layers) - 1
        drop_keys = (
            jax.random.split(rng, n_hidden)
            if (training and self.dropout_rate > 0 and n_hidden > 0 and rng is not None)
            else [None] * n_hidden
        )
        for i, layer in enumerate(layers):
            x = layer.apply(params[f"dense_{i}"], x)
            if i < n_hidden:  # dropout after hidden layers only (gin_conv.py:141)
                x = dropout(drop_keys[i], x, self.dropout_rate, training)
        return x
