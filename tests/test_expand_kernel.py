"""Expand (sorted gather) kernel tests: fwd/bwd vs XLA take, weighted
variants, scatter<->expand transpose consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.kernels import spmm_pallas as K


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(5)
    n, e, f = 250, 1700, 32
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    rows = rng.standard_normal((n, f)).astype(np.float32)
    w = rng.standard_normal(e).astype(np.float32)
    return n, e, f, recv, jnp.asarray(rows), jnp.asarray(w)


def test_expand_matches_take(case):
    n, e, f, recv, rows, w = case
    with pltpu.force_tpu_interpret_mode():
        out = K.expand_sorted(rows, jnp.asarray(recv))
    ref = jnp.take(rows, jnp.asarray(recv), axis=0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_expand_weighted(case):
    n, e, f, recv, rows, w = case
    t = K.build_row_tables(recv, n)
    with pltpu.force_tpu_interpret_mode():
        out = K.expand_sorted(rows, jnp.asarray(recv), tables=t, weights=w)
    ref = jnp.take(rows, jnp.asarray(recv), axis=0) * w[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_expand_backward_is_scatter(case):
    n, e, f, recv, rows, w = case
    t = K.build_row_tables(recv, n)

    def loss(r):
        return jnp.sum(
            K.expand_sorted(r, jnp.asarray(recv), tables=t) ** 2
        )

    def loss_ref(r):
        return jnp.sum(jnp.take(r, jnp.asarray(recv), axis=0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(rows)
    gref = jax.grad(loss_ref)(rows)
    np.testing.assert_allclose(g, gref, rtol=1e-4, atol=1e-4)


def test_weighted_scatter_matches(case):
    n, e, f, recv, rows, w = case
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32))
    t = K.build_row_tables(recv, n)
    with pltpu.force_tpu_interpret_mode():
        out = K.scatter_sum_sorted(
            msgs, jnp.asarray(recv), n, tables=t, weights=w
        )
    ref = jax.ops.segment_sum(msgs * w[:, None], jnp.asarray(recv), n)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_weighted_scatter_gradient(case):
    n, e, f, recv, rows, w = case
    rng = np.random.default_rng(1)
    msgs = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32))
    t = K.build_row_tables(recv, n)

    def loss(m):
        return jnp.sum(
            K.scatter_sum_sorted(m, jnp.asarray(recv), n, tables=t,
                                 weights=w) ** 2
        )

    def loss_ref(m):
        return jnp.sum(
            jax.ops.segment_sum(m * w[:, None], jnp.asarray(recv), n) ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(msgs)
    gref = jax.grad(loss_ref)(msgs)
    np.testing.assert_allclose(g, gref, rtol=1e-4, atol=1e-3)


def test_scatter_bwd_no_longer_uses_take(case):
    """Second-order consistency: grad of grad flows through both kernels."""
    n, e, f, recv, rows, w = case
    rng = np.random.default_rng(2)
    msgs = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32))
    t = K.build_row_tables(recv, n)

    def loss(m):
        return jnp.sum(
            jnp.tanh(K.scatter_sum_sorted(m, jnp.asarray(recv), n, tables=t))
        )

    def loss_ref(m):
        return jnp.sum(jnp.tanh(jax.ops.segment_sum(m, jnp.asarray(recv), n)))

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(msgs)
    np.testing.assert_allclose(g, jax.grad(loss_ref)(msgs), rtol=1e-4,
                               atol=1e-4)
