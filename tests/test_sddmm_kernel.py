"""Pallas SDDMM tests: fused GATv2 scores, forward and backward, vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.kernels import spmm_pallas as K
from keras_geometric_tpu.kernels import sddmm_pallas as S
from keras_geometric_tpu.ops.csr import prepare_graph

HEADS, FDIM = 3, 8


def _case(n=90, e=512, seed=0):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, n, e).astype(np.int32))
    t = K.build_row_tables(recv, n, edge_chunk=128, row_block=32)
    ht = jnp.asarray(
        rng.standard_normal((n, HEADS * FDIM)).astype(np.float32)
    )
    hj = jnp.asarray(
        rng.standard_normal((e, HEADS * FDIM)).astype(np.float32)
    )
    att = jnp.asarray(
        rng.standard_normal((HEADS, FDIM)).astype(np.float32)
    )
    return recv, t, ht, hj, att


def _ref_scores(ht, hj, att, recv, slope=0.2):
    e = hj.shape[0]
    hi = jnp.take(ht, jnp.asarray(recv), axis=0)
    pre = (hi + hj).reshape(e, HEADS, FDIM)
    z = jax.nn.leaky_relu(pre, negative_slope=slope)
    return jnp.sum(z * att[None], axis=-1)


def test_forward_matches_xla():
    recv, t, ht, hj, att = _case()
    with pltpu.force_tpu_interpret_mode():
        got = S.sddmm_scores_sorted(ht, hj, att, tables=t)
    want = _ref_scores(ht, hj, att, recv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_backward_matches_autodiff():
    recv, t, ht, hj, att = _case(seed=1)
    g = jnp.asarray(
        np.random.default_rng(2).standard_normal((hj.shape[0], HEADS))
        .astype(np.float32)
    )

    def ref_loss(ht, hj, att):
        return jnp.sum(_ref_scores(ht, hj, att, recv) * g)

    d_ht, d_hj, d_att = jax.grad(ref_loss, argnums=(0, 1, 2))(ht, hj, att)
    with pltpu.force_tpu_interpret_mode():
        d_pre, datt = S.sddmm_bwd_sorted(ht, hj, att, g, tables=t)
        dht = K.scatter_sum_sorted(
            d_pre, jnp.asarray(recv), ht.shape[0], tables=t
        )
    np.testing.assert_allclose(d_pre, d_hj, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dht, d_ht, rtol=1e-4, atol=1e-4)
    # datt accumulates split2 partials over every chunk — rounding only.
    np.testing.assert_allclose(datt, d_att, rtol=1e-3, atol=1e-3)


def test_context_custom_vjp_end_to_end():
    """GraphContext.sddmm_scores fwd + both cotangents vs autodiff of the
    XLA restatement, through the public API (duplicate edges, isolated
    nodes, padded edge slots)."""
    rng = np.random.default_rng(3)
    n, e = 70, 300
    ei = np.stack([rng.integers(0, n - 5, e), rng.integers(0, n - 5, e)])
    ei[:, 1] = ei[:, 0]  # duplicate edge
    ctx = prepare_graph(ei.astype(np.int32), n, add_self_loops=True)
    ht = jnp.asarray(
        rng.standard_normal((n, HEADS * FDIM)).astype(np.float32)
    )
    att = jnp.asarray(
        rng.standard_normal((HEADS, FDIM)).astype(np.float32)
    )
    mask = np.asarray(ctx.edge_mask)

    def fused_loss(ht, att):
        hj = ctx.gather(ht)
        s = ctx.sddmm_scores(ht, hj, att)
        s = jnp.where(ctx.edge_mask[:, None], s, 0.0)
        return jnp.sum(jnp.tanh(s))

    def plain_loss(ht, att):
        hj = jnp.take(ht, ctx.senders, axis=0)
        hi = jnp.take(ht, ctx.receivers, axis=0)
        pre = (hi + hj).reshape(-1, HEADS, FDIM)
        z = jax.nn.leaky_relu(pre, negative_slope=0.2)
        s = jnp.sum(z * att[None], axis=-1)
        s = jnp.where(jnp.asarray(mask)[:, None], s, 0.0)
        return jnp.sum(jnp.tanh(s))

    with pltpu.force_tpu_interpret_mode():
        out_f = fused_loss(ht, att)
        g_ht_f, g_att_f = jax.grad(fused_loss, argnums=(0, 1))(ht, att)
    out_p = plain_loss(ht, att)
    g_ht_p, g_att_p = jax.grad(plain_loss, argnums=(0, 1))(ht, att)
    np.testing.assert_allclose(out_f, out_p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g_ht_f, g_ht_p, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g_att_f, g_att_p, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dtypes(dtype):
    recv, t, ht, hj, att = _case(seed=4)
    ht, hj, att = ht.astype(dtype), hj.astype(dtype), att.astype(dtype)
    with pltpu.force_tpu_interpret_mode():
        got = S.sddmm_scores_sorted(ht, hj, att, tables=t)
    assert got.dtype == jnp.float32
    want = _ref_scores(
        ht.astype(jnp.float32), hj.astype(jnp.float32),
        att.astype(jnp.float32), recv,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


class TestStatsAggFused:
    """r4 one-pass forward: sddmm_stats_agg_sorted must match the
    composed reference (scores -> masked softmax -> weighted aggregate)
    including online-rescaling numerics, dropout, and padded slots."""

    def _ref_out(self, ht, hj, att, recv, n, valid=None, drop=None,
                 eps=1e-10):
        from keras_geometric_tpu.ops import segment

        scores = _ref_scores(ht, hj, att, recv)
        mask = None if valid is None else jnp.asarray(valid, bool)
        alpha = segment.segment_softmax(
            scores, jnp.asarray(recv), n, mask=mask, eps=eps,
            indices_are_sorted=True,
        )
        if drop is not None:
            alpha = alpha * drop
        d = hj.shape[1]
        msgs = (
            alpha[:, :, None] * hj.reshape(-1, HEADS, FDIM)
        ).reshape(-1, d)
        return segment.segment_sum(
            msgs, jnp.asarray(recv), n, mask=mask,
            indices_are_sorted=True,
        )

    def test_matches_composed(self):
        recv, t, ht, hj, att = _case()
        n = ht.shape[0]
        with pltpu.force_tpu_interpret_mode():
            out, scores, m, l = S.sddmm_stats_agg_sorted(
                ht, hj, att, tables=t, num_nodes=n
            )
        want = self._ref_out(ht, hj, att, recv, n)
        np.testing.assert_allclose(
            out[:n], want, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            scores, _ref_scores(ht, hj, att, recv), rtol=1e-4, atol=1e-4
        )

    def test_padded_slots_and_dropout(self):
        rng = np.random.default_rng(5)
        n, e_real, e = 64, 300, 384
        recv = np.sort(rng.integers(0, n, e_real)).astype(np.int32)
        recv_p = np.concatenate(
            [recv, np.full(e - e_real, n - 1, np.int32)]
        )
        t = K.build_row_tables(recv_p, n, edge_chunk=128, row_block=32)
        d = HEADS * FDIM
        ht = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        hj = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
        att = jnp.asarray(
            rng.standard_normal((HEADS, FDIM)).astype(np.float32)
        )
        valid = (np.arange(e) < e_real).astype(np.float32)
        drop = jnp.asarray(
            (rng.random((e, HEADS)) > 0.3).astype(np.float32) / 0.7
        )
        with pltpu.force_tpu_interpret_mode():
            out, scores, m, l = S.sddmm_stats_agg_sorted(
                ht, hj, att, tables=t, num_nodes=n, edge_valid=valid,
                drop_mask=drop,
            )
        want = self._ref_out(
            ht, hj, att, recv_p, n, valid=valid, drop=drop
        )
        np.testing.assert_allclose(out[:n], want, rtol=2e-4, atol=2e-4)
        # Padded slots must flush as -inf scores.
        assert np.all(np.asarray(scores)[e_real:] == -np.inf)
