"""Banded-attention backward (r5): windowed one-hot scatter + residual
permute must reproduce the single-permute attend backward exactly.

The plain (no ``attend_window=``) context is the in-repo reference for
the fused GATv2 attend, itself pinned against the executing reference in
test_reference_parity.py — so every check here is an exact-semantics
comparison up to f32 summation order. Covers
kernels/band_pallas.window_scatter_sum and the ops/csr.prepare_graph
``attend_window=`` tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.kernels import band_pallas
from keras_geometric_tpu.ops.csr import prepare_graph


def _community_edges(n=520, e=1500, seed=0, far_frac=0.25):
    """Receiver-local senders with a far (inter-community) minority."""
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, e)
    s = np.clip(r + rng.integers(-120, 120, e), 0, n - 1)
    far = rng.random(e) < far_frac
    s[far] = rng.integers(0, n, int(far.sum()))
    return np.stack([s, r])


class TestWindowScatterPlan:
    def test_partition_and_sender_tab(self):
        ei = _community_edges()
        ctx = prepare_graph(
            ei, 520, add_self_loops=True, pad_nodes=True, attend_window=256
        )
        plan = ctx.attw_plan
        assert plan is not None
        tab = np.asarray(ctx.attw_sender)
        senders = np.asarray(ctx.senders)
        band = tab >= 0
        # Band slots carry their true sender id; every band sender lies
        # in its chunk's chosen window.
        assert np.array_equal(tab[band], senders[band])
        ec, w = plan.edge_chunk, plan.window
        chunk = np.arange(tab.shape[0]) // ec
        wins = tab[band] // w
        per_chunk = {}
        for c, win in zip(chunk[band], wins):
            per_chunk.setdefault(c, set()).add(win)
        assert all(len(v) == 1 for v in per_chunk.values())
        # Residual + band partition the real edges exactly.
        n_real = ctx.num_real_edges
        res_valid = np.asarray(ctx.attw_res_weight) > 0
        assert plan.num_band_edges + int(res_valid.sum()) == n_real
        # Residual permute points at exactly the non-band real slots.
        res_pos = np.sort(np.asarray(ctx.attw_perm_res)[res_valid])
        want = np.sort(np.nonzero(~band[:n_real])[0])
        assert np.array_equal(res_pos, want)

    def test_every_window_initialized(self):
        # Windows with no band edges must still get one work item (the
        # kernel zero-initializes their output block).
        ei = _community_edges(n=520, e=300)
        ctx = prepare_graph(
            ei, 520, add_self_loops=True, pad_nodes=True, attend_window=256
        )
        plan = ctx.attw_plan
        visited = set(plan.work_win.tolist())
        assert visited == set(range(plan.num_windows))
        # first/last flags: each window forms one contiguous run.
        first = plan.work_flags & 1
        wins = plan.work_win
        assert first[0] == 1
        np.testing.assert_array_equal(
            first[1:], (wins[1:] != wins[:-1]).astype(np.int32)
        )

    def test_requires_pad_nodes(self):
        ei = _community_edges()
        with pytest.raises(ValueError, match="pad_nodes"):
            prepare_graph(ei, 520, attend_window=256)


class TestWindowScatterKernel:
    def test_matches_segment_sum(self):
        ei = _community_edges()
        ctx = prepare_graph(
            ei, 520, add_self_loops=True, pad_nodes=True, attend_window=256
        )
        rng = np.random.default_rng(3)
        e_pad = ctx.senders.shape[0]
        v = jnp.asarray(rng.standard_normal((e_pad, 128)).astype(np.float32))
        tab = np.asarray(ctx.attw_sender)
        with pltpu.force_tpu_interpret_mode():
            got = band_pallas.window_scatter_sum(
                v, ctx.attw_sender, ctx.attw_plan
            )
        band = tab >= 0
        want = np.zeros((ctx.num_nodes, 128), np.float32)
        np.add.at(want, tab[band], np.asarray(v)[band])
        np.testing.assert_allclose(
            np.asarray(got)[: ctx.num_nodes], want, rtol=1e-5, atol=1e-5
        )


class TestBandedAttendParity:
    @pytest.mark.parametrize("far_frac", [0.25, 0.0, 1.0])
    def test_grad_parity_vs_plain(self, far_frac):
        ei = _community_edges(far_frac=far_frac)
        n = 520
        heads, f = 2, 64
        ctx_p = prepare_graph(ei, n, add_self_loops=True, pad_nodes=True)
        ctx_w = prepare_graph(
            ei, n, add_self_loops=True, pad_nodes=True, attend_window=256
        )
        assert ctx_w.attw_plan is not None
        rng = np.random.default_rng(5)
        n_pad = max(ctx_p.num_nodes, ctx_w.num_nodes)
        ht_full = rng.standard_normal((n_pad, heads * f)).astype(np.float32)
        att = jnp.asarray(rng.standard_normal((heads, f)).astype(np.float32))
        gw = jnp.asarray(
            rng.standard_normal((n, heads * f)).astype(np.float32)
        )

        def loss(ctx, ht, a):
            out = ctx.attend(ht, a)
            return jnp.sum(out[:n] * gw)

        with pltpu.force_tpu_interpret_mode():
            lp, (dhtp, dattp) = jax.value_and_grad(
                lambda h, a: loss(ctx_p, h, a), argnums=(0, 1)
            )(jnp.asarray(ht_full[: ctx_p.num_nodes]), att)
            lw, (dhtw, dattw) = jax.value_and_grad(
                lambda h, a: loss(ctx_w, h, a), argnums=(0, 1)
            )(jnp.asarray(ht_full[: ctx_w.num_nodes]), att)
        np.testing.assert_allclose(float(lp), float(lw), rtol=1e-5)
        np.testing.assert_allclose(dattp, dattw, rtol=1e-4, atol=1e-4)
        m = min(dhtp.shape[0], dhtw.shape[0])
        np.testing.assert_allclose(
            dhtp[:m], dhtw[:m], rtol=1e-4, atol=1e-4
        )

    def test_banded_context_routes_through_companion(self):
        # band_window= (dense SpMM tier) + attend_window= must coexist:
        # per-edge ops run on the full-stream companion, which carries
        # the attend tables.
        ei = _community_edges()
        ctx = prepare_graph(
            ei, 520, add_self_loops=True, pad_nodes=True,
            band_window=512, attend_window=256,
        )
        assert ctx.attw_plan is None  # residual stream: no attend here
        assert ctx.full_stream().attw_plan is not None
