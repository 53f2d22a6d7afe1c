"""Banded-dense SpMM tier: reordering + band split correctness.

Covers kernels/band_pallas.py and the ops/reorder.py orderings. The CSR
context without a band is the in-repo reference (itself pinned against
the executing reference in test_reference_parity.py), so every check is
an exact-semantics comparison: band + residual must reproduce the plain
context bit-for-bit up to f32 summation order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.data.datasets.synthetic import (
    community_graph,
    rmat_edges,
)
from keras_geometric_tpu.kernels import band_pallas
from keras_geometric_tpu.ops import reorder
from keras_geometric_tpu.ops.csr import prepare_graph


def _community_edges(n=700, e=4000, seed=0, directed=False):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, e // 2)
    s = np.clip(r + rng.integers(-100, 100, e // 2), 0, n - 1)
    far = rng.random(e // 2) < 0.2
    s[far] = rng.integers(0, n, far.sum())
    if directed:
        return np.stack([s, r])
    return np.stack(
        [np.concatenate([s, r]), np.concatenate([r, s])]
    )


class TestBandPlan:
    def test_split_is_exact_partition(self):
        ei = _community_edges()
        w = np.random.default_rng(1).random(ei.shape[1]).astype(np.float32)
        plan, local = band_pallas.build_band_plan(
            ei[0], ei[1], w, 768, window=512
        )
        assert plan.num_edges == int(local.sum())
        assert 0 < plan.num_edges < ei.shape[1]
        # Band total mass equals the local-edge weight mass.
        assert np.isclose(
            float(np.asarray(plan.band).sum()), float(w[local].sum()),
            rtol=1e-5,
        )

    def test_fit_criterion_is_endpoint_symmetric(self):
        ei = _community_edges(directed=True)
        _, local_fwd = band_pallas.build_band_plan(
            ei[0], ei[1], None, 768, window=512
        )
        _, local_bwd = band_pallas.build_band_plan(
            ei[1], ei[0], None, 768, window=512
        )
        np.testing.assert_array_equal(local_fwd, local_bwd)

    def test_rejects_unpadded_nodes(self):
        with pytest.raises(ValueError, match="multiple"):
            band_pallas.build_band_plan(
                np.array([0]), np.array([1]), None, 700, window=512
            )


class TestBandSpmm:
    @pytest.mark.parametrize("directed", [False, True])
    def test_matches_plain_context(self, directed):
        ei = _community_edges(directed=directed)
        kw = dict(
            add_self_loops=True, gcn_normalize=True, pad_nodes=True
        )
        if not directed:
            kw.update(symmetric=True, densify_self_loops=True)
        with pltpu.force_tpu_interpret_mode():
            ref = prepare_graph(ei, 700, **kw)
            ctx = prepare_graph(ei, 700, band_window=512, **kw)
            assert ctx.num_band_edges > 0
            assert ctx.num_edges == ref.num_edges
            rng = np.random.default_rng(2)
            x = rng.standard_normal((ctx.num_nodes, 16)).astype(np.float32)

            def loss(c):
                return lambda h: jnp.sum(jnp.sin(c.spmm(h)))

            y_ref = ref.spmm(jnp.asarray(x[: ref.num_nodes]))
            y = ctx.spmm(jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(y)[:700], np.asarray(y_ref)[:700],
                rtol=1e-4, atol=1e-4,
            )
            g_ref = jax.grad(loss(ref))(jnp.asarray(x[: ref.num_nodes]))
            g = jax.grad(loss(ctx))(jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(g)[:700], np.asarray(g_ref)[:700],
                rtol=1e-4, atol=1e-4,
            )

    def test_spmm_mean_unit_weights(self):
        ei = _community_edges()
        with pltpu.force_tpu_interpret_mode():
            ref = prepare_graph(ei, 700, pad_nodes=True)
            ctx = prepare_graph(ei, 700, pad_nodes=True, band_window=512)
            x = np.random.default_rng(3).standard_normal(
                (ctx.num_nodes, 8)
            ).astype(np.float32)
            np.testing.assert_allclose(
                np.asarray(ctx.spmm_mean(jnp.asarray(x)))[:700],
                np.asarray(
                    ref.spmm_mean(jnp.asarray(x[: ref.num_nodes]))
                )[:700],
                rtol=1e-4, atol=1e-4,
            )

    def test_all_local_graph_keeps_residual_nonempty(self):
        # A pure ring: every edge is band-local.
        n = 512
        s = np.arange(n)
        r = (s + 1) % n
        ei = np.stack(
            [np.concatenate([s, r]), np.concatenate([r, s])]
        )
        with pltpu.force_tpu_interpret_mode():
            ctx = prepare_graph(
                ei, n, pad_nodes=True, band_window=512, symmetric=True
            )
            assert ctx.num_real_edges > 0  # the re-routed edge(s)
            ref = prepare_graph(ei, n, pad_nodes=True, symmetric=True)
            x = np.random.default_rng(4).standard_normal(
                (ctx.num_nodes, 8)
            ).astype(np.float32)
            np.testing.assert_allclose(
                np.asarray(ctx.spmm(jnp.asarray(x)))[:n],
                np.asarray(ref.spmm(jnp.asarray(x[: ref.num_nodes])))[:n],
                rtol=1e-4, atol=1e-4,
            )

    def test_per_edge_ops_route_or_reject(self):
        # r4: by default band contexts carry a full-stream companion and
        # per-edge ops ROUTE to it (TestFullStreamCompanion); with
        # attend_full_stream=False they reject with instructions.
        ei = _community_edges()
        ctx = prepare_graph(
            ei, 700, pad_nodes=True, band_window=512,
            attend_full_stream=False,
        )
        h = jnp.zeros((ctx.num_nodes, 8))
        with pytest.raises(ValueError, match="attend_full_stream"):
            ctx.gather(h)
        with pytest.raises(ValueError, match="attend_full_stream"):
            ctx.edge_softmax(jnp.zeros((ctx.senders.shape[0], 4)))


class TestReorder:
    def test_cluster_order_recovers_communities(self):
        ei = community_graph(4096, 40_000, community_size=256, seed=0)
        s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
        before = reorder.band_coverage(s, r, windows=(1024,))[1024]
        order = reorder.cluster_order(s, r, 4096)
        assert sorted(order.tolist()) == list(range(4096))
        inv = reorder.invert_order(order)
        after = reorder.band_coverage(inv[s], inv[r], windows=(1024,))[1024]
        # LPA must recover most of the 80% intra mass.
        assert after > before and after > 0.5

    def test_rcm_orders_a_path_graph_contiguously(self):
        n = 256
        s = np.arange(n - 1)
        r = s + 1
        perm = np.random.default_rng(0).permutation(n)
        order = reorder.rcm_order(perm[s], perm[r], n)
        inv = reorder.invert_order(order)
        s2, r2 = inv[perm[s]], inv[perm[r]]
        assert np.abs(s2 - r2).max() == 1  # bandwidth-1 recovered

    def test_hub_rcm_places_hubs_first(self):
        ei = rmat_edges(10, 8000, seed=1)
        s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
        n = 1 << 10
        order = reorder.hub_rcm_order(s, r, n, hub_k=32)
        deg = np.bincount(s, minlength=n) + np.bincount(r, minlength=n)
        assert set(order[:32]) == set(np.argsort(-deg)[:32].tolist())

    def test_band_after_reorder_beats_scrambled(self):
        ei = community_graph(
            2048, 30_000, community_size=256, p_intra=0.9, seed=5
        )
        s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
        order = reorder.cluster_order(s, r, 2048)
        inv = reorder.invert_order(order)
        with pltpu.force_tpu_interpret_mode():
            ctx_scrambled = prepare_graph(
                np.stack([s, r]), 2048, pad_nodes=True, band_window=512
            )
            ctx_ordered = prepare_graph(
                np.stack([inv[s], inv[r]]), 2048, pad_nodes=True,
                band_window=512,
            )
        assert (
            ctx_ordered.num_band_edges > 2 * ctx_scrambled.num_band_edges
        )


class TestFullStreamCompanion:
    """r4 (VERDICT r3 item 3): one prepared band context serves BOTH the
    banded linear path and per-edge attention — per-edge ops route to
    the attached full-stream companion and match a plain context."""

    def _graph(self):
        rng = np.random.default_rng(11)
        n, e = 700, 4000
        # Locality-heavy edges so the band actually absorbs some.
        s = rng.integers(0, n, e)
        r = np.clip(s + rng.integers(-80, 81, e), 0, n - 1)
        return n, np.stack([s, r]).astype(np.int32)

    def test_gatv2_on_band_context_matches_plain(self):
        import jax

        from keras_geometric_tpu import GATv2Conv

        n, ei = self._graph()
        band_ctx = prepare_graph(
            ei, n, add_self_loops=True, pad_nodes=True, band_window=512,
            scatter_row_block=8, expand_row_block=8,
            edge_chunk=128,
        )
        assert band_ctx.num_band_edges > 0
        assert band_ctx.full is not None
        plain_ctx = prepare_graph(
            ei, n, add_self_loops=True, scatter_row_block=8,
            expand_row_block=8, edge_chunk=128,
        )
        layer = GATv2Conv.for_context(6, heads=2)
        params = layer.init(jax.random.PRNGKey(0), 5)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n, 5))
            .astype(np.float32)
        )
        x_pad = jnp.pad(x, ((0, band_ctx.num_nodes - n), (0, 0)))
        with pltpu.force_tpu_interpret_mode():
            got = layer.apply(params, x_pad, context=band_ctx)[:n]
            want = layer.apply(params, x, context=plain_ctx)[:n]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_spmm_still_band_accelerated(self):
        n, ei = self._graph()
        ctx = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            pad_nodes=True, band_window=512,
            scatter_row_block=8, expand_row_block=8, edge_chunk=128,
        )
        plain = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            scatter_row_block=8, expand_row_block=8, edge_chunk=128,
        )
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((n, 8))
            .astype(np.float32)
        )
        x_pad = jnp.pad(x, ((0, ctx.num_nodes - n), (0, 0)))
        with pltpu.force_tpu_interpret_mode():
            got = ctx.spmm(x_pad)[:n]
            want = plain.spmm(x)[:n]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_opt_out_raises_helpfully(self):
        n, ei = self._graph()
        ctx = prepare_graph(
            ei, n, add_self_loops=True, pad_nodes=True, band_window=512,
            scatter_row_block=8, expand_row_block=8,
            edge_chunk=128, attend_full_stream=False,
        )
        with pytest.raises(ValueError, match="attend_full_stream"):
            ctx.full_stream()

    def test_densified_context_defaults_to_raise(self):
        n, ei = self._graph()
        ctx = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            densify_self_loops=True, scatter_row_block=8,
            expand_row_block=8, edge_chunk=128,
        )
        with pytest.raises(ValueError, match="densify_self_loops"):
            ctx.full_stream()
        # Opt in: the companion carries the loops in-stream.
        ctx2 = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            densify_self_loops=True, scatter_row_block=8,
            expand_row_block=8, edge_chunk=128,
            attend_full_stream=True,
        )
        assert ctx2.full_stream() is ctx2.full
