"""Tests for graph-structure ops: self-loops, GCN norm, CSR, padding."""

import jax.numpy as jnp
import numpy as np

from keras_geometric_tpu.ops import graph_ops


class TestEnsureEdgeIndex:
    def test_transpose_e2(self):
        ei = np.array([[0, 1], [1, 2], [2, 0]], np.int64)  # [E, 2]
        out = graph_ops.ensure_edge_index(ei)
        assert out.shape == (2, 3)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(out, ei.T)

    def test_passthrough_2e(self):
        ei = np.array([[0, 1, 2], [1, 2, 0]], np.int32)
        np.testing.assert_array_equal(graph_ops.ensure_edge_index(ei), ei)


class TestSelfLoops:
    def test_appended_after_user_edges(self):
        ei = np.array([[0, 1], [1, 2]], np.int32)  # 0->1, 1->2
        out, mask = graph_ops.add_self_loops(ei, 3)
        assert mask is None
        expected = np.array([[0, 1, 0, 1, 2], [1, 2, 0, 1, 2]], np.int32)
        np.testing.assert_array_equal(out, expected)

    def test_masked_nodes_get_masked_loops(self):
        ei = np.array([[0], [1]], np.int32)
        node_mask = jnp.array([True, True, False])  # node 2 is padding
        out, mask = graph_ops.add_self_loops(ei, 3, node_mask=node_mask)
        np.testing.assert_array_equal(
            np.asarray(mask), [True, True, True, False]
        )


class TestGCNNorm:
    def test_matches_formula(self):
        # Triangle 0->1->2->0 plus self-loops.
        ei, _ = graph_ops.add_self_loops(
            np.array([[0, 1, 2], [1, 2, 0]], np.int32), 3
        )
        w = graph_ops.gcn_norm(ei, 3)
        # Every node has in-degree 2 (one in-edge + self-loop).
        np.testing.assert_allclose(w, 0.5 * np.ones(6), rtol=1e-5)

    def test_in_degree_from_receivers(self):
        # 2 edges into node 0, none into node 1.
        ei = np.array([[1, 1], [0, 0]], np.int32)
        w = graph_ops.gcn_norm(ei, 2)
        # d[0]=2, d[1]=0 -> w = (2)^-.5 * (0+1e-12)^-.5 ~ huge but finite;
        # reference zeroes only exact infs. Check finite and formulaic.
        expected = (2 + 1e-12) ** -0.5 * (0 + 1e-12) ** -0.5
        np.testing.assert_allclose(w, [expected] * 2, rtol=1e-5)

    def test_mask_excluded_from_degree(self):
        ei = np.array([[1, 1, 1], [0, 0, 0]], np.int32)
        mask = jnp.array([True, True, False])
        w_masked = graph_ops.gcn_norm(ei, 2, edge_mask=mask)
        w_ref = graph_ops.gcn_norm(ei[:, :2], 2)
        np.testing.assert_allclose(w_masked[:2], w_ref, rtol=1e-6)


class TestCSR:
    def test_roundtrip(self):
        s = np.array([3, 0, 1, 2, 0], np.int32)
        r = np.array([1, 0, 3, 1, 2], np.int32)
        csr = graph_ops.coo_to_csr(s, r, 4)
        assert np.all(np.diff(csr.receivers) >= 0)
        np.testing.assert_array_equal(csr.row_ptr, [0, 1, 3, 4, 5])
        # perm maps back to original edges
        np.testing.assert_array_equal(csr.senders, s[csr.perm])
        np.testing.assert_array_equal(csr.receivers, r[csr.perm])

    def test_padding(self):
        s = np.array([0, 1], np.int32)
        r = np.array([1, 0], np.int32)
        csr = graph_ops.coo_to_csr(s, r, 2, pad_to=8)
        assert csr.senders.shape == (8,)
        assert csr.num_edges == 2
        np.testing.assert_array_equal(csr.edge_mask[:2], [True, True])
        assert not csr.edge_mask[2:].any()

    def test_pad_edges_nodes(self):
        ei = np.array([[0, 1], [1, 0]], np.int32)
        padded, mask = graph_ops.pad_edges(ei, 5, 3)
        assert padded.shape == (2, 5)
        np.testing.assert_array_equal(mask, [True, True, False, False, False])
        x = np.ones((3, 4), np.float32)
        xp, nmask = graph_ops.pad_nodes(x, 8)
        assert xp.shape == (8, 4)
        assert nmask.sum() == 3
        np.testing.assert_allclose(xp[3:], 0)
