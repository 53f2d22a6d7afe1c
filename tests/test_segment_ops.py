"""Golden-value tests for segment ops, mirroring the reference's
numerical-golden strategy (tests/test_message_passing.py:54-179)."""

import jax.numpy as jnp
import numpy as np
import pytest

from keras_geometric_tpu.ops import segment


# Graph: edges (sender->receiver): 1->0, 2->0, 0->1, 2->3. Node 2 isolated
# as a receiver.
MESSAGES = np.array(
    [[3.0, 4.0], [5.0, 6.0], [1.0, 2.0], [5.0, 6.0]], dtype=np.float32
)
RECEIVERS = np.array([0, 0, 1, 3], dtype=np.int32)
N = 4


class TestGoldenValues:
    def test_sum(self):
        out = segment.segment_sum(MESSAGES, RECEIVERS, N)
        expected = np.array(
            [[8.0, 10.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]], np.float32
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_mean(self):
        out = segment.segment_mean(MESSAGES, RECEIVERS, N)
        expected = np.array(
            [[4.0, 5.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]], np.float32
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_max_isolated_zero(self):
        out = segment.segment_max(MESSAGES, RECEIVERS, N)
        expected = np.array(
            [[5.0, 6.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]], np.float32
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_min_isolated_zero(self):
        out = segment.segment_min(MESSAGES, RECEIVERS, N)
        expected = np.array(
            [[3.0, 4.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]], np.float32
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_std(self):
        out = segment.segment_std(MESSAGES, RECEIVERS, N)
        # Node 0: population std of {3,5} = 1, {4,6} = 1; single-message and
        # empty nodes are 0 (aggregators.py:226).
        expected = np.array(
            [[1.0, 1.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]], np.float32
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_softmax_per_segment(self):
        scores = np.array([1.0, 2.0, 5.0, 3.0], np.float32)
        out = segment.segment_softmax(scores, RECEIVERS, N)
        e = np.exp([1.0 - 2.0, 0.0])
        expected_0 = e / (e.sum() + 1e-10)
        np.testing.assert_allclose(out[:2], expected_0, rtol=1e-5)
        np.testing.assert_allclose(out[2], 1.0, rtol=1e-4)  # single edge
        np.testing.assert_allclose(out[3], 1.0, rtol=1e-4)


class TestMaskNeutrality:
    """Padded (masked) entries must be exactly neutral in every reduction."""

    @pytest.mark.parametrize(
        "fn",
        [
            segment.segment_sum,
            segment.segment_mean,
            segment.segment_max,
            segment.segment_min,
            segment.segment_std,
        ],
    )
    def test_padding_neutral(self, fn):
        pad = 5
        msgs_p = np.concatenate(
            [MESSAGES, 7.7 * np.ones((pad, 2), np.float32)], axis=0
        )
        recv_p = np.concatenate(
            [RECEIVERS, np.array([2] * pad, np.int32)]  # pad hits isolated node
        )
        mask = np.arange(len(recv_p)) < len(RECEIVERS)
        unpadded = fn(MESSAGES, RECEIVERS, N)
        padded = fn(msgs_p, recv_p, N, mask=jnp.asarray(mask))
        np.testing.assert_allclose(padded, unpadded, rtol=1e-5, atol=1e-6)

    def test_softmax_padding_neutral(self):
        scores = np.array([1.0, 2.0, 5.0, 3.0], np.float32)
        scores_p = np.concatenate([scores, [100.0, 100.0]]).astype(np.float32)
        recv_p = np.concatenate([RECEIVERS, [0, 2]]).astype(np.int32)
        mask = np.array([True] * 4 + [False] * 2)
        out = segment.segment_softmax(scores_p, recv_p, N, mask=jnp.asarray(mask))
        ref = segment.segment_softmax(scores, RECEIVERS, N)
        np.testing.assert_allclose(out[:4], ref, rtol=1e-5)
        np.testing.assert_allclose(out[4:], 0.0)


class TestEdgeCases:
    def test_sorted_indices_flag_matches(self):
        out_unsorted = segment.segment_sum(MESSAGES, RECEIVERS, N)
        out_sorted = segment.segment_sum(
            MESSAGES, RECEIVERS, N, indices_are_sorted=True
        )
        np.testing.assert_allclose(out_unsorted, out_sorted)

    def test_multi_head_rank3(self):
        msgs = np.stack([MESSAGES, 2 * MESSAGES], axis=1)  # [E, 2, F]
        out = segment.segment_sum(msgs, RECEIVERS, N)
        assert out.shape == (N, 2, 2)
        np.testing.assert_allclose(out[:, 0], segment.segment_sum(MESSAGES, RECEIVERS, N))

    def test_duplicate_edges_accumulate(self):
        msgs = np.ones((3, 1), np.float32)
        recv = np.zeros(3, np.int32)
        out = segment.segment_sum(msgs, recv, 2)
        np.testing.assert_allclose(out, [[3.0], [0.0]])

    def test_extreme_values_finite(self):
        # 1e18 squares to 1e36, still within float32 range (std computes
        # squared deviations; 1e30 would overflow in any float32 impl).
        msgs = np.array([[1e18], [-1e18], [1e-30]], np.float32)
        recv = np.array([0, 0, 1], np.int32)
        for fn in (segment.segment_mean, segment.segment_std):
            out = fn(msgs, recv, 2)
            assert np.all(np.isfinite(np.asarray(out)))
