"""Segment (scatter-reduce) operations with reference-exact numerics.

These are the L1 primitives of the framework: every message-passing layer
reduces per-edge messages ``[E, F]`` into per-node outputs ``[N, F]`` through
one of these. Semantics mirror the reference aggregators
(/root/reference/src/keras_geometric/layers/aggregators.py:48-238):

- ``segment_mean``: degree clamped at 1e-8 (aggregators.py:77-81)
- ``segment_max``/``segment_min``: +-inf for empty segments replaced by 0
  (aggregators.py:108-112, 161-167)
- ``segment_std``: population variance (N divisor), count clamped at 1e-8,
  std forced to 0 when count <= 1 (aggregators.py:193-228)

TPU-first design notes: all functions take a **static** ``num_segments`` and
an optional boolean ``mask`` over the leading (edge) axis, so padded-bucket
graphs trace to fully static shapes. Padded entries are exactly neutral in
every reduction. ``indices_are_sorted`` should be passed when edges were
preprocessed into receiver-sorted (CSR) order — XLA lowers the scatter to a
much cheaper segmented reduction on TPU in that case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_std",
    "segment_count",
    "segment_softmax",
]


def _mask_like(data: jax.Array, mask: jax.Array | None) -> jax.Array | None:
    """Broadcast a [E] bool mask against [E, ...] data."""
    if mask is None:
        return None
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    dtype=jnp.float32,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Number of (unmasked) entries per segment. Returns [num_segments]."""
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, jnp.zeros_like(ones))
    return jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum of ``data`` within each segment; masked entries contribute zero."""
    m = _mask_like(data, mask)
    if m is not None:
        data = jnp.where(m, data, jnp.zeros_like(data))
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean with the reference's 1e-8 degree clamp (empty segments -> 0)."""
    total = segment_sum(
        data,
        segment_ids,
        num_segments,
        mask=mask,
        indices_are_sorted=indices_are_sorted,
    )
    count = segment_count(
        segment_ids,
        num_segments,
        mask=mask,
        dtype=total.dtype,
        indices_are_sorted=indices_are_sorted,
    )
    count = jnp.maximum(count, jnp.asarray(1e-8, dtype=total.dtype))
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Max per segment; empty segments produce 0 (reference -inf fixup)."""
    m = _mask_like(data, mask)
    if m is not None:
        neg = jnp.asarray(-jnp.inf, dtype=data.dtype)
        data = jnp.where(m, data, jnp.full_like(data, neg))
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(jnp.isinf(out), jnp.zeros_like(out), out)


def segment_min(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Min per segment via negated max; empty segments produce 0."""
    m = _mask_like(data, mask)
    neg_data = -data
    if m is not None:
        neg = jnp.asarray(-jnp.inf, dtype=data.dtype)
        neg_data = jnp.where(m, neg_data, jnp.full_like(neg_data, neg))
    out = -jax.ops.segment_max(
        neg_data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(jnp.isinf(out), jnp.zeros_like(out), out)


def segment_std(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Population std per segment (N divisor); 0 where count <= 1."""
    count = segment_count(
        segment_ids,
        num_segments,
        mask=mask,
        dtype=data.dtype,
        indices_are_sorted=indices_are_sorted,
    )
    safe_count = jnp.maximum(count, jnp.asarray(1e-8, dtype=data.dtype))
    total = segment_sum(
        data, segment_ids, num_segments, mask=mask,
        indices_are_sorted=indices_are_sorted,
    )
    bshape = count.shape + (1,) * (data.ndim - 1)
    mean = total / safe_count.reshape(bshape)
    sq_diff = jnp.square(data - jnp.take(mean, segment_ids, axis=0))
    sum_sq = segment_sum(
        sq_diff, segment_ids, num_segments, mask=mask,
        indices_are_sorted=indices_are_sorted,
    )
    var = sum_sq / safe_count.reshape(bshape)
    std = jnp.sqrt(jnp.maximum(var, jnp.zeros_like(var)))
    return jnp.where(count.reshape(bshape) <= 1, jnp.zeros_like(std), std)


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    eps: float = 1e-10,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Softmax over entries sharing a segment id (per-target edge softmax).

    Matches the reference GATv2 softmax exactly
    (gatv2_conv.py:291-311): scores are max-shifted per segment and the
    denominator carries a ``+1e-10``. Masked entries get weight 0 and do not
    contribute to the normalizer.
    """
    m = _mask_like(scores, mask)
    shifted_in = scores
    if m is not None:
        neg = jnp.asarray(-jnp.inf, dtype=scores.dtype)
        shifted_in = jnp.where(m, scores, jnp.full_like(scores, neg))
    seg_max = jax.ops.segment_max(
        shifted_in, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    # Empty/fully-masked segments have -inf max; zero it so exp() stays finite.
    seg_max = jnp.where(jnp.isinf(seg_max), jnp.zeros_like(seg_max), seg_max)
    shifted = scores - jnp.take(seg_max, segment_ids, axis=0)
    exp = jnp.exp(shifted)
    if m is not None:
        exp = jnp.where(m, exp, jnp.zeros_like(exp))
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.take(denom, segment_ids, axis=0) + jnp.asarray(eps, dtype=exp.dtype)
    return exp / denom
