"""Counter-mode per-edge dropout masks, generatable in ANY edge order.

The fused attention backward (ops/csr._gatv2_attend_bwd, r5) recomputes
the sender cotangent in SENDER-sorted order, so it needs the attention
dropout mask in that order too. Permuting a ``[E, H]`` mask is ruled out
by the r4 gather measurements: TPU lane padding makes every ``[E, *]``
array a >=343 MB physical gather source, beyond the ~128 MB cliff where
takes pin at ~15 ms (benchmarks/RESULTS.md r4) — the permute would cost
more than the backward redesign saves.

Instead the mask is defined COUNTER-MODE as a pure function of
``(key, canonical_edge_position, head)``: ``fold_in(key, position)``
hashes each edge's receiver-sorted slot index into an independent
subkey (threefry — vmapped, so it lowers to one vectorized hash sweep),
and uniforms drawn from it decide the keep. Evaluating the same
function on ``iota(E)`` gives the receiver-order mask and on
``bwd_perm`` (sender-slot -> receiver-slot) the sender-order mask —
two elementwise sweeps, zero permutes, bitwise-consistent by
construction.

Reference semantics: attention dropout after normalization with
inverted scaling (gatv2_conv.py:252-253 — keras `Dropout(rate)` on
alpha). A kept edge's alpha is scaled by ``1/keep``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["keep_mask_at", "attention_keep_masks"]


def keep_mask_at(
    key: jax.Array,
    positions: jax.Array,  # [E] int32 canonical edge slots
    heads: int,
    rate: float,
    dtype=jnp.float32,
) -> jax.Array:
    """``[E, heads]`` pre-scaled keep mask (1/keep or 0) where entry
    ``e`` depends only on ``(key, positions[e], head)``."""
    keep = 1.0 - float(rate)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, positions)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (heads,)))(keys)
    return jnp.where(u < keep, 1.0 / keep, 0.0).astype(dtype)


def attention_keep_masks(
    key: jax.Array,
    num_edges: int,
    perm: jax.Array,  # [E] int32: sender-sorted slot -> receiver slot
    heads: int,
    rate: float,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """The SAME random mask in both edge orders, without a permute.

    Returns ``(mask, mask_ss)``: ``mask`` indexed by receiver-sorted
    slot (the canonical stream order), ``mask_ss[j] == mask[perm[j]]``
    exactly. Feed both to ``GraphContext.attend`` so the backward can
    take the permutation-free sender-recompute path.
    """
    iota = jnp.arange(num_edges, dtype=jnp.int32)
    mask = keep_mask_at(key, iota, heads, rate, dtype)
    mask_ss = keep_mask_at(key, perm.astype(jnp.int32), heads, rate, dtype)
    return mask, mask_ss
