"""Propagation precompute: hoist loop-invariant SpMMs out of training.

The reference library re-executes every propagation step per epoch (its
training loops call ``model([x, edge_index])`` each step,
docs/tutorials/node_classification.md:95-183). On a static full graph the
first GCN layer's propagation ``S @ X`` (S = normalized adjacency, X =
input features) is **loop-invariant**: it involves no parameters, so it
can be computed once at setup and the layer degenerates to a dense
matmul::

    out_1 = S (X W_1) = (S X) W_1          # linearity
    dW_1  = (S X)^T g_1                    # backward is dense too

This removes the two most expensive SpMMs (forward + backward at full
feature width) from every training step — the same trick underlying SGC
(Wu et al. 2019, "Simplifying Graph Convolutional Networks") and
production GNN feature-propagation pipelines.

Validity: exact whenever the first layer's per-edge message is linear in
the node features and nothing stochastic (e.g. input dropout) sits between
``X`` and the propagation. GCN qualifies; attention layers do not.

``precompute_propagation(ctx, x, hops=k)`` returns ``S^k X`` for SGC-style
k-hop models; ``hops=1`` is the cached-first-GCN-layer case.
"""

from __future__ import annotations

import jax

__all__ = ["precompute_propagation"]


def precompute_propagation(
    context, x: jax.Array, *, hops: int = 1
) -> jax.Array:
    """Return ``S^hops @ x`` computed once with the kernelized SpMM.

    ``context`` is a :class:`~keras_geometric_tpu.ops.csr.GraphContext`
    (typically built with ``add_self_loops=True, gcn_normalize=True`` so S
    is the symmetric-normalized adjacency). Run it outside the training
    step; feed the result to a dense layer (or a GCNConv with an
    edgeless graph) in place of the first propagation::

        sx = precompute_propagation(ctx, x)          # once
        h1 = act(sx @ W1 + b1)                       # per step: dense only

    The result is mathematically identical to running the first GCN
    layer's propagation every step, while its fwd+bwd SpMMs (the two
    widest in a 2-layer GCN) disappear from the step entirely.
    """
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    # Banded contexts: the ~350 MB dense band array must enter the jit
    # as a runtime ARGUMENT — a closure constant is serialized into the
    # compile payload and the tunneled remote-compile service rejects
    # it (HTTP 413; docs/performance.md Fact 9).
    band = getattr(context, "band", None)
    band_bwd = getattr(context, "band_bwd", None)
    b_f = band.band if band is not None else None
    b_b = band_bwd.band if band_bwd is not None else None
    slim = context
    if b_f is not None:
        slim = slim._replace(band=band._replace(band=None))
    if b_b is not None:
        slim = slim._replace(band_bwd=band_bwd._replace(band=None))

    @jax.jit
    def fn(h, bf, bb):
        c = slim
        if bf is not None:
            c = c._replace(band=c.band._replace(band=bf))
        if bb is not None:
            c = c._replace(band_bwd=c.band_bwd._replace(band=bb))
        return c.spmm(h)

    for _ in range(hops):
        x = fn(x, b_f, b_b)
    return x
