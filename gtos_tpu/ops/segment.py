"""Sparse edge-list ops: SDDMM, segment softmax, SpMM.

The reference never has these (its attention is dense over all pairs —
SURVEY.md §5 "Long-context"); they are the framework's scaling path for
graphs too large for dense all-pairs attention: O(E) memory instead of
O(N^2). Edges are a padded COO list sorted by destination so that
per-destination reductions are contiguous segment sums.

Conventions:
    src, dst : [E] int32 node ids (dst-sorted; padding edges point at node
               N_pad with weight masked via edge_mask)
    edge_mask: [E] bool (True = real edge)
    x        : [N, D] node features (single graph or a flattened batch with
               node ids offset per graph)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sparse_sddmm(q, k, src, dst, edge_mask=None):
    """Per-edge attention scores: e[e] = q[dst[e]] . k[src[e]].

    q, k: [N, D] (or [H, N, D] for multi-head via vmap). Returns [E]."""
    scores = jnp.sum(
        q[dst].astype(jnp.float32) * k[src].astype(jnp.float32), axis=-1
    )
    if edge_mask is not None:
        scores = jnp.where(edge_mask, scores, NEG_INF)
    return scores


def segment_softmax(scores, segment_ids, num_segments):
    """Numerically-stable softmax over edges grouped by segment (= dst node).

    scores: [E] f32; segment_ids: [E] int32; returns [E] normalized weights.
    """
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )
    # empty segments produce -inf max; the gather below is still finite per
    # edge because every edge's segment contains at least that edge.
    shifted = scores - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    seg_sum = jax.ops.segment_sum(
        expd, segment_ids, num_segments=num_segments, indices_are_sorted=True,
    )
    return expd / (seg_sum[segment_ids] + 1e-20)


def sparse_spmm(weights, values, src, dst, num_nodes):
    """Aggregate: out[i] = sum_{e: dst[e]=i} weights[e] * values[src[e]].

    weights: [E]; values: [N, D]; returns [N, D]."""
    contrib = weights[:, None].astype(jnp.float32) * values[src].astype(jnp.float32)
    return jax.ops.segment_sum(
        contrib, dst, num_segments=num_nodes, indices_are_sorted=True,
    )


def sparse_graph_attention(q, k, v, src, dst, edge_mask, num_nodes):
    """SDDMM -> segment softmax -> SpMM, the O(E) attention pipeline.

    q, k, v: [N, D]; returns [N, D]. Multi-head: vmap over a leading axis.
    """
    scale = q.shape[-1] ** -0.5
    e = sparse_sddmm(q, k, src, dst, edge_mask) * scale
    w = segment_softmax(e, dst, num_nodes)
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0.0)
    return sparse_spmm(w, v, src, dst, num_nodes)
