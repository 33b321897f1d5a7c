"""Sparse (edge-list) relation-aware attention — the O(E) scaling path.

The reference's encoder attends over ALL node pairs with a dense [N, N]
score matrix biased by per-pair relation vectors (jcyk/gtos
generator/graph_transformer.py RelationMultiheadAttention — SURVEY.md §2.2,
§3.4); that caps graph size at O(N^2) memory. Here the same score

    e_ij = scale * (q_i + a_ij) . (k_j + b_ij)

is evaluated ONLY on an explicit edge list (all pairs within k hops, or all
pairs for exact parity with the dense path), as an SDDMM over gathered
rows, followed by a segment softmax grouped by destination node and a
segment-sum SpMM aggregation — O(E) memory and FLOPs.

Edge layout (produced by gtos_tpu.data.batching.batchify with
`cp_shards=S`): every edge tensor is [B, S, S, Ec] where cell (d, s) holds
the edges whose destination node lies in node-block d and source node in
node-block s (node blocks are N/S contiguous rows). Node ids inside a cell
are BLOCK-LOCAL. With S=1 this degenerates to plain batched COO [B,1,1,E].
The cell structure is what lets the context-parallel ring schedule
(gtos_tpu.parallel.ring_attention) process one source block per ring step.

All reductions run per (batch, head) via vmap'd segment ops; the Pallas
kernel path replaces them on TPU where profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _gather_nodes(x, idx):
    """x: [B, H, N, D]; idx: [B, E] node ids -> [B, H, E, D]."""
    B, H, N, D = x.shape
    E = idx.shape[1]
    ii = jnp.broadcast_to(idx[:, None, :, None], (B, H, E, 1))
    return jnp.take_along_axis(x, ii, axis=2)


def edge_relation_scores(q, k, a_bank, b_bank, src, dst, rel, mask, *,
                         scale=None):
    """Per-edge SDDMM: e[b, h, e] = scale*(q[dst]+a[rel]).(k[src]+b[rel]).

    q, k: [B, H, N, D]; a_bank/b_bank: [P, H, D]; src/dst/rel: [B, E] int32;
    mask: [B, E] bool. Returns [B, H, E] f32 with masked edges at NEG_INF.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    f32 = jnp.float32
    qd = _gather_nodes(q, dst).astype(f32)              # [B,H,E,D]
    ks = _gather_nodes(k, src).astype(f32)
    ar = jnp.transpose(a_bank[rel], (0, 2, 1, 3)).astype(f32)  # [B,H,E,D]
    br = jnp.transpose(b_bank[rel], (0, 2, 1, 3)).astype(f32)
    e = jnp.sum((qd + ar) * (ks + br), axis=-1) * scale  # [B,H,E]
    return jnp.where(mask[:, None, :], e, NEG_INF)


def _segment_op(op, values, ids, num_segments):
    """vmap a jax.ops.segment_* over leading [B, H] dims.

    values: [B, H, E(, D)]; ids: [B, E] -> [B, H, num_segments(, D)]."""
    def per_b(vals_b, ids_b):
        return jax.vmap(
            lambda v: op(v, ids_b, num_segments=num_segments))(vals_b)
    return jax.vmap(per_b)(values, ids)


def sparse_relation_attention(q, k, v, a_bank, b_bank, src, dst, rel, mask,
                              *, scale=None):
    """Full O(E) relation attention on one device.

    q, k, v: [B, H, N, D]; edge tensors [B, E] (any dst order). Returns
    out [B, H, N, D] f32 — rows of nodes with no incoming edges are 0.
    """
    B, H, N, D = q.shape
    e = edge_relation_scores(q, k, a_bank, b_bank, src, dst, rel, mask,
                             scale=scale)
    seg_max = _segment_op(jax.ops.segment_max, e, dst, N)   # [B,H,N]
    seg_max = jnp.maximum(seg_max, NEG_INF)                  # empty segments
    e_sh = e - jnp.take_along_axis(
        seg_max, jnp.broadcast_to(dst[:, None, :], e.shape), axis=2)
    p = jnp.where(mask[:, None, :], jnp.exp(e_sh), 0.0)      # [B,H,E]
    denom = _segment_op(jax.ops.segment_sum, p, dst, N)      # [B,H,N]
    vs = _gather_nodes(v, src).astype(jnp.float32)           # [B,H,E,D]
    num = _segment_op(jax.ops.segment_sum, p[..., None] * vs, dst, N)
    # guarded division: `num / (denom + eps)` breaks under autodiff — the
    # VJP squares the denominator and eps^2 underflows f32 to 0, yielding
    # 0/0 = NaN for empty segments (caught by jax_debug_nans in tests)
    has_in = denom > 0
    safe = jnp.where(has_in, denom, 1.0)[..., None]
    return jnp.where(has_in[..., None], num / safe, 0.0)


def flatten_edge_cells(edge_src, edge_dst, edge_rel, edge_mask,
                       num_nodes: int):
    """[B, S, S, Ec] cell tensors -> flat [B, E] GLOBAL-id edge tensors.

    Cell (d, s) stores block-local ids; globalize with the block offsets
    (block size = num_nodes // S). Used by the single-device sparse path;
    the ring path consumes the cell layout directly."""
    B, S, S2, Ec = edge_src.shape
    assert S == S2
    nl = num_nodes // S
    d_off = (jnp.arange(S) * nl)[None, :, None, None]      # dst block offset
    s_off = (jnp.arange(S) * nl)[None, None, :, None]      # src block offset
    src = (edge_src + s_off).reshape(B, -1)
    dst = (edge_dst + d_off).reshape(B, -1)
    rel = edge_rel.reshape(B, -1)
    mask = edge_mask.reshape(B, -1)
    # park masked edges on node 0 so gathers stay in range (scores are
    # NEG_INF / weights 0 regardless)
    src = jnp.where(mask, src, 0)
    dst = jnp.where(mask, dst, 0)
    return src, dst, rel, mask
