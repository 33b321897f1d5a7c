"""Relation-aware attention scores — the TPU-native bank decomposition.

The reference (generator/graph_transformer.py RelationMultiheadAttention in
jcyk/gtos — SURVEY.md §2.2, §3.4) computes, for every ordered node pair
(i, j), a relation vector r_ij and scores

    e_ij = scale * (q_i + a_ij) . (k_j + b_ij)

where a_ij / b_ij are linear projections of r_ij. It materializes the pair
tensor r as [n, n, B, d] — the O(n^2 * d) memory cliff SURVEY.md §3.4 flags.

Here the score expands into four terms

    e_ij = q_i.k_j  +  q_i.b_ij  +  a_ij.k_j  +  a_ij.b_ij

and because every r_ij is a row of the deduplicated relation bank
(r_ij = bank[idx[i, j]], P unique rows << n^2 pairs), the three relation
terms become small MXU matmuls against the bank followed by scalar gathers:

    T2[i, p] = q_i . b_bank[p]          ([N, D] x [D, P] matmul)
    T3[j, p] = k_j . a_bank[p]          ([N, D] x [D, P] matmul)
    T4[p]    = a_bank[p] . b_bank[p]    (elementwise reduce over the bank)

    e_ij = q_i.k_j + T2[i, idx_ij] + T3[j, idx_ij] + T4[idx_ij]

Memory drops from O(n^2 d) to O(nP + n^2) per head and all FLOPs land on the
MXU. The decomposition is exact (no approximation) — verified against the
dense materialization in tests/test_ops.py.

Shapes (batch-major; H = heads, D = head dim, P = bank rows):
    q, k, v   : [B, H, N, D]
    a_bank    : [P, H, D]   (relation bank projected by the layer's W_a)
    b_bank    : [P, H, D]   (ditto, W_b)
    rel_index : [B, N, N] int32  (pair -> bank row)
    key_mask  : [B, N] bool      (True at real nodes)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def bank_relation_scores(q, k, a_bank, b_bank, rel_index, *, scale=None):
    """Unnormalized scores e: [B, H, N, N] via the 4-term decomposition."""
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    f32 = jnp.float32

    # T1: content-content, plain MXU matmul.
    t1 = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=f32)

    # T2: content(query)-relation. [B,H,N,P] table, gathered per (i, j).
    t2 = jnp.einsum("bhid,phd->bhip", q, b_bank, preferred_element_type=f32)
    idx_q = rel_index[:, None, :, :]                      # [B,1,N,N]
    t2g = jnp.take_along_axis(t2, idx_q, axis=-1)         # [B,H,N,N]

    # T3: relation-content(key). Table indexed by j, gathered per (i, j).
    t3 = jnp.einsum("bhjd,phd->bhjp", k, a_bank, preferred_element_type=f32)
    t3_exp = t3[:, :, None, :, :]                         # [B,H,1,N,P]
    idx_k = rel_index[:, None, :, :, None]                # [B,1,N,N,1]
    t3g = jnp.take_along_axis(t3_exp, idx_k, axis=-1)[..., 0]  # [B,H,N,N]

    # T4: relation-relation bias, one scalar per bank row per head.
    t4 = jnp.einsum("phd,phd->ph", a_bank.astype(f32), b_bank.astype(f32))
    t4g = t4[rel_index]                                   # [B,N,N,H]
    t4g = jnp.transpose(t4g, (0, 3, 1, 2))                # [B,H,N,N]

    return (t1 + t2g + t3g + t4g) * scale


def dense_relation_scores_reference(q, k, a_bank, b_bank, rel_index, *, scale=None):
    """The reference-style dense materialization (for parity tests and as the
    throughput baseline in bench.py): gathers the full [B, N, N, H, D]
    relation pair tensors, then one big contraction. Numerically identical
    to bank_relation_scores."""
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    f32 = jnp.float32
    a_pair = a_bank[rel_index]                            # [B,N,N,H,D]
    b_pair = b_bank[rel_index]
    qe = jnp.transpose(q, (0, 2, 1, 3))[:, :, None]       # [B,N,1,H,D]
    ke = jnp.transpose(k, (0, 2, 1, 3))[:, None, :]       # [B,1,N,H,D]
    e = jnp.sum((qe + a_pair).astype(f32) * (ke + b_pair).astype(f32), axis=-1)
    return jnp.transpose(e, (0, 3, 1, 2)) * scale         # [B,H,N,N]


def masked_softmax(scores, key_mask):
    """Softmax over the last axis with key positions masked out.

    scores: [B, H, N, N]; key_mask: [B, N] (True = attend-able)."""
    neg = jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
    return jax.nn.softmax(scores + neg, axis=-1)


def bank_relation_attention(
    q, k, v, a_bank, b_bank, rel_index, key_mask, *, scale=None,
    scores_fn=bank_relation_scores,
):
    """Full relation-aware attention: scores -> masked softmax -> aggregate.

    Returns (out [B, H, N, D], attn [B, H, N, N])."""
    e = scores_fn(q, k, a_bank, b_bank, rel_index, scale=scale)
    attn = masked_softmax(e, key_mask)
    out = jnp.einsum(
        "bhij,bhjd->bhid", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, attn
