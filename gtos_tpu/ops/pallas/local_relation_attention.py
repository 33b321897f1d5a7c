"""Pallas TPU kernels: LOCALIZED fused relation-aware graph attention.

Round-2's kernels gathered per-pair score terms from tables as wide as the
BATCH-GLOBAL relation bank (P lanes -> P/128 chunked lane-shuffles, each
chunk 1/(P/128) useful — the measured VPU wall, BENCH_r02 mfu 7.7%). But a
graph can only reference its OWN distinct paths: real AMR-scale graphs use
a few hundred, while the batch-global bank runs to thousands (measured on
the synthetic corpus: N=32 graphs reference ~400-700 paths each while a
32-graph batch's global bank exceeds 8000 — the old kernel's
bank-resident-in-VMEM assumption does not even hold at honest scale).
This module exploits the localization:

  * batchify (build_local_banks=True) gives every graph contiguous LOCAL
    slots: `rel_index_loc` [B,N,N] in [0,P_loc), `bank_map` [B,P_loc] ->
    global row. P_loc is ~8-60x smaller than the global bank.
  * forward: per (graph, head) the whole [N, P_loc] score table is built
    by ONE MXU matmul against the graph's resident local bank, and the
    per-pair gather shuffles over P_loc/128 chunks instead of P/128 —
    the VPU work drops by the localization ratio.
  * backward: the gather's transpose (a scatter-add, the round-2 10x
    wall: a per-row fori_loop of one-hot matmuls) is re-expressed with
    host-precomputed sort order: scatter(ge)[i, p] = S[i, end(p)-1] -
    S[i, start(p)-1] where S is the lane PREFIX-SUM of ge's columns
    sorted by slot (one MXU triangular matmul) and start/end are
    `rel_bnd` boundary counts — two lane-shuffles per 128-slot chunk,
    NO loop over rows, NO one-hot. The table->bank and table->q/k
    contractions run as plain MXU matmuls inside the same kernel.
  * LAYOUT (the difference between 1.3 ms and 0.2 ms, measured on v5e):
    the banks stream in exactly as the relation projection produces them
    — [B, P_loc, H*Dh] bf16, no transpose, no head padding; the kernel
    slices each head's 64-lane column block in-register (Mosaic handles
    64-aligned lane slices at full speed). Any XLA-side pad/transpose of
    the banks costs more HBM traffic than the whole kernel.

Reference math (jcyk/gtos RelationMultiheadAttention, SURVEY.md §3.4):
  e_ij = scale * (q_i + a_r(ij)) . (k_j + b_r(ij)), softmax over j,
  out_i = sum_j attn_ij v_j,   r(ij) = rel_index[b, i, j]
       = [q.k + q.b_r + a_r.k + (a_r.b_r)](ij); the 4th term rides in as
  the precomputed per-slot scalar `t4` [B, H, P_loc].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _chunked_gather(table, hi, lo, n_chunks):
    """out[r, c] = table[r, idx[r, c]] for a [R, P_loc] table value.

    Mosaic's dynamic_gather is a within-vreg lane shuffle (gather width
    <= 128), so the P_loc-wide lookup decomposes into chunk shuffles
    selected by the indices' high bits. hi/lo are precomputed once and
    shared by both tables and all heads.

    Negative result, measured r4 on v5e: skipping per-graph inactive
    chunks (slots are contiguous, so chunks >= ceil(bank_width/128) never
    hit) behind per-chunk lax.conds was SLOWER than this static unroll
    (fwd 0.42 vs 0.30 ms at P_loc=768) — branch overhead exceeds the
    shuffle savings once the local_bank bucket ladder is dense. Keep the
    loop static; attack chunk count via the ladder (BucketSpec)."""
    out = jnp.zeros(hi.shape, jnp.float32)
    for c in range(n_chunks):
        part = jnp.take_along_axis(
            table[:, c * 128:(c + 1) * 128], lo, axis=1,
            mode="promise_in_bounds")
        out = jnp.where(hi == c, part, out)
    return out


def _head_tables(q_ref, k_ref, ab_ref, bb_ref, t4_ref, h, Dh):
    """t2 = q_h . b_h + t4_h, t3 = k_h . a_h as [N, P_loc] f32 values —
    one MXU matmul each against the graph's resident local bank slice."""
    f32 = jnp.float32
    qh = q_ref[h][:, :Dh]
    kh = k_ref[h][:, :Dh]
    bsl = bb_ref[:, h * Dh:(h + 1) * Dh]
    asl = ab_ref[:, h * Dh:(h + 1) * Dh]
    t2 = jax.lax.dot_general(
        qh, bsl, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    t2 = t2 + t4_ref[h].reshape(1, -1)
    t3 = jax.lax.dot_general(
        kh, asl, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    return t2, t3


def _fwd_kernel(q_ref, k_ref, v_ref, ab_ref, bb_ref, t4_ref, idx_ref,
                idxT_ref, mask_ref, out_ref, probs_ref=None, *,
                scale, Dh):
    """One program per graph b. q/k/v: [H, N, Dpad] VMEM (lane-padded);
    ab/bb: [P_loc, H*Dh] VMEM (this graph's localized banks, projection
    layout); t4: [H, P_loc] f32; idx/idxT: [N, Nc]; mask: [1, 1, Nc].
    probs_ref ([H, N, Nc] f32, optional): persists the attention probs so
    the backward can skip the whole table-rebuild + gather recompute."""
    H, N, _ = q_ref.shape
    P_loc = ab_ref.shape[0]
    n_chunks = P_loc // 128
    Nc = idx_ref.shape[-1]
    f32 = jnp.float32

    mask_row = mask_ref[0, 0, :]
    mask_add = jnp.where(mask_row != 0, 0.0, NEG_INF).reshape(1, -1)[:, :N]

    idx = idx_ref[:, :]
    idxT = idxT_ref[:, :]
    hi, lo = idx >> 7, jnp.bitwise_and(idx, 127)
    hiT, loT = idxT >> 7, jnp.bitwise_and(idxT, 127)

    for h in range(H):
        t2, t3 = _head_tables(q_ref, k_ref, ab_ref, bb_ref, t4_ref, h, Dh)
        e24 = _chunked_gather(t2, hi, lo, n_chunks)[:, :N]
        e3t = _chunked_gather(t3, hiT, loT, n_chunks)[:, :N]
        t1 = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        e = (t1 + e24 + e3t.T) * scale + mask_add
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn_f32 = p / s
        if probs_ref is not None:
            probs_ref[h] = _pad_lane(attn_f32, Nc)
        attn = attn_f32.astype(v_ref.dtype)
        out_ref[h] = jax.lax.dot_general(
            attn, v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(out_ref.dtype)


def _pad_lane(x, to):
    if x.shape[-1] == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


def _prep(q, k, v, a_loc, b_loc, rel_index_loc, node_mask):
    """Shared fwd/bwd operand prep. Banks are only RESHAPED (free) to the
    kernel's [B, P_loc, H*Dh] projection layout; q/k/v lane-pad to 128
    (cheap: the pad lanes are zero so q.k over the full width is exact);
    t4 is the per-slot relation-relation scalar, computed once in XLA."""
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    f32 = jnp.float32
    Dh_pad = max(128, -(-Dh // 128) * 128)
    Nc = -(-N // 128) * 128

    t4 = jnp.einsum("bphd,bphd->bhp", a_loc.astype(f32), b_loc.astype(f32))
    qp = _pad_lane(q, Dh_pad)
    kp = _pad_lane(k, Dh_pad)
    vp = _pad_lane(v, Dh_pad)
    ab = a_loc.reshape(B, P_loc, H * Dh)
    bb = b_loc.reshape(B, P_loc, H * Dh)

    idxT = jnp.swapaxes(rel_index_loc, 1, 2)
    idx_p = _pad_lane(rel_index_loc, Nc)
    idxT_p = _pad_lane(idxT, Nc)
    mask_p = _pad_lane(node_mask.astype(jnp.int32).reshape(B, 1, N), Nc)
    return qp, kp, vp, ab, bb, t4, idx_p, idxT_p, mask_p, Dh_pad, Nc


def _specs(B, H, N, Dh, P_loc, Dh_pad, Nc):
    # index maps accept (b, *prefetch_refs) so a scalar-prefetch operand
    # can be added without touching them (none is used today; the r4
    # per-graph chunk-skipping experiment that introduced one measured
    # slower and was reverted — see _chunked_gather)
    qkv = pl.BlockSpec((1, H, N, Dh_pad), lambda b, *_: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bank = pl.BlockSpec((1, P_loc, H * Dh), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    t4s = pl.BlockSpec((1, H, P_loc), lambda b, *_: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    idxs = pl.BlockSpec((1, N, Nc), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, 1, Nc), lambda b, *_: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    return qkv, bank, t4s, idxs, msk


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "scale", "with_probs"))
def local_relation_attention(q, k, v, a_loc, b_loc, rel_index_loc,
                             node_mask, interpret: bool = False,
                             scale: float = None,
                             with_probs: bool = False):
    """Forward-only localized fused attention.

    q, k, v: [B, H, N, Dh]; a_loc/b_loc: [B, P_loc, H, Dh] (per-graph
    localized banks, e.g. a_bank[bank_map]); rel_index_loc: [B, N, N] local
    slots; node_mask: [B, N]. Returns out [B, H, N, Dh] in v.dtype."""
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    assert P_loc % 128 == 0, f"P_loc {P_loc} must be a multiple of 128"
    assert N <= 128, (
        f"dense localized kernel is for node buckets <= 128 (got {N}); "
        "use the sparse/block_sparse path for larger graphs")
    if scale is None:
        scale = Dh ** -0.5
    (qp, kp, vp, ab, bb, t4, idx_p, idxT_p, mask_p, Dh_pad,
     Nc) = _prep(q, k, v, a_loc, b_loc, rel_index_loc, node_mask)
    qkv, bank, t4s, idxs, msk = _specs(B, H, N, Dh, P_loc, Dh_pad, Nc)

    if with_probs:
        prob_spec = pl.BlockSpec((1, H, N, Nc), lambda b, *_: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

        def kernel_p(q_r, k_r, v_r, ab_r, bb_r, t4_r, idx_r, idxT_r,
                     mask_r, out_r, probs_r):
            _fwd_kernel(q_r.at[0], k_r.at[0], v_r.at[0], ab_r.at[0],
                        bb_r.at[0], t4_r.at[0], idx_r.at[0], idxT_r.at[0],
                        mask_r, out_r.at[0], probs_r.at[0],
                        scale=scale, Dh=Dh)

        out, probs = pl.pallas_call(
            kernel_p,
            grid=(B,),
            in_specs=[qkv, qkv, qkv, bank, bank, t4s, idxs, idxs, msk],
            out_specs=(qkv, prob_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, N, Dh_pad), v.dtype),
                jax.ShapeDtypeStruct((B, H, N, Nc), jnp.float32),
            ),
            compiler_params=_VMEM,
            interpret=interpret,
        )(qp, kp, vp, ab, bb, t4, idx_p, idxT_p, mask_p)
        return out[..., :Dh], probs

    def kernel(q_r, k_r, v_r, ab_r, bb_r, t4_r, idx_r, idxT_r, mask_r,
               out_r):
        _fwd_kernel(q_r.at[0], k_r.at[0], v_r.at[0], ab_r.at[0],
                    bb_r.at[0], t4_r.at[0], idx_r.at[0], idxT_r.at[0],
                    mask_r, out_r.at[0], scale=scale, Dh=Dh)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkv, qkv, qkv, bank, bank, t4s, idxs, idxs, msk],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh_pad), v.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(qp, kp, vp, ab, bb, t4, idx_p, idxT_p, mask_p)
    return out[..., :Dh]


def device_sort_bnd(rel_index_loc, P_loc: int):
    """The sorted-scatter auxiliaries (rel_sort, rel_bnd) computed ON
    DEVICE from the local slot matrix — [B, N, N] int32 -> ([B, N, N]
    stable argsort, [B, N, P_loc] inclusive boundary counts).

    Bit-identical to the host batchify arrays they replace (stable
    ascending argsort; bnd[b, i, p] = #{j: slot[b, i, j] <= p}), but the
    host no longer builds + ships 4 x [B, N, P_loc]-sized arrays per
    batch (~16 MB at the dominant bucket — the single largest host
    batchify cost, VERDICT r4 weak #3 root cause). On device the same
    math is a tiny sort + compare-reduce, and XLA dead-code-eliminates
    it entirely in no-grad (inference) programs because only the
    backward consumes it."""
    srt = jnp.argsort(rel_index_loc, axis=2, stable=True).astype(jnp.int32)
    lanes = jnp.arange(P_loc, dtype=rel_index_loc.dtype)
    bnd = jnp.sum(
        rel_index_loc[:, :, None, :] <= lanes[None, None, :, None],
        axis=-1, dtype=jnp.int32)                        # [B, N, P_loc]
    return srt, bnd


# ---------------------------------------------------------------------------
# Backward: sorted-scatter, fully vectorized over rows.
# ---------------------------------------------------------------------------


def _sorted_scatter(ge_pad, sort_idx, bnd, start, n_chunks, tri, N):
    """scatter-add transpose of the gather: out[i, p] = sum_j ge[i, j]
    where slot[i, j] == p, for a whole [N, Nc] ge plane at once.

    sge = ge columns permuted into slot-sorted order (one lane shuffle),
    S = inclusive lane prefix-sum of sge (ONE triangular MXU matmul),
    out[i, p] = S[i, end-1] - S[i, start-1]  (S[-1] := 0)
    with end = bnd[i, p] (host-precomputed inclusive boundary counts) and
    start = bnd[i, p-1] (lane-rolled once per graph). Returns
    [N, P_loc] f32. (Per-graph chunk skipping was measured slower — see
    _chunked_gather's negative-result note.)"""
    sge = jnp.take_along_axis(ge_pad, sort_idx, axis=1,
                              mode="promise_in_bounds")
    # pad columns (>= N) may gather real values through the padded sort
    # indices; zero them so the prefix sum only counts real js
    col = jax.lax.broadcasted_iota(jnp.int32, sge.shape, 1)
    sge = jnp.where(col < N, sge, 0.0)
    S = jax.lax.dot_general(
        sge, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # [N, Nc]

    outs = []
    for c in range(n_chunks):
        end = bnd[:, c * 128:(c + 1) * 128]
        st = start[:, c * 128:(c + 1) * 128]
        g_end = jnp.take_along_axis(
            S, jnp.maximum(end - 1, 0), axis=1, mode="promise_in_bounds")
        g_start = jnp.take_along_axis(
            S, jnp.maximum(st - 1, 0), axis=1, mode="promise_in_bounds")
        outs.append(jnp.where(end > 0, g_end, 0.0)
                    - jnp.where(st > 0, g_start, 0.0))
    return jnp.concatenate(outs, axis=1)


def _bwd_kernel(q_ref, k_ref, v_ref, go_ref, probs_ref, ab_ref, bb_ref,
                sort_ref, sortT_ref, bnd_ref, bndT_ref, gq_ref,
                gk_ref, gv_ref, gab_ref, gbb_ref, *, scale, Dh):
    """One program per graph. The forward's attention probs arrive as a
    residual ([H, N, Nc] f32 — tiny at N <= 128), so there is NO
    table-rebuild/gather recompute here: softmax VJP, content grads, the
    two sorted-scatter passes and their bank/q/k contractions — all
    fused; nothing of width P_loc leaves the chip except the per-graph
    bank grads themselves."""
    H, N, Dh_pad = q_ref.shape
    P_loc = ab_ref.shape[0]
    n_chunks = P_loc // 128
    Nc = sort_ref.shape[-1]
    f32 = jnp.float32

    # head-invariant scatter structure, computed once per graph
    sort_i = sort_ref[:, :]
    sortT_i = sortT_ref[:, :]
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (N, P_loc), 1)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 1)).astype(f32)
    bnd = bnd_ref[:, :]
    bndT = bndT_ref[:, :]
    start = jnp.where(lane_p > 0, pltpu.roll(bnd, 1, 1), 0)
    startT = jnp.where(lane_p > 0, pltpu.roll(bndT, 1, 1), 0)

    for h in range(H):
        qh, kh, vh = q_ref[h], k_ref[h], v_ref[h]
        goh = go_ref[h].astype(f32)
        attn = probs_ref[h][:, :N]                            # [N, N] f32

        g_attn = jax.lax.dot_general(
            goh, vh.astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        gv_ref[h] = jax.lax.dot_general(
            attn, goh, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(gv_ref.dtype)
        ge = attn * (g_attn - jnp.sum(g_attn * attn, axis=-1, keepdims=True))
        ge = ge * scale                                       # [N, N]
        ge_pad = _pad_lane(ge, Nc)
        geT_pad = _pad_lane(ge.T, Nc)

        # sorted-scatter: table grads, then their contractions on the MXU
        g_t2 = _sorted_scatter(ge_pad, sort_i, bnd, start, n_chunks, tri,
                               N)
        g_t3 = _sorted_scatter(geT_pad, sortT_i, bndT, startT, n_chunks,
                               tri, N)                        # [N, P_loc]

        bsl = bb_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        asl = ab_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        # gq = ge k + g_t2 . b_loc ; gk = ge^T q + g_t3 . a_loc
        gq = jax.lax.dot_general(
            ge, kh.astype(f32), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        gq += _pad_lane(jax.lax.dot_general(
            g_t2, bsl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT), Dh_pad)
        gk = jax.lax.dot_general(
            ge, qh.astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        gk += _pad_lane(jax.lax.dot_general(
            g_t3, asl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT), Dh_pad)
        gq_ref[h] = gq.astype(gq_ref.dtype)
        gk_ref[h] = gk.astype(gk_ref.dtype)

        # per-graph bank grads (projection layout slices), with the t4
        # unfold fused in (t4 = sum_d a.b => dt4/da = b, dt4/db = a;
        # g_t4[p] = sum_i g_t2[i, p]):
        # g_b = g_t2^T q + g_t4 * a,  g_a = g_t3^T k + g_t4 * b
        gt4_col = jnp.sum(g_t2, axis=0).reshape(P_loc, 1)
        gbb_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t2, qh[:, :Dh].astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
            + gt4_col * asl).astype(gbb_ref.dtype)
        gab_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t3, kh[:, :Dh].astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
            + gt4_col * bsl).astype(gab_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def local_relation_attention_bwd(q, k, v, g_out, probs, a_loc, b_loc,
                                 rel_sort, rel_bnd, rel_sortT, rel_bndT,
                                 interpret: bool = False,
                                 scale: float = None):
    """-> (g_q, g_k, g_v [B,H,N,Dh] f32, g_ab, g_bb [B,P_loc,H*Dh]) —
    COMPLETE localized-bank grads (the t4 unfold is fused in-kernel).
    probs: the forward's attention probabilities ([B,H,N,Nc] f32 from
    with_probs=True) — no recompute happens here."""
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    if scale is None:
        scale = Dh ** -0.5
    f32 = jnp.float32
    Dh_pad = max(128, -(-Dh // 128) * 128)
    Nc = -(-N // 128) * 128
    qp = _pad_lane(q, Dh_pad)
    kp = _pad_lane(k, Dh_pad)
    vp = _pad_lane(v, Dh_pad)
    ab = a_loc.reshape(B, P_loc, H * Dh)
    bb = b_loc.reshape(B, P_loc, H * Dh)
    gop = _pad_lane(g_out, Dh_pad)
    sort_p = _pad_lane(rel_sort, Nc)
    sortT_p = _pad_lane(rel_sortT, Nc)
    qkv, bank, _t4s, idxs, _msk = _specs(B, H, N, Dh, P_loc, Dh_pad, Nc)
    prob_spec = pl.BlockSpec((1, H, N, Nc), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((1, N, P_loc), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_r, k_r, v_r, go_r, probs_r, ab_r, bb_r, sort_r,
               sortT_r, bnd_r, bndT_r, gq_r, gk_r, gv_r, gab_r, gbb_r):
        _bwd_kernel(q_r.at[0], k_r.at[0], v_r.at[0], go_r.at[0],
                    probs_r.at[0], ab_r.at[0], bb_r.at[0], sort_r.at[0],
                    sortT_r.at[0], bnd_r.at[0], bndT_r.at[0],
                    gq_r.at[0], gk_r.at[0], gv_r.at[0], gab_r.at[0],
                    gbb_r.at[0], scale=scale, Dh=Dh)

    gq, gk, gv, gab, gbb = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkv, qkv, qkv, qkv, prob_spec, bank, bank, idxs,
                  idxs, bnd_spec, bnd_spec],
        out_specs=(qkv, qkv, qkv, bank, bank),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, Dh_pad), f32),
            jax.ShapeDtypeStruct((B, H, N, Dh_pad), f32),
            jax.ShapeDtypeStruct((B, H, N, Dh_pad), f32),
            jax.ShapeDtypeStruct((B, P_loc, H * Dh), q.dtype),
            jax.ShapeDtypeStruct((B, P_loc, H * Dh), q.dtype),
        ),
        compiler_params=_VMEM,
        interpret=interpret,
    )(qp, kp, vp, gop, probs, ab, bb, sort_p, sortT_p, rel_bnd,
      rel_bndT)
    return gq[..., :Dh], gk[..., :Dh], gv[..., :Dh], gab, gbb


# ---------------------------------------------------------------------------
# Trainable wrapper: custom VJP over the localized operands.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _local_attn_vjp(interpret, q, k, v, a_loc, b_loc, rel_index_loc,
                    node_mask, rel_sort, rel_bnd, rel_sortT, rel_bndT):
    return local_relation_attention(q, k, v, a_loc, b_loc, rel_index_loc,
                                    node_mask, interpret=interpret)


def _local_attn_fwd(interpret, q, k, v, a_loc, b_loc, rel_index_loc,
                    node_mask, rel_sort, rel_bnd, rel_sortT, rel_bndT):
    # run the probs-emitting forward so the backward skips the whole
    # table-rebuild + gather recompute (probs are [B,H,N,Nc] f32 — ~1 MB
    # per layer at the dominant bucket)
    out, probs = local_relation_attention(
        q, k, v, a_loc, b_loc, rel_index_loc, node_mask,
        interpret=interpret, with_probs=True)
    return out, (q, k, v, a_loc, b_loc, probs, rel_sort, rel_bnd,
                 rel_sortT, rel_bndT)


def _local_attn_bwd(interpret, res, g):
    (q, k, v, a_loc, b_loc, probs, rel_sort, rel_bnd, rel_sortT,
     rel_bndT) = res
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    # the cotangent stays f32 into the kernel (it accumulates in f32 and
    # emits f32 gq/gk/gv anyway); downcasting to bf16 here would truncate
    # gradient precision in bf16 training (ADVICE r3)
    gq, gk, gv, gab, gbb = local_relation_attention_bwd(
        q, k, v, g.astype(jnp.float32), probs, a_loc, b_loc,
        rel_sort, rel_bnd, rel_sortT, rel_bndT, interpret=interpret)
    g_a_loc = gab.reshape(B, P_loc, H, Dh).astype(a_loc.dtype)
    g_b_loc = gbb.reshape(B, P_loc, H, Dh).astype(b_loc.dtype)
    zeros = lambda x: _np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    # rel_index_loc / node_mask tangents (positions 6/7 of the primal)
    zidx = _np.zeros((B, N, N), jax.dtypes.float0)
    zmask = _np.zeros((B, N), jax.dtypes.float0)
    return (gq.astype(q.dtype), gk.astype(k.dtype), gv.astype(v.dtype),
            g_a_loc, g_b_loc, zidx, zmask,
            zeros(rel_sort), zeros(rel_bnd), zeros(rel_sortT),
            zeros(rel_bndT))


_local_attn_vjp.defvjp(_local_attn_fwd, _local_attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def local_relation_attention_fwd_only(interpret, q, k, v, a_loc, b_loc,
                                      rel_index_loc, node_mask):
    """Forward-only entry for INFERENCE batches (no sorted-scatter
    auxiliaries). Differentiating it raises a typed message instead of an
    opaque failure deep in Pallas (VERDICT r3 weak #9)."""
    return local_relation_attention(q, k, v, a_loc, b_loc, rel_index_loc,
                                    node_mask, interpret=interpret)


def _fwd_only_fwd(interpret, q, k, v, a_loc, b_loc, rel_index_loc,
                  node_mask):
    out = local_relation_attention_fwd_only(
        interpret, q, k, v, a_loc, b_loc, rel_index_loc, node_mask)
    return out, None


def _fwd_only_bwd(interpret, res, g):
    raise TypeError(
        "pallas_local training needs the sorted-scatter auxiliaries "
        "(rel_sort/rel_bnd/...) that only batchify(for_train=True) "
        "builds; this batch came from an inference pipeline. Rebuild the "
        "batch with for_train=True (DataLoader for_train=True) to take "
        "gradients through the localized kernel.")


local_relation_attention_fwd_only.defvjp(_fwd_only_fwd, _fwd_only_bwd)


def local_relation_attention_trainable(q, k, v, a_loc, b_loc, rel_index_loc,
                                       node_mask, rel_sort, rel_bnd,
                                       rel_sortT, rel_bndT, *,
                                       interpret: bool = False):
    """Differentiable localized fused relation attention.

    a_loc/b_loc are the per-graph localized banks [B, P_loc, H, Dh]
    (produce them with a_bank[bank_map] or by projecting localized
    rel_vecs); gradients flow back through that gather/projection to the
    global parameters via XLA."""
    return _local_attn_vjp(interpret, q, k, v, a_loc, b_loc, rel_index_loc,
                           node_mask, rel_sort, rel_bnd, rel_sortT,
                           rel_bndT)
