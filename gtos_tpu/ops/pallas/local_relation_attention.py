"""Pallas TPU kernels: LOCALIZED fused relation-aware graph attention.

Round-2's kernels gathered per-pair score terms from tables as wide as the
BATCH-GLOBAL relation bank (P lanes -> P/128 chunked lane-shuffles, each
chunk 1/(P/128) useful). But a graph can only reference its OWN distinct
paths: real AMR-scale graphs use a few hundred, while the batch-global
bank runs to thousands. This module exploits the localization:

  * batchify (build_local_banks=True) gives every graph contiguous LOCAL
    slots: `rel_index_loc` [B,N,N] in [0,P_loc), `bank_map` [B,P_loc] ->
    global row. P_loc is ~8-60x smaller than the global bank.
  * forward: per (graph, head) the whole [N, P_loc] score table is built
    by ONE MXU matmul against the graph's resident local bank, and the
    per-pair gather shuffles over P_loc/128 chunks instead of P/128.
  * backward: the gather's transpose (a scatter-add) is re-expressed with
    sort order: scatter(ge)[i, p] = S[i, end(p)-1] - S[i, start(p)-1]
    where S is the lane PREFIX-SUM of ge's columns sorted by slot (one
    MXU triangular matmul) and start/end are `rel_bnd` boundary counts —
    computed ON DEVICE per step (device_sort_bnd, DCE'd at inference).

ROUND-5 LAYOUT (the empirical story is in
benchmarks/kernel_decomposition.json): the r4 kernel was ~90%
DATA-MOVEMENT-bound, and most of that was per-operand pipeline overhead —
nine separate block operands per grid step cost ~120 us/batch while the
two 25 MB banks alone stream at ~720 GB/s. The r5 kernels therefore
consolidate operands:

  * q/k/v ride as ONE [B, H, N, 3*128] bf16 array (lane-packed, each
    128-lane third zero-padded past Dh) — XLA fuses the pack into the
    head-split transposes it already materializes;
  * idx/idxT/mask pack into ONE int32 array on rows;
  * the backward packs (rel_sort, rel_sortT) and (rel_bnd, rel_bndT)
    the same way and emits gq/gk/gv as ONE [B, H, N, 3*128] f32 output;
  * op order is PHASE-MAJOR (all MXU table matmuls, then all VPU
    gathers, then softmax/out): Mosaic overlaps the units across heads,
    measured -20% alone.

Measured (exp_local_fwd.py, real v5e, honest batchify inputs at
B=32 H=8 N=32 Dh=64 P_loc=768): r4 kernel 286 us -> packed phase-major
124 us forward.

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
DP = 128  # lane width of one packed q/k/v third


def _chunked_gather(table, hi, lo, n_chunks):
    """out[r, c] = table[r, idx[r, c]] for a [R, P_loc] table value.

    Mosaic's dynamic_gather is a within-vreg lane shuffle (gather width
    <= 128), so the P_loc-wide lookup decomposes into chunk shuffles
    selected by the indices' high bits. hi/lo are precomputed once and
    shared by both tables and all heads.

    Negative result, measured r4 on v5e: skipping per-graph inactive
    chunks behind per-chunk lax.conds was SLOWER than this static unroll
    (branch overhead exceeds the shuffle savings once the local_bank
    bucket ladder is dense). Keep the loop static. (r5 postscript: the
    gathers are ~25% of the kernel; the r4 'VPU wall' hypothesis was
    overturned by ablation — see kernel_decomposition.json.)"""
    out = jnp.zeros(hi.shape, jnp.float32)
    for c in range(n_chunks):
        part = jnp.take_along_axis(
            table[:, c * 128:(c + 1) * 128], lo, axis=1,
            mode="promise_in_bounds")
        out = jnp.where(hi == c, part, out)
    return out


def _pad_lane(x, to):
    if x.shape[-1] == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


def _pack_qkv(q, k, v):
    """[B,H,N,Dh] x3 -> one [B,H,N,3*DP] (each third zero-padded past Dh).
    XLA fuses this into the producers' head-split transposes."""
    return jnp.concatenate(
        [_pad_lane(q, DP), _pad_lane(k, DP), _pad_lane(v, DP)], axis=-1)


def _aux_rows(N):
    return -(-(2 * N + 1) // 8) * 8


def _pack_aux(rel_index_loc, node_mask):
    """idx/idxT/mask -> one [B, pad8(2N+1), Nc] int32 array (rows:
    [0,N) = idx, [N,2N) = idxT, row 2N = mask, rest zero-fill)."""
    B, N, _ = rel_index_loc.shape
    Nc = -(-N // 128) * 128
    rows = _aux_rows(N)
    idx_p = _pad_lane(rel_index_loc, Nc)
    idxT_p = _pad_lane(jnp.swapaxes(rel_index_loc, 1, 2), Nc)
    mask_p = _pad_lane(node_mask.astype(jnp.int32).reshape(B, 1, N), Nc)
    fill = jnp.zeros((B, rows - 2 * N - 1, Nc), jnp.int32)
    return jnp.concatenate([idx_p, idxT_p, mask_p, fill], axis=1)


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


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# Forward (packed operands, phase-major schedule)
# ---------------------------------------------------------------------------


def _fwd_kernel(qkv_ref, ab_ref, bb_ref, t4_ref, aux_ref, out_ref,
                probs_ref=None, *, scale, Dh, N):
    """One program per graph b. qkv: [H, N, 3*DP] (lane-packed); ab/bb:
    [P_loc, H*Dh] (this graph's localized banks, projection layout); t4:
    [H, P_loc] f32; aux: [pad8(2N+1), Nc] i32 (idx/idxT/mask on rows).
    probs_ref ([H, N, Nc] f32, optional) persists the attention probs so
    the backward skips the table-rebuild + gather recompute."""
    H = qkv_ref.shape[0]
    P_loc = ab_ref.shape[0]
    n_chunks = P_loc // 128
    Nc = aux_ref.shape[-1]
    f32 = jnp.float32

    mask_row = aux_ref[2 * N, :].reshape(1, -1)
    mask_add = jnp.where(mask_row != 0, 0.0, NEG_INF)[:, :N]
    idx = aux_ref[:N, :]
    idxT = aux_ref[N:2 * N, :]
    hi, lo = idx >> 7, jnp.bitwise_and(idx, 127)
    hiT, loT = idxT >> 7, jnp.bitwise_and(idxT, 127)

    qh = lambda h: qkv_ref[h][:, :Dh]                    # noqa: E731
    kh = lambda h: qkv_ref[h][:, DP:DP + Dh]             # noqa: E731
    qh_p = lambda h: qkv_ref[h][:, :DP]                  # noqa: E731
    kh_p = lambda h: qkv_ref[h][:, DP:2 * DP]            # noqa: E731
    vh_p = lambda h: qkv_ref[h][:, 2 * DP:3 * DP]        # noqa: E731

    # PHASE-MAJOR (measured -20%): all MXU table matmuls, then all VPU
    # gathers, then softmax/out — Mosaic overlaps later heads' matmuls
    # with earlier heads' gather shuffles.
    tabs = []
    for h in range(H):
        bsl = bb_ref[:, h * Dh:(h + 1) * Dh]
        asl = ab_ref[:, h * Dh:(h + 1) * Dh]
        t2 = jax.lax.dot_general(qh(h), bsl, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        t2 = t2 + t4_ref[h].reshape(1, -1)
        t3 = jax.lax.dot_general(kh(h), asl, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        tabs.append((t2, t3))
    gathered = [(_chunked_gather(t2, hi, lo, n_chunks)[:, :N],
                 _chunked_gather(t3, hiT, loT, n_chunks)[:, :N])
                for (t2, t3) in tabs]
    for h in range(H):
        e24, e3t = gathered[h]
        t1 = jax.lax.dot_general(qh_p(h), kh_p(h), (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        e = (t1 + e24 + e3t.T) * scale + mask_add
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn_f32 = p / s
        if probs_ref is not None:
            probs_ref[h] = _pad_lane(attn_f32, Nc)
        attn = attn_f32.astype(qkv_ref.dtype)
        out_ref[h] = jax.lax.dot_general(
            attn, vh_p(h), (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "scale", "with_probs"))
def local_relation_attention(q, k, v, a_loc, b_loc, rel_index_loc,
                             node_mask, interpret: bool = False,
                             scale: float = None,
                             with_probs: bool = False):
    """Forward-only localized fused attention.

    q, k, v: [B, H, N, Dh]; a_loc/b_loc: [B, P_loc, H, Dh] (per-graph
    localized banks, e.g. a_bank[bank_map]); rel_index_loc: [B, N, N]
    local slots; node_mask: [B, N]. Returns out [B, H, N, Dh] in
    v.dtype."""
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    assert P_loc % 128 == 0, f"P_loc {P_loc} must be a multiple of 128"
    assert N <= 128, (
        f"dense localized kernel is for node buckets <= 128 (got {N}); "
        "use the sparse/block_sparse path for larger graphs")
    if scale is None:
        scale = Dh ** -0.5
    f32 = jnp.float32
    Nc = -(-N // 128) * 128
    rows = _aux_rows(N)

    qkv3 = _pack_qkv(q, k, v)
    ab = a_loc.reshape(B, P_loc, H * Dh)
    bb = b_loc.reshape(B, P_loc, H * Dh)
    t4 = jnp.einsum("bphd,bphd->bhp", a_loc.astype(f32), b_loc.astype(f32))
    aux = _pack_aux(rel_index_loc, node_mask)

    qkvs = pl.BlockSpec((1, H, N, 3 * DP), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bank = pl.BlockSpec((1, P_loc, H * Dh), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    t4s = pl.BlockSpec((1, H, P_loc), lambda b, *_: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    auxs = pl.BlockSpec((1, rows, Nc), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.BlockSpec((1, H, N, DP), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    if with_probs:
        prob_spec = pl.BlockSpec((1, H, N, Nc), lambda b, *_: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

        def kernel_p(qkv_r, ab_r, bb_r, t4_r, aux_r, out_r, probs_r):
            _fwd_kernel(qkv_r.at[0], ab_r.at[0], bb_r.at[0], t4_r.at[0],
                        aux_r.at[0], out_r.at[0], probs_r.at[0],
                        scale=scale, Dh=Dh, N=N)

        out, probs = pl.pallas_call(
            kernel_p,
            grid=(B,),
            in_specs=[qkvs, bank, bank, t4s, auxs],
            out_specs=(outs, prob_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, N, DP), v.dtype),
                jax.ShapeDtypeStruct((B, H, N, Nc), jnp.float32),
            ),
            compiler_params=_VMEM,
            interpret=interpret,
        )(qkv3, ab, bb, t4, aux)
        return out[..., :Dh], probs

    def kernel(qkv_r, ab_r, bb_r, t4_r, aux_r, out_r):
        _fwd_kernel(qkv_r.at[0], ab_r.at[0], bb_r.at[0], t4_r.at[0],
                    aux_r.at[0], out_r.at[0], scale=scale, Dh=Dh, N=N)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkvs, bank, bank, t4s, auxs],
        out_specs=outs,
        out_shape=jax.ShapeDtypeStruct((B, H, N, DP), v.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(qkv3, ab, bb, t4, aux)
    return out[..., :Dh]


# ---------------------------------------------------------------------------
# Backward: sorted-scatter, fully vectorized over rows; packed operands.
# ---------------------------------------------------------------------------


def _sorted_scatter(ge_pad, sort_idx, bnd, n_chunks, tri, N, lane_p):
    """scatter-add transpose of the gather: out[i, p] = sum_j ge[i, j]
    where slot[i, j] == p, for a whole [N, Nc] ge plane at once.

    sge = ge columns permuted into slot-sorted order (one lane shuffle),
    S = inclusive lane prefix-sum of sge (ONE triangular MXU matmul),
    out[i, p] = E[i, p] - E[i, p-1] with
    E[i, p] = [bnd[i,p] > 0] * S[i, bnd[i,p] - 1]  (E[i, -1] := 0).

    The start-side boundary values are a pure LANE ROLL of the end-side
    ones (start = bnd shifted by one lane), so only ONE data-dependent
    gather per 128-slot chunk is needed — the r5 backward ablation
    measured these dynamic_gather shuffles at ~0.7 us per [N, 128] take,
    the dominant backward cost, and this halves them (exp_local_bwd.py).
    Returns [N, P_loc] f32."""
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

    ends = []
    for c in range(n_chunks):
        end = bnd[:, c * 128:(c + 1) * 128]
        g_end = jnp.take_along_axis(
            S, jnp.maximum(end - 1, 0), axis=1, mode="promise_in_bounds")
        ends.append(jnp.where(end > 0, g_end, 0.0))
    e_m = jnp.concatenate(ends, axis=1)                   # [N, P_loc]
    s_m = jnp.where(lane_p > 0, pltpu.roll(e_m, 1, 1), 0.0)
    return e_m - s_m


def _bwd_kernel(qkv_ref, go_ref, probs_ref, ab_ref, bb_ref, sort_ref,
                bnd_ref, gqkv_ref, gab_ref, gbb_ref, *, scale, Dh, N):
    """One program per graph, phase-major. The forward's attention probs
    arrive as a residual ([H, N, Nc] f32), so there is NO table-rebuild /
    gather recompute: softmax VJP, content grads, the two sorted-scatter
    passes and their bank/q/k contractions — all fused. Packed layout:
    qkv [H, N, 3*DP] bf16/f32; go [H, N, DP] f32 cotangent (kept f32 —
    ADVICE r3); sort [pad8(2N), Nc] i32 (rows [0,N) = sort, [N,2N) =
    sortT); bnd likewise over P_loc lanes; gqkv [H, N, 3*DP] f32 out."""
    H = qkv_ref.shape[0]
    P_loc = ab_ref.shape[0]
    n_chunks = P_loc // 128
    Nc = sort_ref.shape[-1]
    f32 = jnp.float32

    sort_i = sort_ref[:N, :]
    sortT_i = sort_ref[N:2 * N, :]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 1)).astype(f32)
    bnd = bnd_ref[:N, :].astype(jnp.int32)
    bndT = bnd_ref[N:2 * N, :].astype(jnp.int32)

    qh_p = lambda h: qkv_ref[h][:, :DP]                  # noqa: E731
    kh_p = lambda h: qkv_ref[h][:, DP:2 * DP]            # noqa: E731
    vh_p = lambda h: qkv_ref[h][:, 2 * DP:3 * DP]        # noqa: E731

    # phase 1: softmax VJP + content grads (MXU-heavy)
    ges = []
    for h in range(H):
        goh = go_ref[h].astype(f32)
        attn = probs_ref[h][:, :N]                            # [N, N] f32
        g_attn = jax.lax.dot_general(
            goh, vh_p(h).astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        gqkv_ref[h, :, 2 * DP:3 * DP] = jax.lax.dot_general(
            attn, goh, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(gqkv_ref.dtype)
        ge = attn * (g_attn - jnp.sum(g_attn * attn, axis=-1,
                                      keepdims=True))
        ges.append(ge * scale)                                # [N, N]

    # phase 2: sorted-scatter table grads, ALL HEADS STACKED on sublanes
    # — the boundary indices are head-invariant, so one [H*N, 128] take
    # per chunk replaces H separate [N, 128] takes. dynamic_gather cost
    # is per-op (~0.7 us each, exp_local_bwd.py), so this is the
    # backward's biggest single lever (592 -> 493 us kernel-only).
    ge_all = jnp.concatenate([_pad_lane(g, Nc) for g in ges], axis=0)
    geT_all = jnp.concatenate([_pad_lane(g.T, Nc) for g in ges], axis=0)
    sort_all = jnp.concatenate([sort_i] * H, axis=0)
    sortT_all = jnp.concatenate([sortT_i] * H, axis=0)
    bnd_all = jnp.concatenate([bnd] * H, axis=0)
    bndT_all = jnp.concatenate([bndT] * H, axis=0)
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (H * N, P_loc), 1)
    g2_all = _sorted_scatter(ge_all, sort_all, bnd_all, n_chunks, tri, N,
                             lane_all)
    g3_all = _sorted_scatter(geT_all, sortT_all, bndT_all, n_chunks, tri,
                             N, lane_all)                 # [H*N, P_loc]
    gts = [(g2_all[h * N:(h + 1) * N], g3_all[h * N:(h + 1) * N])
           for h in range(H)]

    # phase 3: contractions + bank grads (MXU)
    for h in range(H):
        ge = ges[h]
        g_t2, g_t3 = gts[h]
        bsl = bb_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        asl = ab_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        qh32 = qh_p(h).astype(f32)
        kh32 = kh_p(h).astype(f32)
        # gq = ge k + g_t2 . b_loc ; gk = ge^T q + g_t3 . a_loc
        gq = jax.lax.dot_general(
            ge, kh32, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        gq += _pad_lane(jax.lax.dot_general(
            g_t2, bsl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32), DP)
        gk = jax.lax.dot_general(
            ge, qh32, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        gk += _pad_lane(jax.lax.dot_general(
            g_t3, asl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32), DP)
        gqkv_ref[h, :, :DP] = gq.astype(gqkv_ref.dtype)
        gqkv_ref[h, :, DP:2 * DP] = gk.astype(gqkv_ref.dtype)

        # per-graph bank grads (projection layout slices), with the t4
        # unfold fused in (t4 = sum_d a.b => dt4/da = b, dt4/db = a;
        # g_t4[p] = sum_i g_t2[i, p]):
        # g_b = g_t2^T q + g_t4 * a,  g_a = g_t3^T k + g_t4 * b
        gt4_col = jnp.sum(g_t2, axis=0).reshape(P_loc, 1)
        gbb_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t2, qh32[:, :Dh], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
            + gt4_col * asl).astype(gbb_ref.dtype)
        gab_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t3, kh32[:, :Dh], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
            + gt4_col * bsl).astype(gab_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def local_relation_attention_bwd(q, k, v, g_out, probs, a_loc, b_loc,
                                 rel_sort, rel_bnd, rel_sortT, rel_bndT,
                                 interpret: bool = False,
                                 scale: float = None):
    """-> (g_q, g_k, g_v, g_ab, g_bb — all in q.dtype, accumulated f32
    in-kernel) — COMPLETE localized-bank grads (the t4 unfold is fused
    in-kernel). probs: the forward's attention probabilities
    ([B,H,N,Nc] f32 from with_probs=True) — no recompute happens here."""
    B, H, N, Dh = q.shape
    P_loc = a_loc.shape[1]
    if scale is None:
        scale = Dh ** -0.5
    f32 = jnp.float32
    Nc = -(-N // 128) * 128
    rows2 = -(-(2 * N) // 8) * 8

    qkv3 = _pack_qkv(q, k, v)
    ab = a_loc.reshape(B, P_loc, H * Dh)
    bb = b_loc.reshape(B, P_loc, H * Dh)
    gop = _pad_lane(g_out.astype(f32), DP)

    def pack2(a, b, lanes, dtype=jnp.int32):
        fill = jnp.zeros((B, rows2 - 2 * N, lanes), dtype)
        return jnp.concatenate(
            [_pad_lane(a, lanes).astype(dtype),
             _pad_lane(b, lanes).astype(dtype), fill], axis=1)

    sorts = pack2(rel_sort, rel_sortT, Nc)
    # boundary counts are <= N <= 128: int16 halves the largest int
    # operand ([B, 2N, P_loc]); widened back to i32 indices in-kernel
    bnds = pack2(rel_bnd, rel_bndT, P_loc, dtype=jnp.int16)

    qkvs = pl.BlockSpec((1, H, N, 3 * DP), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    gos = pl.BlockSpec((1, H, N, DP), lambda b, *_: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bank = pl.BlockSpec((1, P_loc, H * Dh), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    prob_spec = pl.BlockSpec((1, H, N, Nc), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    sort_spec = pl.BlockSpec((1, rows2, Nc), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((1, rows2, P_loc), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(qkv_r, go_r, probs_r, ab_r, bb_r, sort_r, bnd_r, gqkv_r,
               gab_r, gbb_r):
        _bwd_kernel(qkv_r.at[0], go_r.at[0], probs_r.at[0], ab_r.at[0],
                    bb_r.at[0], sort_r.at[0], bnd_r.at[0], gqkv_r.at[0],
                    gab_r.at[0], gbb_r.at[0], scale=scale, Dh=Dh, N=N)

    # gq/gk/gv accumulate in f32 IN-KERNEL but are stored in the input
    # dtype: the trainable wrapper casts them to q.dtype immediately
    # anyway, so an f32 output block would write (and re-read) twice the
    # bytes for precision that is then discarded
    gqkv, gab, gbb = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkvs, gos, prob_spec, bank, bank, sort_spec, bnd_spec],
        out_specs=(qkvs, bank, bank),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, 3 * DP), q.dtype),
            jax.ShapeDtypeStruct((B, P_loc, H * Dh), q.dtype),
            jax.ShapeDtypeStruct((B, P_loc, H * Dh), q.dtype),
        ),
        compiler_params=_VMEM,
        interpret=interpret,
    )(qkv3, gop, probs, ab, bb, sorts, bnds)
    gq = gqkv[..., :Dh]
    gk = gqkv[..., DP:DP + Dh]
    gv = gqkv[..., 2 * DP:2 * DP + Dh]
    return gq, gk, gv, gab, gbb


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
        "(rel_sort/rel_bnd/...); compute them with device_sort_bnd "
        "(the model does this automatically) or use the trainable "
        "entry local_relation_attention_trainable.")


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
