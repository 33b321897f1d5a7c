"""Pallas TPU backward kernel for fused relation attention.

XLA's VJP of the bank-decomposed attention costs ~91 ms at bench shapes
(B=32, N=128, P=2048) — the per-pair gathers transpose into scatter-adds,
which XLA serializes. This kernel computes the whole backward on-chip in
one pass per batch element:

  phase A (per head): recompute e/attn with the same in-register
    dynamic_gather lane shuffles as the forward, then softmax VJP,
    g_v = attn^T g_out, and the content-term grads g_q += g_e k,
    g_k += g_e^T q; g_e is staged (plus a transposed copy) in VMEM;
  phase B (per i-row): the gather's transpose — g_t2[i] = OH_i^T @ G_i —
    runs as a one-hot matmul on the MXU (Mosaic has no vector scatter;
    the transposed one-hot contraction is the TPU-native scatter-add);
  phase C (per j-row): same for g_t3 via the transposed index plane.

The cheap table->parameter contractions (g_t2 x b_bank -> g_q etc.) stay
in XLA. Outputs: g_q, g_k, g_v (f32), g_t2, g_t3 (table dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _bwd_kernel(q_ref, k_ref, v_ref, go_ref, t2_hbm, t3_hbm, idx_ref,
                idxT_ref, mask_ref, gq_ref, gk_ref, gv_ref, gt2_hbm,
                gt3_hbm, tbl_buf, ge_ref, geT_ref, gt_scratch, out_sem,
                dma_sems, *, scale):
    """One program per batch element. Shapes per b:
    q/k/v/go: [H, N, Dh]; t2/t3_hbm: [H, N, P] HBM; idx/idxT: [N, N];
    mask: [1, 1, N]; outputs gq/gk/gv: [H, N, Dh] VMEM blocks and
    gt2/gt3_hbm: [H, N, P] HBM (staged through gt_scratch, reused across
    the two scatter phases); scratch: tbl_buf [2, 2, N, P],
    ge/geT [H, N, N] f32."""
    H, N, Dh = q_ref.shape
    P = tbl_buf.shape[-1]
    f32 = jnp.float32

    def dma(table_hbm, h, table_slot, buf_slot):
        return pltpu.make_async_copy(
            table_hbm.at[h], tbl_buf.at[table_slot, buf_slot],
            dma_sems.at[table_slot, buf_slot])

    def gather_wide(tbl_slot, buf_slot, hi, lo):
        out = jnp.zeros(hi.shape, f32)
        for c in range(P // 128):
            # slice the ref (not a loaded whole-plane value): only the
            # [N, 128] chunk is materialized in registers
            chunk = tbl_buf[tbl_slot, buf_slot, :, c * 128:(c + 1) * 128]
            part = jnp.take_along_axis(
                chunk.astype(f32), lo, axis=1, mode="promise_in_bounds")
            out = jnp.where(hi == c, part, out)
        return out[:, :N]

    # index/mask blocks arrive lane-padded (minor dim Nc, a multiple of
    # 128); padded columns gather garbage that is sliced off
    mask_row = mask_ref[0, 0, :]
    mask_add = jnp.where(mask_row != 0, 0.0, NEG_INF).reshape(1, -1)[:, :N]
    # idx refs are [N, 1, Nc] (leading row dim untiled so phase B/C may
    # index it dynamically); full planes for phase A's gathers:
    idx32 = idx_ref[:, 0, :]
    idxT32 = idxT_ref[:, 0, :]
    hi_a, lo_a = idx32 >> 7, jnp.bitwise_and(idx32, 127)
    hi_t, lo_t = idxT32 >> 7, jnp.bitwise_and(idxT32, 127)

    # ---- phase A: recompute attn, softmax VJP, content grads ----
    dma(t2_hbm, 0, 0, 0).start()
    dma(t3_hbm, 0, 1, 0).start()
    for h in range(H):
        slot = h % 2
        if h + 1 < H:
            dma(t2_hbm, h + 1, 0, (h + 1) % 2).start()
            dma(t3_hbm, h + 1, 1, (h + 1) % 2).start()
        dma(t2_hbm, h, 0, slot).wait()
        dma(t3_hbm, h, 1, slot).wait()

        e24 = gather_wide(0, slot, hi_a, lo_a)
        e3t = gather_wide(1, slot, hi_t, lo_t)
        qh, kh, vh, goh = q_ref[h], k_ref[h], v_ref[h], go_ref[h]
        t1 = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        e = (t1 + e24 + e3t.T) * scale + mask_add
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn = p / s                                          # [N, N] f32

        g_attn = jax.lax.dot_general(
            goh.astype(f32), vh.astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)                       # [N, N]
        gv_ref[h] = jax.lax.dot_general(
            attn, goh.astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(gv_ref.dtype)
        # softmax VJP then the shared *scale of all score terms
        ge = attn * (g_attn - jnp.sum(g_attn * attn, axis=-1, keepdims=True))
        ge = ge * scale
        gq_ref[h] = jax.lax.dot_general(
            ge, kh.astype(f32), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(gq_ref.dtype)
        gk_ref[h] = jax.lax.dot_general(
            ge, qh.astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(gk_ref.dtype)
        # row-major staging ([N, H, N]) so phase B/C can dynamically index
        # the leading dim (sublane-dim dynamic slices must be 8-aligned)
        ge_ref[:, h, :] = ge
        geT_ref[:, h, :] = ge.T

    # ---- phases B/C: the gather's transpose, g_t[r, p] = sum_j
    # ge[r, j] [idx[r, j] == p], as one-hot matmuls on the MXU (Mosaic has
    # no vector scatter). Chunk decomposition: each j lands in exactly one
    # 128-lane chunk (hi = idx >> 7), so the one-hot only needs the
    # WITHIN-CHUNK lane (lo = idx & 127) — a [N, 128] one-hot instead of
    # [N, P] (P/128 x less one-hot build than the naive form), and all
    # chunks' contractions stack into ONE [(P/128)*H, N] @ [N, 128] matmul
    # per row. Staged in VMEM then DMA'd to the HBM output plane. ----
    n_chunks = P // 128
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)

    def scatter_pass(index_ref, ge_scratch, out_hbm):
        dt = gt_scratch.dtype  # bf16 in production: MXU-speed matmuls

        def body(r, _):
            idx_row = index_ref[r][:, :N]                     # [1, N]
            lo = jnp.bitwise_and(idx_row, 127).reshape(N, 1)
            hi = idx_row >> 7                                 # [1, N]
            oh = (iota_lane == jnp.broadcast_to(
                lo, (N, 128))).astype(dt)                     # [N(j), 128]
            g_r = ge_scratch[r]                               # [H, N]
            # gm rows (c, h) = ge[h, :] masked to chunk c
            gm = jnp.concatenate(
                [jnp.where(hi == c, g_r, 0.0) for c in range(n_chunks)],
                axis=0).astype(dt)                            # [C*H, N]
            gt_r = jax.lax.dot_general(
                gm, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)          # [C*H, 128]
            # de-interleave chunks back to [H, P]
            for c in range(n_chunks):
                gt_scratch[r, :, c * 128:(c + 1) * 128] = (
                    gt_r[c * H:(c + 1) * H].astype(gt_scratch.dtype))
            return 0
        jax.lax.fori_loop(0, N, body, 0)
        out_dma = pltpu.make_async_copy(gt_scratch, out_hbm, out_sem)
        out_dma.start()
        out_dma.wait()

    scatter_pass(idx_ref, ge_ref, gt2_hbm)
    # g_t3[j, p] = sum_i ge[i, j] [idxT[j, i] == p] — use the transposed ge
    scatter_pass(idxT_ref, geT_ref, gt3_hbm)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def fused_relation_attention_bwd(q, k, v, g_out, t2, t3, idx, idxT,
                                 node_mask, interpret: bool = False,
                                 scale: float = None):
    """-> (g_q, g_k, g_v [B,H,N,Dh] f32, g_t2, g_t3 [B,N,H,P] t2.dtype
    — note the row-major table-grad layout)."""
    B, H, N, Dh = q.shape
    P = t2.shape[-1]
    if scale is None:
        scale = Dh ** -0.5
    Dh_pad = max(128, -(-Dh // 128) * 128)
    if Dh != Dh_pad:
        pad = [(0, 0)] * 3 + [(0, Dh_pad - Dh)]
        q, k, v, g_out = (jnp.pad(x, pad) for x in (q, k, v, g_out))
        gq, gk, gv, gt2, gt3 = fused_relation_attention_bwd(
            q, k, v, g_out, t2, t3, idx, idxT, node_mask,
            interpret=interpret, scale=scale)
        return (gq[..., :Dh], gk[..., :Dh], gv[..., :Dh], gt2, gt3)

    qkv_spec = pl.BlockSpec((1, H, N, Dh), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    gt_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    # lane-align the index/mask minor dims (Mosaic: VMEM block minor dims
    # must be multiples of 128)
    Nc = -(-N // 128) * 128
    idx_spec = pl.BlockSpec((1, N, 1, Nc), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nc), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_r, k_r, v_r, go_r, t2_r, t3_r, idx_r, idxT_r, mask_r,
               gq_r, gk_r, gv_r, gt2_r, gt3_r, tbl_buf, ge, geT,
               gt_scratch, out_sem, sems):
        b = pl.program_id(0)
        _bwd_kernel(q_r.at[0], k_r.at[0], v_r.at[0], go_r.at[0],
                    t2_r.at[b], t3_r.at[b], idx_r.at[0], idxT_r.at[0],
                    mask_r, gq_r.at[0], gk_r.at[0], gv_r.at[0],
                    gt2_r.at[b], gt3_r.at[b], tbl_buf, ge, geT,
                    gt_scratch, out_sem, sems, scale=scale)

    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec, tbl_spec,
                  tbl_spec, idx_spec, idx_spec, mask_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, gt_spec, gt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, Dh), f32),
            jax.ShapeDtypeStruct((B, H, N, Dh), f32),
            jax.ShapeDtypeStruct((B, H, N, Dh), f32),
            jax.ShapeDtypeStruct((B, N, H, P), t2.dtype),
            jax.ShapeDtypeStruct((B, N, H, P), t3.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, N, P), t2.dtype),
            pltpu.VMEM((N, H, N), f32),   # ge staged row-major
            pltpu.VMEM((N, H, N), f32),   # ge^T staged row-major
            pltpu.VMEM((N, H, P), t2.dtype),   # staged g_t plane (row-major)
            pltpu.SemaphoreType.DMA(()),       # output DMA
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, g_out, t2, t3,
      jnp.pad(idx.reshape(B, N, 1, N), [(0, 0), (0, 0), (0, 0), (0, Nc - N)]),
      jnp.pad(idxT.reshape(B, N, 1, N), [(0, 0), (0, 0), (0, 0), (0, Nc - N)]),
      jnp.pad(node_mask.astype(jnp.int32).reshape(B, 1, N),
              [(0, 0), (0, 0), (0, Nc - N)]))
