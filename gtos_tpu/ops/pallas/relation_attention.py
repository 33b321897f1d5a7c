"""Pallas TPU kernel: fused relation-aware graph attention.

The measured bottleneck of the XLA bank path is the per-pair gather of the
relation score terms (take_along_axis lowers to ~8 ms per gather for
B=32, N=128, P=2048 on v5e, vs 0.6 ms for the q.k matmul). This kernel
keeps everything on-chip:

  * per-head t2/t3 table planes stream into VMEM double buffers (head h+1's
    DMA overlaps head h's compute) and the (i, j) -> bank-row lookup runs
    as Mosaic's in-register `dynamic_gather` lane shuffle, decomposed into
    P/128 chunk shuffles selected by the indices' high bits — no HBM
    gather traffic at all;
  * the t4 (relation-relation) term is pre-folded into the t2 table by the
    XLA matmul epilogue, so only two tables are consumed;
  * scores, masking, softmax and the attention*V aggregation are fused in
    VMEM — nothing of O(N^2) ever touches HBM.

Layouts (P is the relation-bank size, padded to a lane multiple):
  q, k, v   : [B, H, N, Dh]   bf16/f32 (Dh zero-padded to 128 lanes)
  t2        : [B, H, N, P]    t2[b,h,i,p] = q[b,h,i].b_bank[p,h] + t4[p,h]
  t3        : [B, H, N, P]    t3[b,h,j,p] = k[b,h,j].a_bank[p,h]
  idx, idxT : [B, N, N] int32 (idxT = idx transposed on the last two dims)
  node_mask : [B, N] bool

Reference math (jcyk/gtos RelationMultiheadAttention — SURVEY.md §3.4):
  e_ij = scale * (q_i + a_ij).(k_j + b_ij), softmax over j, out = attn @ v.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, t2_hbm, t3_hbm, idx_ref, idxT_ref,
            mask_ref, out_ref, tbl_buf, dma_sems, *, scale):
    """One program per batch element b.

    q/k/v_ref: [H, N, Dh] VMEM; t2/t3_hbm: [H, N, P] in HBM, per-head
    planes DMA'd into tbl_buf [2 tables, 2 slots, N, P] double buffers
    (head h+1 prefetched during head h); idx/idxT_ref: [N, N];
    mask_ref: [1, 1, N]; dma_sems: [2, 2]."""
    H, N, Dh = q_ref.shape
    P = tbl_buf.shape[-1]
    f32 = jnp.float32

    def dma(table_hbm, h, table_slot, buf_slot):
        return pltpu.make_async_copy(
            table_hbm.at[h],                       # [N, P] bf16 plane
            tbl_buf.at[table_slot, buf_slot],
            dma_sems.at[table_slot, buf_slot],
        )

    # index/mask blocks arrive lane-padded (minor dim a multiple of 128)
    mask_row = mask_ref[0, 0, :]
    mask_add = jnp.where(mask_row != 0, 0.0, NEG_INF).reshape(1, -1)[:, :N]

    def split_bits(indices):
        """(chunk id, lane-within-chunk) — computed ONCE, reused by every
        head's gathers (the indices are head-invariant)."""
        return indices >> 7, jnp.bitwise_and(indices, 127)

    hi, lo = split_bits(idx_ref[:, :])
    hiT, loT = split_bits(idxT_ref[:, :])

    def gather_wide(tbl_slot, buf_slot, hi, lo):
        """out[r, c] = table[r, indices[r, c]] for a [N, P] table.

        The TPU's dynamic_gather is a within-vreg lane shuffle (gather dim
        <= 128), so the P-wide lookup decomposes into P/128 chunk shuffles
        selected by the indices' high bits. hi/lo are precomputed once for
        all heads, so the per-chunk work is one widen, one shuffle, one
        compare, one select. (Mosaic's dynamic_gather requires index and
        data bitwidths to match, so the shuffle itself runs in f32.)"""
        out = jnp.zeros(hi.shape, f32)
        for c in range(P // 128):
            # slice the ref (not a loaded whole-plane value): only the
            # [N, 128] chunk is materialized in registers
            chunk = tbl_buf[tbl_slot, buf_slot, :, c * 128:(c + 1) * 128]
            part = jnp.take_along_axis(
                chunk.astype(f32), lo, axis=1, mode="promise_in_bounds")
            out = jnp.where(hi == c, part, out)
        return out[:, :N]

    dma(t2_hbm, 0, 0, 0).start()
    dma(t3_hbm, 0, 1, 0).start()

    for h in range(H):  # H is small and static: unrolled
        slot = h % 2
        if h + 1 < H:  # prefetch next head's table planes
            dma(t2_hbm, h + 1, 0, (h + 1) % 2).start()
            dma(t3_hbm, h + 1, 1, (h + 1) % 2).start()
        dma(t2_hbm, h, 0, slot).wait()
        dma(t3_hbm, h, 1, slot).wait()

        # e24[i, j] = t2[h, i, idx[i, j]]
        e24 = gather_wide(0, slot, hi, lo)
        # e3t[j, i] = t3[h, j, idx[i, j]]
        e3t = gather_wide(1, slot, hiT, loT)
        t1 = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
        e = (t1 + e24 + e3t.T) * scale + mask_add
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / s).astype(v_ref.dtype)
        out_ref[h] = jax.lax.dot_general(
            attn, v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def fused_relation_attention(q, k, v, t2, t3, idx, idxT, node_mask,
                             interpret: bool = False, scale: float = None):
    """Fused attention. Shapes as in the module docstring. Returns
    out [B, H, N, Dh] in v.dtype."""
    B, H, N, Dh = q.shape
    P = t2.shape[-1]
    if scale is None:
        scale = Dh ** -0.5  # true head dim, fixed before any padding
    # Mosaic requires lane-aligned (multiple-of-128) minor dims on sliced
    # VMEM refs; zero-pad Dh (zeros are inert through q.k and attn@v).
    Dh_pad = max(128, -(-Dh // 128) * 128)
    if Dh != Dh_pad:
        pad = [(0, 0)] * 3 + [(0, Dh_pad - Dh)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        out = fused_relation_attention(
            q, k, v, t2, t3, idx, idxT, node_mask, interpret=interpret,
            scale=scale)
        return out[..., :Dh]
    # lane-align the index/mask minor dims (see inline wrapper)
    Nc = -(-N // 128) * 128
    idx = jnp.pad(idx, [(0, 0), (0, 0), (0, Nc - N)])
    idxT = jnp.pad(idxT, [(0, 0), (0, 0), (0, Nc - N)])
    mask_p = jnp.pad(node_mask.astype(jnp.int32).reshape(B, 1, N),
                     [(0, 0), (0, 0), (0, Nc - N)])

    grid = (B,)
    qkv_spec = pl.BlockSpec((1, H, N, Dh), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # HBM-resident tables: full array, sliced by program id inside the kernel
    tbl_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    idx_spec = pl.BlockSpec((1, N, Nc), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nc), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_r, k_r, v_r, t2_r, t3_r, idx_r, idxT_r, mask_r, out_r,
               tbl_buf, sems):
        b = pl.program_id(0)
        _kernel(q_r.at[0], k_r.at[0], v_r.at[0], t2_r.at[b], t3_r.at[b],
                idx_r.at[0], idxT_r.at[0], mask_r, out_r.at[0],
                tbl_buf, sems, scale=scale)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, tbl_spec, tbl_spec,
                  idx_spec, idx_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, N, P), t2.dtype),   # per-head double buffers
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(q, k, v, t2, t3, idx, idxT, mask_p)


# ---------------------------------------------------------------------------
# Inline-table kernel: the score tables never exist in HBM.
#
# The table-based kernel above is bounded by the [B, H, N, P] tables' HBM
# round trip (~270 MB written by the XLA einsum + ~270 MB DMA'd back in, at
# bench shapes). But the tables are rank-deficient: every row is a product
# with the [P, H, Dh] banks (8 MB). This kernel keeps both banks resident
# in VMEM (constant-index blocks, fetched once for the whole grid) and
# computes each 128-row table chunk on the MXU right before gathering from
# it — the t2/t3 matmul FLOPs are ~90 us of MXU time against ~660 us of
# avoided HBM traffic. The t4 (relation-relation) term rides along free:
# the head-dim padding lane Dh carries 1.0 in q and t4[p, h] in b_bank, so
# the same matmul emits q.b + t4.
# ---------------------------------------------------------------------------


def _kernel_inline(q_ref, k_ref, v_ref, ab_ref, bb_ref, idx_ref, idxT_ref,
                   mask_ref, out_ref, *, scale):
    """One program per batch element. q/k/v_ref: [H, N, Dh_pad] VMEM;
    ab/bb_ref: [H, P, Dh_pad] VMEM (grid-resident); idx/idxT: [N, N]."""
    H, N, Dh = q_ref.shape
    P = ab_ref.shape[1]
    f32 = jnp.float32

    # the index/mask blocks arrive lane-padded ([N, Nc]/[1, 1, Nc] with Nc
    # a multiple of 128) — Mosaic requires 128-aligned minor dims on VMEM
    # blocks; the padded columns gather garbage that is sliced off below
    mask_row = mask_ref[0, 0, :]
    mask_add = jnp.where(mask_row != 0, 0.0, NEG_INF).reshape(1, -1)[:, :N]

    def split_bits(indices):
        return indices >> 7, jnp.bitwise_and(indices, 127)

    hi, lo = split_bits(idx_ref[:, :])
    hiT, loT = split_bits(idxT_ref[:, :])
    gshape = hi.shape

    for h in range(H):
        qh, kh = q_ref[h], k_ref[h]
        e24 = jnp.zeros(gshape, f32)
        e3t = jnp.zeros(gshape, f32)
        for c in range(P // 128):
            # 128-row table chunks, MXU-built from the resident banks:
            #   t2c[i, p] = q_i . b_bank[p] (+ t4[p] via the aug lane)
            #   t3c[j, p] = k_j . a_bank[p]
            bc = bb_ref[h, c * 128:(c + 1) * 128, :]
            ac = ab_ref[h, c * 128:(c + 1) * 128, :]
            t2c = jax.lax.dot_general(qh, bc, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=jax.lax.Precision.DEFAULT)
            t3c = jax.lax.dot_general(kh, ac, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=jax.lax.Precision.DEFAULT)
            e24 = jnp.where(hi == c, jnp.take_along_axis(
                t2c, lo, axis=1, mode="promise_in_bounds"), e24)
            e3t = jnp.where(hiT == c, jnp.take_along_axis(
                t3c, loT, axis=1, mode="promise_in_bounds"), e3t)
        e24 = e24[:N, :N]
        e3t = e3t[:N, :N]
        t1 = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32,
                                 precision=jax.lax.Precision.DEFAULT)
        e = (t1 + e24 + e3t.T) * scale + mask_add
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / s).astype(v_ref.dtype)
        out_ref[h] = jax.lax.dot_general(
            attn, v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def fused_relation_attention_inline(q, k, v, a_bank, b_bank, rel_index,
                                    key_mask, interpret: bool = False,
                                    scale: float = None):
    """Fused attention with in-kernel table build.

    q,k,v: [B,H,N,Dh]; a_bank/b_bank: [P,H,Dh]; rel_index: [B,N,N].
    Returns out [B,H,N,Dh] in v.dtype."""
    B, H, N, Dh = q.shape
    P = a_bank.shape[0]
    if scale is None:
        scale = Dh ** -0.5
    f32 = jnp.float32

    # pad head dim to lanes with one spare lane for the t4 fold; pad the
    # bank rows to a lane multiple (padded rows are never selected: real
    # indices are < P)
    Dh_pad = -(-(Dh + 1) // 128) * 128
    P_pad = -(-P // 128) * 128
    t4 = jnp.einsum("phd,phd->ph", a_bank.astype(f32), b_bank.astype(f32))

    qp = jnp.pad(q, [(0, 0)] * 3 + [(0, Dh_pad - Dh)])
    qp = qp.at[..., Dh].set(1.0)
    kp = jnp.pad(k, [(0, 0)] * 3 + [(0, Dh_pad - Dh)])
    vp = jnp.pad(v, [(0, 0)] * 3 + [(0, Dh_pad - Dh)])
    # banks -> [H, P_pad, Dh_pad], t4 folded into b's aug lane
    abT = jnp.pad(jnp.swapaxes(a_bank, 0, 1),
                  [(0, 0), (0, P_pad - P), (0, Dh_pad - Dh)])
    bbT = jnp.pad(jnp.swapaxes(b_bank, 0, 1),
                  [(0, 0), (0, P_pad - P), (0, Dh_pad - Dh)])
    bbT = bbT.at[:, :P, Dh].set(t4.T.astype(bbT.dtype))

    # lane-align the index/mask minor dims (Mosaic: VMEM block minor dims
    # must be multiples of 128); padded index columns gather garbage that
    # the kernel slices off
    Nc = -(-N // 128) * 128
    idxT = jnp.swapaxes(rel_index, 1, 2)
    idx_p = jnp.pad(rel_index, [(0, 0), (0, 0), (0, Nc - N)])
    idxT_p = jnp.pad(idxT, [(0, 0), (0, 0), (0, Nc - N)])
    mask_p = jnp.pad(key_mask.astype(jnp.int32).reshape(B, 1, N),
                     [(0, 0), (0, 0), (0, Nc - N)])

    grid = (B,)
    qkv_spec = pl.BlockSpec((1, H, N, Dh_pad), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # constant index map: fetched once, resident for the whole grid
    bank_spec = pl.BlockSpec((H, P_pad, Dh_pad), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, N, Nc), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nc), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_r, k_r, v_r, ab_r, bb_r, idx_r, idxT_r, mask_r, out_r):
        _kernel_inline(q_r.at[0], k_r.at[0], v_r.at[0], ab_r, bb_r,
                       idx_r.at[0], idxT_r.at[0], mask_r, out_r.at[0],
                       scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bank_spec, bank_spec,
                  idx_spec, idx_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh_pad), v.dtype),
        interpret=interpret,
    )(qp, kp, vp, abT, bbT, idx_p, idxT_p, mask_p)
    return out[..., :Dh]


# VMEM budget heuristic for the inline kernel: both banks + double-buffered
# q/k/v/out blocks + index blocks must fit in ~16 MB.
_VMEM_BUDGET = 13 * 1024 * 1024


def _inline_fits(q, a_bank):
    B, H, N, Dh = q.shape
    P = a_bank.shape[0]
    Dh_pad = -(-(Dh + 1) // 128) * 128
    P_pad = -(-P // 128) * 128
    itemsize = q.dtype.itemsize
    banks = 2 * H * P_pad * Dh_pad * itemsize
    blocks = 2 * (4 * H * N * Dh_pad * itemsize + 2 * N * N * 4 + N * 4)
    return banks + blocks <= _VMEM_BUDGET


def pallas_relation_attention(q, k, v, a_bank, b_bank, rel_index, key_mask,
                              *, interpret: bool = False):
    """Drop-in equivalent of ops.attention.bank_relation_attention (output
    only; attention probs are not materialized — the fusion's point).

    q,k,v: [B,H,N,Dh]; a_bank/b_bank: [P,H,Dh]; rel_index: [B,N,N].
    Dispatches to the inline-table kernel when the banks fit in VMEM,
    else to the HBM-table streaming kernel."""
    if _inline_fits(q, a_bank):
        out = fused_relation_attention_inline(
            q, k, v, a_bank, b_bank, rel_index, key_mask,
            interpret=interpret)
        return out, None
    t2, t3 = _build_tables(q, k, a_bank, b_bank)
    idxT = jnp.swapaxes(rel_index, 1, 2)
    out = fused_relation_attention(
        q, k, v, t2, t3, rel_index, idxT, key_mask, interpret=interpret)
    return out, None


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward AND Pallas backward.
#
# The backward kernel (relation_attention_bwd.py) recomputes attention
# on-chip and turns the gather's transpose into one-hot MXU matmuls
# (Mosaic has no vector scatter); the cheap table->parameter contractions
# run in XLA below. Measured at bench shapes the XLA VJP costs ~91 ms;
# the kernel path is ~25x faster.
# ---------------------------------------------------------------------------

import numpy as _np


def _build_tables(q, k, a_bank, b_bank):
    """The kernel's [B, H, N, P] score tables, t4 folded into t2."""
    f32 = jnp.float32
    t4 = jnp.einsum("phd,phd->ph", a_bank.astype(f32), b_bank.astype(f32))
    t2 = (jnp.einsum("bhid,phd->bhip", q, b_bank,
                     preferred_element_type=f32)
          + t4.T[None, :, None]).astype(q.dtype)
    t3 = jnp.einsum("bhjd,phd->bhjp", k, a_bank,
                    preferred_element_type=f32).astype(q.dtype)
    return t2, t3


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rel_attn_vjp(interpret, q, k, v, a_bank, b_bank, rel_index, key_mask):
    out, _ = pallas_relation_attention(
        q, k, v, a_bank, b_bank, rel_index, key_mask, interpret=interpret)
    return out


def _rel_attn_fwd(interpret, q, k, v, a_bank, b_bank, rel_index, key_mask):
    out = _rel_attn_vjp(interpret, q, k, v, a_bank, b_bank, rel_index,
                        key_mask)
    return out, (q, k, v, a_bank, b_bank, rel_index, key_mask)


def _rel_attn_bwd(interpret, res, g):
    from gtos_tpu.ops.pallas.relation_attention_bwd import (
        fused_relation_attention_bwd)

    q, k, v, a_bank, b_bank, rel_index, key_mask = res
    t2, t3 = _build_tables(q, k, a_bank, b_bank)
    idxT = jnp.swapaxes(rel_index, 1, 2)
    gq1, gk1, gv, g_t2, g_t3 = fused_relation_attention_bwd(
        q, k, v, g, t2, t3, rel_index, idxT, key_mask, interpret=interpret)

    f32 = jnp.float32
    # t2 = q . b_bank + t4;  t3 = k . a_bank;  t4 = sum_d a_bank * b_bank
    # (table grads come back row-major: [B, N, H, P])
    gq = gq1 + jnp.einsum("bihp,phd->bhid", g_t2.astype(f32),
                          b_bank.astype(f32))
    gk = gk1 + jnp.einsum("bjhp,phd->bhjd", g_t3.astype(f32),
                          a_bank.astype(f32))
    g_b_bank = jnp.einsum("bihp,bhid->phd", g_t2.astype(f32),
                          q.astype(f32))
    g_a_bank = jnp.einsum("bjhp,bhjd->phd", g_t3.astype(f32),
                          k.astype(f32))
    g_t4 = jnp.sum(g_t2.astype(f32), axis=(0, 1)).T          # [P, H]
    g_a_bank = g_a_bank + g_t4[:, :, None] * b_bank.astype(f32)
    g_b_bank = g_b_bank + g_t4[:, :, None] * a_bank.astype(f32)

    zero_idx = _np.zeros(rel_index.shape, jax.dtypes.float0)
    zero_mask = _np.zeros(key_mask.shape, jax.dtypes.float0)
    return (gq.astype(q.dtype), gk.astype(k.dtype), gv.astype(v.dtype),
            g_a_bank.astype(a_bank.dtype), g_b_bank.astype(b_bank.dtype),
            zero_idx, zero_mask)


_rel_attn_vjp.defvjp(_rel_attn_fwd, _rel_attn_bwd)


def relation_attention_trainable(q, k, v, a_bank, b_bank, rel_index,
                                 key_mask, *, interpret: bool = False):
    """Differentiable fused relation attention (see module docstring)."""
    return _rel_attn_vjp(interpret, q, k, v, a_bank, b_bank, rel_index,
                         key_mask)
