"""Pallas TPU backward for block-sparse relation attention.

XLA's VJP of the O(E) segment pipeline serializes the per-edge
gathers/scatters (the same pathology the forward kernel removes), so the
backward runs on-chip too, as the flash-attention two-pass schedule over
the SAME nonempty (dst-tile, src-tile) block set as the forward:

  pass 1 (dst-major, the forward's grid): per block, recompute the scores
    from the saved softmax stats (m, l), form the score gradient
    ge = p * (dO.V^T - delta) * scale, and accumulate
      dQ   += ge @ K_src            (content term)
      dQ   += GT2 @ b_bank          (relation term, via the scatter below)
      g_bb += GT2^T @ Q_dst
    where GT2[i, p] = sum_j ge_ij [rel_ij == p] is the pair->bank
    scatter-transpose, built per dst row as a one-hot matmul on the MXU
    (Mosaic has no vector scatter — see relation_attention_bwd.py, whose
    phase B/C this generalizes to the block-sparse layout);

  pass 2 (src-major, the flash "column" pass): walks the TRANSPOSED block
    list (tile_dst / tile_rel_src from ops.block_sparse
    pack_block_sparse_src), with the dst tile's q/dO/m/l/delta fetched by
    scalar-prefetched index, and accumulates per src tile
      dV   += p^T @ dO
      dK   += ge^T @ Q_dst + GT3 @ a_bank
      g_ab += GT3^T @ K_src
    with GT3[j, p] = sum_i ge_ij [rel_ij == p] scattered per src row.

Bank-gradient accumulators live in VMEM scratch-like output blocks whose
index map is constant, so they persist across the whole sequential grid
and are written back once. The t4 = a.b fold rides the same augmented
head-dim lane as the forward: g_bb's augmented lane accumulates
d t4[p] = sum ge [rel == p] (because q's augmented lane is 1), which the
XLA epilogue redistributes as d a += d_t4 * b, d b += d_t4 * a.

Work and HBM traffic are O(nonempty_blocks * T^2) like the forward —
empty tiles are never visited in either pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtos_tpu.ops.pallas.block_sparse_attention import NEG_INF, T


def _scatter_rows(ge_sc, rel_sc, gt_sc, *, n_chunks, H, dt):
    """gt_sc[r, h, p] = sum_j ge_sc[r, h, j] [rel_sc[r, j] == p].

    The pair->bank scatter as per-row one-hot MXU matmuls: each j lands in
    exactly one 128-lane chunk (hi = rel >> 7), so the one-hot only needs
    the within-chunk lane, and all chunks x heads stack into ONE
    [C*H, T] @ [T, 128] matmul per row."""
    f32 = jnp.float32
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)

    def body(r, _):
        idx_row = rel_sc[r]                              # [1, T]
        lo = jnp.bitwise_and(idx_row, 127).reshape(T, 1)
        hi = idx_row >> 7                                # [1, T]
        oh = (iota_lane == jnp.broadcast_to(lo, (T, 128))).astype(dt)
        g_r = ge_sc[r]                                   # [H, T]
        gm = jnp.concatenate(
            [jnp.where(hi == c, g_r, 0.0) for c in range(n_chunks)],
            axis=0).astype(dt)                           # [C*H, T]
        gt_r = jax.lax.dot_general(
            gm, oh, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        for c in range(n_chunks):
            gt_sc[r, :, c * 128:(c + 1) * 128] = gt_r[c * H:(c + 1) * H]
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _dot(a, b, dims, dt):
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (dims, ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_dst_kernel(tile_src_ref, q_ref, k_ref, v_ref, g_ref, m_ref, l_ref,
                    dl_ref, ab_ref, bb_ref, rel_ref, dq_ref, gbb_ref,
                    ge_sc, rel_sc, gt_sc, *, scale, smax):
    """Pass 1. Grid (B, Td, Smax); q/g/m/l/delta = dst tile, k/v = the
    prefetch-indexed src tile. dq accumulates per dst tile; gbb (augmented
    bank layout [H, P_pad, Dh_pad]) accumulates across the whole grid."""
    b, td, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    H, Pp, Dhp = ab_ref.shape
    f32 = jnp.float32
    dt = q_ref.dtype
    n_chunks = Pp // 128

    @pl.when(s == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when((b == 0) & (td == 0) & (s == 0))
    def _():
        gbb_ref[...] = jnp.zeros_like(gbb_ref)

    src_id = tile_src_ref[b, td, s]

    @pl.when(src_id >= 0)
    def _():
        rel = rel_ref[0, 0, 0]                           # [T, T]
        pair_ok = rel >= 0
        relc = jnp.where(pair_ok, rel, 0)
        hi, lo = relc >> 7, jnp.bitwise_and(relc, 127)
        hiT, loT = hi.T, lo.T
        mask_add = jnp.where(pair_ok, 0.0, NEG_INF)
        rel_sc[...] = relc[:, None, :]

        for h in range(H):
            qh, kh, vh, gh = q_ref[0, h], k_ref[0, h], v_ref[0, h], g_ref[0, h]
            e2 = jnp.zeros((T, T), f32)
            e3t = jnp.zeros((T, T), f32)
            for c in range(n_chunks):
                bc = bb_ref[h, c * 128:(c + 1) * 128, :]
                ac = ab_ref[h, c * 128:(c + 1) * 128, :]
                t2c = _dot(qh, bc, (((1,), (1,))), dt)
                t3c = _dot(kh, ac, (((1,), (1,))), dt)
                e2 = jnp.where(hi == c, jnp.take_along_axis(
                    t2c, lo, axis=1, mode="promise_in_bounds"), e2)
                e3t = jnp.where(hiT == c, jnp.take_along_axis(
                    t3c, loT, axis=1, mode="promise_in_bounds"), e3t)
            t1 = _dot(qh, kh, (((1,), (1,))), dt)
            e = (t1 + e2 + e3t.T) * scale + mask_add

            m_col = m_ref[0, 0, h].reshape(T, 1)         # lanes -> rows
            l_col = l_ref[0, 0, h].reshape(T, 1)
            d_col = dl_ref[0, 0, h].reshape(T, 1)
            l_safe = jnp.where(l_col > 0, l_col, 1.0)
            p = jnp.where(pair_ok, jnp.exp(e - m_col), 0.0) / l_safe
            dp = _dot(gh, vh, (((1,), (1,))), dt)        # [T, T] dO_i . v_j
            ge = p * (dp - d_col) * scale
            dq_ref[0, h] += _dot(ge, kh, (((1,), (0,))), dt)
            ge_sc[:, h, :] = ge

        _scatter_rows(ge_sc, rel_sc, gt_sc, n_chunks=n_chunks, H=H, dt=dt)
        for h in range(H):
            gt2 = gt_sc[:, h, :]                         # [T, Pp] f32
            dq_ref[0, h] += _dot(gt2, bb_ref[h], (((1,), (0,))), dt)
            gbb_ref[h] += _dot(gt2, q_ref[0, h], (((0,), (0,))), dt)


def _bwd_src_kernel(tile_dst_ref, k_ref, v_ref, q_ref, g_ref, m_ref, l_ref,
                    dl_ref, ab_ref, bb_ref, relT_ref, dk_ref, dv_ref,
                    gab_ref, ge_sc, rel_sc, gt_sc, *, scale, smax):
    """Pass 2. Grid (B, Ts, Smax_s); k/v = src tile (this program's home),
    q/g/m/l/delta = the prefetch-indexed dst tile; relT = the transposed
    relation block ([src-local j, dst-local i])."""
    b, ts, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    H, Pp, Dhp = ab_ref.shape
    f32 = jnp.float32
    dt = q_ref.dtype
    n_chunks = Pp // 128

    @pl.when(s == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((b == 0) & (ts == 0) & (s == 0))
    def _():
        gab_ref[...] = jnp.zeros_like(gab_ref)

    dst_id = tile_dst_ref[b, ts, s]

    @pl.when(dst_id >= 0)
    def _():
        relT = relT_ref[0, 0, 0]                         # [T_j, T_i]
        pair_okT = relT >= 0
        relcT = jnp.where(pair_okT, relT, 0)
        hiT, loT = relcT >> 7, jnp.bitwise_and(relcT, 127)  # j-row oriented
        hi, lo = hiT.T, loT.T                               # i-row oriented
        mask_addT = jnp.where(pair_okT, 0.0, NEG_INF)
        rel_sc[...] = relcT[:, None, :]

        for h in range(H):
            kh, vh, qd, gd = k_ref[0, h], v_ref[0, h], q_ref[0, h], g_ref[0, h]
            e2 = jnp.zeros((T, T), f32)                  # [T_i, T_j]
            e3t = jnp.zeros((T, T), f32)                 # [T_j, T_i]
            for c in range(n_chunks):
                bc = bb_ref[h, c * 128:(c + 1) * 128, :]
                ac = ab_ref[h, c * 128:(c + 1) * 128, :]
                t2c = _dot(qd, bc, (((1,), (1,))), dt)
                t3c = _dot(kh, ac, (((1,), (1,))), dt)
                e2 = jnp.where(hi == c, jnp.take_along_axis(
                    t2c, lo, axis=1, mode="promise_in_bounds"), e2)
                e3t = jnp.where(hiT == c, jnp.take_along_axis(
                    t3c, loT, axis=1, mode="promise_in_bounds"), e3t)
            t1T = _dot(kh, qd, (((1,), (1,))), dt)       # [T_j, T_i]
            eT = (t1T + e2.T + e3t) * scale + mask_addT

            m_row = m_ref[0, 0, h].reshape(1, T)         # per dst node i
            l_row = l_ref[0, 0, h].reshape(1, T)
            d_row = dl_ref[0, 0, h].reshape(1, T)
            l_safe = jnp.where(l_row > 0, l_row, 1.0)
            pT = jnp.where(pair_okT, jnp.exp(eT - m_row), 0.0) / l_safe
            dpT = _dot(vh, gd, (((1,), (1,))), dt)       # [T_j, T_i]
            geT = pT * (dpT - d_row) * scale
            dv_ref[0, h] += _dot(pT, gd, (((1,), (0,))), dt)
            dk_ref[0, h] += _dot(geT, qd, (((1,), (0,))), dt)
            ge_sc[:, h, :] = geT

        _scatter_rows(ge_sc, rel_sc, gt_sc, n_chunks=n_chunks, H=H, dt=dt)
        for h in range(H):
            gt3 = gt_sc[:, h, :]                         # [T, Pp] f32
            dk_ref[0, h] += _dot(gt3, ab_ref[h], (((1,), (0,))), dt)
            gab_ref[h] += _dot(gt3, k_ref[0, h], (((0,), (0,))), dt)


def prep_bwd_invariants(q, g, out, a_bank, b_bank, Td):
    """Everything in the backward that does NOT depend on (k, v, tiles):
    padded q/g, the compact delta = sum(g*out), and the
    transposed/padded/t4-augmented banks.

    Callers that run the tile backward repeatedly against rotating (k, v)
    and per-step tile layouts (the fused ring backward,
    parallel/ring_block_sparse.py) hoist this out of the ring loop — the
    bank re-pack alone is ~P_pad*H*Dh_pad*2 banks of HBM traffic per call
    (ADVICE r4)."""
    B, H, N, Dh = q.shape
    f32 = jnp.float32
    dt = q.dtype
    N_pad = Td * T
    Dh_pad = -(-(Dh + 1) // 128) * 128
    P = a_bank.shape[0]
    P_pad = -(-P // 128) * 128
    t4 = jnp.einsum("phd,phd->ph", a_bank.astype(f32), b_bank.astype(f32))
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, N_pad - N), (0, Dh_pad - Dh)])
    qp = qp.at[..., Dh].set(1.0)
    abT = jnp.pad(jnp.swapaxes(a_bank, 0, 1),
                  [(0, 0), (0, P_pad - P), (0, Dh_pad - Dh)])
    bbT = jnp.pad(jnp.swapaxes(b_bank, 0, 1),
                  [(0, 0), (0, P_pad - P), (0, Dh_pad - Dh)])
    bbT = bbT.at[:, :P, Dh].set(t4.T.astype(bbT.dtype))
    gp = jnp.pad(g.astype(dt),
                 [(0, 0), (0, 0), (0, N_pad - N), (0, Dh_pad - Dh)])
    delta = jnp.sum(g.astype(f32) * out.astype(f32), axis=-1)   # [B,H,N]
    delta = jnp.pad(delta, [(0, 0), (0, 0), (0, N_pad - N)])
    # compact stat layout: [B, Td, H, 128] (tile rows on lanes, heads on
    # sublanes — Td rides dim 1 so blocks keep legal 8/128 tails)
    delta = delta.reshape(B, H, Td, T).transpose(0, 2, 1, 3)
    return qp, gp, delta, abT, bbT


def pad_kv(k, v, Dh_pad, N_pad):
    """Per-step padding of the (rotating) k/v block to the kernel layout."""
    N, Dh = k.shape[2], k.shape[3]
    pad = [(0, 0), (0, 0), (0, N_pad - N), (0, Dh_pad - Dh)]
    return jnp.pad(k, pad), jnp.pad(v, pad)


def finish_bank_grads(gabT, gbbT, a_bank, b_bank):
    """Un-transpose the accumulated bank grads and redistribute the
    augmented t4 lane: d a += d_t4 * b, d b += d_t4 * a. Run ONCE after
    summing raw grads over ring steps."""
    f32 = jnp.float32
    P = a_bank.shape[0]
    Dh = a_bank.shape[2]
    dt4 = jnp.swapaxes(gbbT[:, :P, Dh], 0, 1)            # [P, H]
    g_bb = (jnp.swapaxes(gbbT[:, :P, :Dh], 0, 1)
            + dt4[..., None] * a_bank.astype(f32))
    g_ab = (jnp.swapaxes(gabT[:, :P, :Dh], 0, 1)
            + dt4[..., None] * b_bank.astype(f32))
    return g_ab.astype(a_bank.dtype), g_bb.astype(b_bank.dtype)


def block_sparse_attention_bwd_raw(qp, kp, vp, gp, m, l, delta, abT, bbT,
                                   tile_src, tile_rel, tile_dst,
                                   tile_rel_src, *, scale,
                                   interpret: bool = False):
    """The two Pallas passes on prepped/padded inputs.

    Returns PADDED raw grads (dqp, dkp, dvp [B,H,N_pad,Dh_pad] f32,
    gabT, gbbT [H,P_pad,Dh_pad] f32) — the caller slices/finishes (see
    finish_bank_grads), which lets repeated callers defer the epilogue."""
    B, H, N_pad, Dh_pad = qp.shape
    f32 = jnp.float32
    Td, Smax_d = tile_src.shape[1], tile_src.shape[2]
    Ts, Smax_s = tile_dst.shape[1], tile_dst.shape[2]
    P_pad = abT.shape[1]

    node_spec = lambda imap: pl.BlockSpec(  # noqa: E731
        (1, H, T, Dh_pad), imap, memory_space=pltpu.VMEM)
    stat_spec = lambda imap: pl.BlockSpec(  # noqa: E731
        (1, 1, H, 128), imap, memory_space=pltpu.VMEM)
    bank_spec = pl.BlockSpec((H, P_pad, Dh_pad), lambda b, t, s, pr: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    rel_spec = pl.BlockSpec((1, 1, 1, T, T), lambda b, t, s, pr: (b, t, s, 0, 0),
                            memory_space=pltpu.VMEM)
    gbank_spec = pl.BlockSpec((H, P_pad, Dh_pad), lambda b, t, s, pr: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((T, H, T), f32),      # ge staged row-major
        pltpu.VMEM((T, 1, T), jnp.int32),  # rel rows for the scatter loop
        pltpu.VMEM((T, H, P_pad), f32),  # GT2/GT3 staging
    ]
    here = lambda b, t, s, pr: (b, 0, t, 0)             # noqa: E731
    here_s = lambda b, t, s, pr: (b, t, 0, 0)           # noqa: E731

    # ---- pass 1: dst-major (dq, g_bb) ----
    def far1(b, t, s, pr):
        return (b, 0, pr[b, t, s], 0)

    dqp, gbbT = pl.pallas_call(
        functools.partial(_bwd_dst_kernel, scale=scale, smax=Smax_d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Td, Smax_d),
            in_specs=[node_spec(here), node_spec(far1), node_spec(far1),
                      node_spec(here), stat_spec(here_s), stat_spec(here_s),
                      stat_spec(here_s), bank_spec, bank_spec, rel_spec],
            out_specs=[node_spec(here), gbank_spec],
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N_pad, Dh_pad), f32),
            jax.ShapeDtypeStruct((H, P_pad, Dh_pad), f32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.maximum(tile_src, 0), qp, kp, vp, gp, m, l, delta, abT, bbT,
      tile_rel)

    # ---- pass 2: src-major (dk, dv, g_ab) ----
    def far2(b, t, s, pr):
        return (b, 0, pr[b, t, s], 0)

    def far2_s(b, t, s, pr):
        return (b, pr[b, t, s], 0, 0)

    dkp, dvp, gabT = pl.pallas_call(
        functools.partial(_bwd_src_kernel, scale=scale, smax=Smax_s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Ts, Smax_s),
            in_specs=[node_spec(here), node_spec(here), node_spec(far2),
                      node_spec(far2), stat_spec(far2_s), stat_spec(far2_s),
                      stat_spec(far2_s), bank_spec, bank_spec, rel_spec],
            out_specs=[node_spec(here), node_spec(here), gbank_spec],
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N_pad, Dh_pad), f32),
            jax.ShapeDtypeStruct((B, H, N_pad, Dh_pad), f32),
            jax.ShapeDtypeStruct((H, P_pad, Dh_pad), f32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.maximum(tile_dst, 0), kp, vp, qp, gp, m, l, delta, abT, bbT,
      tile_rel_src)

    return dqp, dkp, dvp, gabT, gbbT


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def block_sparse_attention_bwd(q, k, v, a_bank, b_bank, tile_src, tile_rel,
                               tile_dst, tile_rel_src, out, m, l, g,
                               interpret: bool = False, scale: float = None):
    """-> (dq, dk, dv [B,H,N,Dh] in input dtypes, g_ab, g_bb [P,H,Dh] f32).

    out: the forward's output [B,H,N,Dh]; m, l: the forward's softmax stats
    ([B,Td,H,128] compact node-per-lane layout from with_stats=True);
    g: cotangent [B,H,N,Dh] f32."""
    B, H, N, Dh = q.shape
    if scale is None:
        scale = Dh ** -0.5
    Td = tile_src.shape[1]
    N_pad = Td * T
    Dh_pad = -(-(Dh + 1) // 128) * 128

    qp, gp, delta, abT, bbT = prep_bwd_invariants(q, g, out, a_bank, b_bank,
                                                  Td)
    kp, vp = pad_kv(k, v, Dh_pad, N_pad)
    dqp, dkp, dvp, gabT, gbbT = block_sparse_attention_bwd_raw(
        qp, kp, vp, gp, m, l, delta, abT, bbT, tile_src, tile_rel,
        tile_dst, tile_rel_src, scale=scale, interpret=interpret)
    dq = dqp[:, :, :N, :Dh].astype(q.dtype)
    dk = dkp[:, :, :N, :Dh].astype(k.dtype)
    dv = dvp[:, :, :N, :Dh].astype(v.dtype)
    g_ab, g_bb = finish_bank_grads(gabT, gbbT, a_bank, b_bank)
    return dq, dk, dv, g_ab, g_bb
