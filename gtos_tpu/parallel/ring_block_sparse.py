"""Ring context-parallel BLOCK-SPARSE relation attention — the composed
flagship path (VERDICT r2 next #2; fused backward VERDICT r3 next #2).

Round 2 shipped the two halves separately: a ppermute ring whose per-step
compute was the XLA segment path (parallel/ring_attention.py), and a fast
single-device Pallas tile kernel (ops/pallas/block_sparse_attention.py).
This module runs the TILE KERNEL as the per-ring-step compute:

  * node features q/k/v are sharded into contiguous blocks over the mesh's
    'graph' axis; k/v blocks rotate via jax.lax.ppermute, issued BEFORE the
    step's compute so XLA overlaps the collective with the local tiles;
  * the host packs kept pairs per (dst-block, src-block) CELL with
    block-local tile ids (ops.block_sparse.pack_block_sparse_cells), so at
    ring step t each device hands cell (local, j) straight to the
    single-device kernel — scalar-prefetched src tiles, dense MXU blocks,
    flash softmax, empty blocks skipped;
  * per-step (out, m, l) streamed-softmax partials are merged
    flash-attention-style across steps, which is exact.

Backward (fused, the default when the src-major cell layout ctile_dst /
ctile_rel_src from pack_block_sparse_cells_src is in the batch): a REVERSE
accumulation ring. The forward saves its merged softmax stats (m, l) and
normalized output; the backward rotates (k, v, dk, dv) together — at each
step a device recomputes cell (local_dst, held_src) scores from the GLOBAL
stats (the flash decomposition makes per-cell probabilities exact) and runs
the two-pass Pallas tile backward (ops/pallas/block_sparse_attention_bwd)
on that cell: dq and the b-bank grad accumulate locally (dst-major pass),
dk/dv of the HELD block accumulate into the rotating buffers (src-major
pass), and one final ppermute delivers each block's dk/dv home. Bank grads
are psum-reduced over the graph (and data) axes. Work stays
O(nonempty_blocks * T^2) per device per pass — the XLA segment VJP this
replaces was the dominant cost of training the composed flagship
(sparse_roofline.json: 17x slower than the tile kernels).

Fallback (no src-major layout, e.g. pre-r4 batches): a custom VJP that
differentiates the edge-cell XLA ring (parallel/ring_attention.py) on the
same kept-pair set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def _ring_body(q, k, v, a_bank, b_bank, ctile_src, ctile_rel, *,
               axis_name: str, n_shards: int, scale, interpret: bool,
               with_stats: bool = False):
    """Per-device body under shard_map.

    q, k, v: [B, H, Nl, D] (this device's node block); ctile_src:
    [B, 1, S, Tdl, Smax_c]; ctile_rel: [B, 1, S, Tdl, Smax_c, T, T]
    (this device's dst-block row of cells, block-local tile ids).
    with_stats additionally returns the merged softmax stats
    (m, l) [B, H, Nl, 1] f32 for the fused ring backward."""
    from gtos_tpu.ops.pallas.block_sparse_attention import (
        block_sparse_relation_attention,
    )

    B, H, Nl, D = q.shape
    S = n_shards
    s = jax.lax.axis_index(axis_name)
    ctile_src = ctile_src[:, 0]                    # [B, S, Tdl, Smax_c]
    ctile_rel = ctile_rel[:, 0]
    f32 = jnp.float32
    perm = [(i, (i + 1) % S) for i in range(S)]

    m = jnp.full((B, H, Nl, 1), NEG_INF, f32)      # running max
    l = jnp.zeros((B, H, Nl, 1), f32)              # running denominator
    o = jnp.zeros((B, H, Nl, D), f32)              # running numerator

    k_buf, v_buf = k, v
    for t in range(S):
        # kick off the next boundary exchange BEFORE this step's compute
        # so XLA overlaps the collective-permute with the local tiles
        if t < S - 1:
            k_nxt = jax.lax.ppermute(k_buf, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_buf, axis_name, perm)

        # the block currently held arrived from device (s - t) mod S
        j = (s - t) % S
        cell_src = jax.lax.dynamic_index_in_dim(
            ctile_src, j, axis=1, keepdims=False)   # [B, Tdl, Smax_c]
        cell_rel = jax.lax.dynamic_index_in_dim(
            ctile_rel, j, axis=1, keepdims=False)   # [B, Tdl, Smax_c, T, T]
        out_t, m_t, l_t = block_sparse_relation_attention(
            q, k_buf, v_buf, a_bank, b_bank, cell_src, cell_rel,
            interpret=interpret, scale=scale, with_stats=True)
        # stats arrive in the compact [B, Tdl, H, 128] layout (tile rows
        # on lanes, heads on sublanes); recover one value per dst node
        m_t = m_t.transpose(0, 2, 1, 3).reshape(B, H, -1, 1)[:, :, :Nl]
        l_t = l_t.transpose(0, 2, 1, 3).reshape(B, H, -1, 1)[:, :, :Nl]

        # exact flash merge of this step's partial softmax
        new_m = jnp.maximum(m, m_t)
        alpha = jnp.exp(m - new_m)
        beta = jnp.where(l_t > 0, jnp.exp(m_t - new_m), 0.0)
        l = l * alpha + l_t * beta
        # out_t is normalized by l_t; un-normalize before merging
        o = o * alpha + out_t.astype(f32) * (l_t * beta)
        m = new_m

        if t < S - 1:
            k_buf, v_buf = k_nxt, v_nxt

    has_in = l > 0
    safe = jnp.where(has_in, l, 1.0)
    out = jnp.where(has_in, o / safe, 0.0)
    if with_stats:
        return out, m, l
    return out


def _cp_specs(mesh, axis_name):
    data_ax = "data" if "data" in mesh.shape else None
    node_sp = P(data_ax, None, axis_name, None)
    cell_sp = P(data_ax, axis_name, None, None, None)
    rel_sp = P(data_ax, axis_name, None, None, None, None, None)
    return data_ax, node_sp, cell_sp, rel_sp


def _pallas_ring_fwd(mesh, axis_name, interpret, scale, q, k, v, a_bank,
                     b_bank, ctile_src, ctile_rel, with_stats=False):
    S = mesh.shape[axis_name]
    body = functools.partial(_ring_body, axis_name=axis_name, n_shards=S,
                             scale=scale, interpret=interpret,
                             with_stats=with_stats)
    # FULL-manual shard_map (all mesh axes) with check_vma=False:
    # pallas_call does not yet carry varying-mesh-axes metadata, which
    # rules out both vma checking and partial-auto mode here. Consequence:
    # inputs are replicated over 'model' at entry (under TP, GSPMD
    # all-gathers the head shards first) — the XLA ring keeps heads
    # sharded; revisit when pallas_call supports vma.
    _, node_sp, cell_sp, rel_sp = _cp_specs(mesh, axis_name)
    rep = P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(node_sp, node_sp, node_sp, rep, rep, cell_sp, rel_sp),
        out_specs=((node_sp, node_sp, node_sp) if with_stats else node_sp),
        check_vma=False,
    )(q, k, v, a_bank, b_bank, ctile_src, ctile_rel)


# ---------------------------------------------------------------------------
# Fused path: Pallas tile kernels in BOTH directions (default for training
# batches, which carry the src-major cell layout).
# ---------------------------------------------------------------------------


def _ring_bwd_body(q, k, v, g, out, m, l, a_bank, b_bank, ctile_src,
                   ctile_rel, ctile_dst, ctile_rel_src, *, axis_name: str,
                   n_shards: int, scale, interpret: bool,
                   data_axis=None):
    """Reverse accumulation ring (one device's view).

    q/g/out/m/l: this device's dst block; k/v: its home src block. The
    (k, v, dk, dv) quartet rotates together: at step t the device holds
    block j = (s - t) mod S and adds cell (s, j)'s dk/dv contribution to
    the rotating accumulators; a final ppermute delivers each block's
    grads home. Global (m, l) make the per-cell probabilities exact, and
    delta = sum(g * out) is local to the dst block, so no recompute of
    other cells is ever needed. Everything that does not depend on the
    rotating (k, v) and the per-step cell — padded q/g, delta, the
    packed+t4-augmented banks, the bank-grad epilogue — is hoisted out of
    the ring loop (ADVICE r4: the bank re-pack alone is S-fold redundant
    HBM traffic on the critical path between dk/dv rotations)."""
    from gtos_tpu.ops.pallas.block_sparse_attention import T as _T
    from gtos_tpu.ops.pallas.block_sparse_attention_bwd import (
        block_sparse_attention_bwd_raw, finish_bank_grads, pad_kv,
        prep_bwd_invariants,
    )

    B, H, Nl, D = q.shape
    S = n_shards
    s = jax.lax.axis_index(axis_name)
    f32 = jnp.float32
    perm = [(i, (i + 1) % S) for i in range(S)]
    ctile_src = ctile_src[:, 0]
    ctile_rel = ctile_rel[:, 0]
    ctile_dst = ctile_dst[:, 0]
    ctile_rel_src = ctile_rel_src[:, 0]
    # compact node-per-lane stat layout the tile backward consumes
    # ([B, Tdl, H, 128]: tile rows on lanes, heads on sublanes)
    m_c = m.reshape(B, H, -1, 128).transpose(0, 2, 1, 3)
    l_c = l.reshape(B, H, -1, 128).transpose(0, 2, 1, 3)
    g32 = g.astype(f32)

    Tdl = -(-Nl // _T)
    N_pad = Tdl * _T
    Dh_pad = -(-(D + 1) // 128) * 128
    qp, gp, delta, abT, bbT = prep_bwd_invariants(
        q, g32, out, a_bank, b_bank, Tdl)

    dqp = jnp.zeros((B, H, N_pad, Dh_pad), f32)
    gabT = jnp.zeros(abT.shape, f32)
    gbbT = jnp.zeros(bbT.shape, f32)
    k_buf, v_buf = k, v
    dk_buf = jnp.zeros((B, H, Nl, D), f32)
    dv_buf = jnp.zeros((B, H, Nl, D), f32)

    for t in range(S):
        # k/v are read-only: their exchange is pre-issued so XLA overlaps
        # it with this step's tiles. The dk/dv ACCUMULATORS must rotate
        # AFTER this step's contribution lands in them.
        if t < S - 1:
            k_nxt = jax.lax.ppermute(k_buf, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_buf, axis_name, perm)

        j = (s - t) % S
        cell = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
            a, j, axis=1, keepdims=False)
        kp_t, vp_t = pad_kv(k_buf, v_buf, Dh_pad, N_pad)
        dq_t, dk_t, dv_t, gab_t, gbb_t = block_sparse_attention_bwd_raw(
            qp, kp_t, vp_t, gp, m_c, l_c, delta, abT, bbT,
            cell(ctile_src), cell(ctile_rel),
            cell(ctile_dst), cell(ctile_rel_src),
            interpret=interpret, scale=scale)
        dqp += dq_t
        gabT += gab_t
        gbbT += gbb_t
        # un-pad before accumulating so the rotating buffers (and their
        # ppermutes) stay at Dh, not Dh_pad (half the ICI bytes at Dh=64)
        dk_buf += dk_t[:, :, :Nl, :D]
        dv_buf += dv_t[:, :, :Nl, :D]

        if t < S - 1:
            k_buf, v_buf = k_nxt, v_nxt
            dk_buf = jax.lax.ppermute(dk_buf, axis_name, perm)
            dv_buf = jax.lax.ppermute(dv_buf, axis_name, perm)

    if S > 1:
        # the buffers currently hold block (s+1) mod S; one more rotation
        # lands every block's gradient on its home device
        dk_buf = jax.lax.ppermute(dk_buf, axis_name, perm)
        dv_buf = jax.lax.ppermute(dv_buf, axis_name, perm)
    dq = dqp[:, :, :Nl, :D]
    gab, gbb = finish_bank_grads(gabT, gbbT, a_bank, b_bank)
    gab = gab.astype(f32)
    gbb = gbb.astype(f32)

    # bank grads: every (data shard, ring device) contributes a partial of
    # the SAME replicated banks; 'model'-axis devices compute identical
    # partials (inputs are replicated over 'model' at shard_map entry), so
    # the sum runs over data+graph only
    reduce_axes = ((axis_name,) if data_axis is None
                   else (data_axis, axis_name))
    gab = jax.lax.psum(gab, reduce_axes)
    gbb = jax.lax.psum(gbb, reduce_axes)
    return dq, dk_buf, dv_buf, gab, gbb


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_blk_vjp_pallas(mesh, axis_name, interpret, scale, q, k, v,
                         a_bank, b_bank, ctile_src, ctile_rel, ctile_dst,
                         ctile_rel_src):
    return _pallas_ring_fwd(mesh, axis_name, interpret, scale, q, k, v,
                            a_bank, b_bank, ctile_src, ctile_rel)


def _ring_blk_pallas_fwd(mesh, axis_name, interpret, scale, q, k, v,
                         a_bank, b_bank, ctile_src, ctile_rel, ctile_dst,
                         ctile_rel_src):
    out, m, l = _pallas_ring_fwd(mesh, axis_name, interpret, scale, q, k, v,
                                 a_bank, b_bank, ctile_src, ctile_rel,
                                 with_stats=True)
    return out, (q, k, v, a_bank, b_bank, ctile_src, ctile_rel, ctile_dst,
                 ctile_rel_src, out, m, l)


def _ring_blk_pallas_bwd(mesh, axis_name, interpret, scale, res, g):
    (q, k, v, a_bank, b_bank, ctile_src, ctile_rel, ctile_dst,
     ctile_rel_src, out, m, l) = res
    S = mesh.shape[axis_name]
    data_ax, node_sp, cell_sp, rel_sp = _cp_specs(mesh, axis_name)
    body = functools.partial(_ring_bwd_body, axis_name=axis_name,
                             n_shards=S, scale=scale, interpret=interpret,
                             data_axis=data_ax)
    stat_sp = node_sp
    rep = P()
    dq, dk, dv, gab, gbb = jax.shard_map(
        body, mesh=mesh,
        in_specs=(node_sp, node_sp, node_sp, node_sp, node_sp, stat_sp,
                  stat_sp, rep, rep, cell_sp, rel_sp, cell_sp, rel_sp),
        out_specs=(node_sp, node_sp, node_sp, rep, rep),
        check_vma=False,
    )(q, k, v, g, out, m, l, a_bank, b_bank, ctile_src, ctile_rel,
      ctile_dst, ctile_rel_src)
    zeros = lambda x: _np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            gab.astype(a_bank.dtype), gbb.astype(b_bank.dtype),
            zeros(ctile_src), zeros(ctile_rel), zeros(ctile_dst),
            zeros(ctile_rel_src))


_ring_blk_vjp_pallas.defvjp(_ring_blk_pallas_fwd, _ring_blk_pallas_bwd)


# ---------------------------------------------------------------------------
# Fallback: XLA segment-ring backward (batches without the src-major cell
# layout — e.g. inference batches re-used for a grad check).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_blk_vjp(mesh, axis_name, interpret, scale, q, k, v, a_bank,
                  b_bank, ctile_src, ctile_rel, edge_src, edge_dst,
                  edge_rel, edge_mask):
    return _pallas_ring_fwd(mesh, axis_name, interpret, scale, q, k, v,
                            a_bank, b_bank, ctile_src, ctile_rel)


def _ring_blk_fwd(mesh, axis_name, interpret, scale, q, k, v, a_bank,
                  b_bank, ctile_src, ctile_rel, edge_src, edge_dst,
                  edge_rel, edge_mask):
    out = _ring_blk_vjp(mesh, axis_name, interpret, scale, q, k, v, a_bank,
                        b_bank, ctile_src, ctile_rel, edge_src, edge_dst,
                        edge_rel, edge_mask)
    return out, (q, k, v, a_bank, b_bank, ctile_src, ctile_rel, edge_src,
                 edge_dst, edge_rel, edge_mask)


def _ring_blk_bwd(mesh, axis_name, interpret, scale, res, g):
    """Backward through the edge-cell XLA ring: the same function on the
    same kept-pair set (the cells and tiles are both built from batchify's
    `keep` matrix), still sharded over the same axis."""
    from gtos_tpu.parallel.ring_attention import (
        ring_sparse_relation_attention,
    )

    (q, k, v, a_bank, b_bank, ctile_src, ctile_rel, edge_src, edge_dst,
     edge_rel, edge_mask) = res

    def f(q, k, v, a_bank, b_bank):
        return ring_sparse_relation_attention(
            mesh, q, k, v, a_bank, b_bank, edge_src, edge_dst, edge_rel,
            edge_mask, axis_name=axis_name, scale=scale)

    _, vjp = jax.vjp(f, q, k, v, a_bank, b_bank)
    gq, gk, gv, gab, gbb = vjp(g.astype(jnp.float32))
    zeros = lambda x: _np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (gq.astype(q.dtype), gk.astype(k.dtype), gv.astype(v.dtype),
            gab.astype(a_bank.dtype), gbb.astype(b_bank.dtype),
            zeros(ctile_src), zeros(ctile_rel), zeros(edge_src),
            zeros(edge_dst), zeros(edge_rel), zeros(edge_mask))


_ring_blk_vjp.defvjp(_ring_blk_fwd, _ring_blk_bwd)


def ring_block_sparse_relation_attention(
    mesh: Mesh, q, k, v, a_bank, b_bank, ctile_src, ctile_rel,
    edge_src=None, edge_dst=None, edge_rel=None, edge_mask=None,
    ctile_dst=None, ctile_rel_src=None,
    axis_name: str = "graph", scale=None, interpret: bool = False,
):
    """Context-parallel block-sparse relation attention (ring schedule,
    Pallas tile kernel per step; differentiable).

    q, k, v: [B, H, N, D] node-sharded over `axis_name`; banks replicated;
    ctile_src/ctile_rel: per-cell tile layout from
    pack_block_sparse_cells, sharded on the dst-block dim (axis 1).
    With ctile_dst/ctile_rel_src (pack_block_sparse_cells_src, training
    batches) the backward is the fused Pallas reverse ring; otherwise it
    differentiates the edge-cell XLA ring over edge_* (the same kept-pair
    set). Returns out [B, H, N, D] f32, node-sharded."""
    S = mesh.shape[axis_name]
    N = q.shape[2]
    assert N % S == 0, f"node dim {N} not divisible by '{axis_name}'={S}"
    assert ctile_src.shape[1] == S and ctile_src.shape[2] == S, (
        f"cell tile layout {ctile_src.shape} was built for "
        f"cp_shards={ctile_src.shape[1]}, mesh has {S}")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if ctile_dst is not None:
        return _ring_blk_vjp_pallas(mesh, axis_name, interpret, scale, q, k,
                                    v, a_bank, b_bank, ctile_src, ctile_rel,
                                    ctile_dst, ctile_rel_src)
    assert edge_src is not None, (
        "need either (ctile_dst, ctile_rel_src) for the fused Pallas ring "
        "backward or the edge cells (edge_src..edge_mask) for the XLA ring "
        "backward")
    return _ring_blk_vjp(mesh, axis_name, interpret, scale, q, k, v,
                         a_bank, b_bank, ctile_src, ctile_rel, edge_src,
                         edge_dst, edge_rel, edge_mask)
