"""Ring context-parallel sparse relation attention — the flagship.

SURVEY.md §2.3 calls graph context-parallelism "the framework's flagship"
and BASELINE.json's north_star mandates "exchanging boundary node features
via all-to-all overlapped with local aggregation". This module implements
that schedule as the graph analog of ring attention:

  * node features (q, k, v) are sharded over the mesh's 'graph' axis in
    contiguous node blocks — per-device node memory is O(N/S * D), shrinking
    with the mesh;
  * edges are sharded by DESTINATION block ([B, S_dst, S_src, Ec] cell
    layout from batchify, sharded on S_dst), so the segment softmax over
    incoming edges of a node is entirely LOCAL — no cross-device reduction;
  * only the (k, v) source blocks travel: at ring step t, device s holds
    block (s - t) mod S and processes exactly the edge cell whose sources
    live there, then the block moves to the right neighbour via
    jax.lax.ppermute. The ppermute for step t+1 is issued BEFORE step t's
    compute consumes the current buffer, so XLA lowers it to
    collective-permute-start/done pairs that overlap the SDDMM/aggregation
    (the mandated comm/compute overlap — on TPU this rides ICI);
  * softmax is streamed flash-attention-style (running max / denominator /
    numerator, rescaled per step), so no per-edge [E, D] value buffer is
    ever materialized.

Exact math (no approximation): parity with the single-device
gtos_tpu.ops.sparse_relation.sparse_relation_attention is tested on the
virtual CPU mesh in tests/test_sparse.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gtos_tpu.ops.sparse_relation import NEG_INF, _gather_nodes, _segment_op


def _ring_body(q, k, v, a_bank, b_bank, esrc, edst, erel, emask, *,
               axis_name: str, n_shards: int, scale):
    """Per-device body under shard_map.

    q, k, v: [B, H, Nl, D] (this device's node block);
    esrc/edst/erel/emask: [B, 1, S, Ec] (this device's dst-block cells,
    block-LOCAL ids). Returns out [B, H, Nl, D] f32 for the local block.
    """
    B, H, Nl, D = q.shape
    S = n_shards
    s = jax.lax.axis_index(axis_name)
    esrc, edst, erel, emask = (x[:, 0] for x in (esrc, edst, erel, emask))

    f32 = jnp.float32
    m = jnp.full((B, H, Nl), NEG_INF, f32)    # running max
    l = jnp.zeros((B, H, Nl), f32)            # running denominator
    o = jnp.zeros((B, H, Nl, D), f32)         # running numerator
    perm = [(i, (i + 1) % S) for i in range(S)]

    k_buf, v_buf = k, v
    for t in range(S):
        # Kick off the boundary exchange for the NEXT step first; its data
        # is independent of this step's compute, so XLA overlaps the
        # collective-permute with the local SDDMM + aggregation below.
        if t < S - 1:
            k_nxt = jax.lax.ppermute(k_buf, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_buf, axis_name, perm)

        # the source block currently held arrived from device (s - t)
        j = (s - t) % S
        cell = lambda x: jax.lax.dynamic_index_in_dim(  # noqa: E731
            x, j, axis=1, keepdims=False)               # [B, Ec]
        c_src, c_dst, c_rel, c_mask = map(cell, (esrc, edst, erel, emask))

        qd = _gather_nodes(q, c_dst).astype(f32)         # [B,H,Ec,D]
        ks = _gather_nodes(k_buf, c_src).astype(f32)
        vs = _gather_nodes(v_buf, c_src).astype(f32)
        ar = jnp.transpose(a_bank[c_rel], (0, 2, 1, 3)).astype(f32)
        br = jnp.transpose(b_bank[c_rel], (0, 2, 1, 3)).astype(f32)
        e = jnp.sum((qd + ar) * (ks + br), axis=-1) * scale   # [B,H,Ec]
        e = jnp.where(c_mask[:, None, :], e, NEG_INF)

        # streaming softmax update over this cell's edges
        cell_max = _segment_op(jax.ops.segment_max, e, c_dst, Nl)
        new_m = jnp.maximum(m, jnp.maximum(cell_max, NEG_INF))
        alpha = jnp.exp(m - new_m)                        # [B,H,Nl]
        e_sh = e - jnp.take_along_axis(
            new_m, jnp.broadcast_to(c_dst[:, None, :], e.shape), axis=2)
        p = jnp.where(c_mask[:, None, :], jnp.exp(e_sh), 0.0)
        l = l * alpha + _segment_op(jax.ops.segment_sum, p, c_dst, Nl)
        o = o * alpha[..., None] + _segment_op(
            jax.ops.segment_sum, p[..., None] * vs, c_dst, Nl)
        m = new_m

        if t < S - 1:
            k_buf, v_buf = k_nxt, v_nxt

    # guarded division (see ops/sparse_relation.py: eps^2 underflows in the
    # VJP and poisons gradients of empty segments with NaN)
    has_in = l > 0
    safe = jnp.where(has_in, l, 1.0)[..., None]
    return jnp.where(has_in[..., None], o / safe, 0.0)


def ring_sparse_relation_attention(
    mesh: Mesh, q, k, v, a_bank, b_bank,
    edge_src, edge_dst, edge_rel, edge_mask,
    axis_name: str = "graph", scale=None,
):
    """Context-parallel sparse relation attention over `axis_name`.

    q, k, v: [B, H, N, D] (sharded into node blocks by shard_map);
    a_bank/b_bank: [P, Hh, D] replicated; edge tensors: [B, S, S, Ec] cell
    layout (block-local ids, see batchify) sharded on the dst-block dim.
    Returns out [B, H, N, D] f32, node-sharded over `axis_name`.

    Works nested inside a jit that also uses 'data'/'model' GSPMD axes:
    shard_map claims only `axis_name` (axis_names=...), the rest stay
    automatic.
    """
    S = mesh.shape[axis_name]
    N = q.shape[2]
    assert N % S == 0, f"node dim {N} not divisible by '{axis_name}'={S}"
    assert edge_src.shape[1] == S, (
        f"edge cell layout {edge_src.shape} was built for "
        f"cp_shards={edge_src.shape[1]}, mesh has {S}")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    body = functools.partial(_ring_body, axis_name=axis_name, n_shards=S,
                             scale=scale)
    node_sp = P(None, None, axis_name, None)
    cell_sp = P(None, axis_name, None, None)
    rep = P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(node_sp, node_sp, node_sp, rep, rep,
                  cell_sp, cell_sp, cell_sp, cell_sp),
        out_specs=node_sp,
        axis_names={axis_name},
    )(q, k, v, a_bank, b_bank, edge_src, edge_dst, edge_rel, edge_mask)
