"""Block-sparse pair layout — the TPU-native sparsity granularity.

Per-edge gather/scatter is hostile to the TPU (XLA serializes row
gathers/scatters; the VPU has no vector scatter at all), so the framework's
Pallas "SpMM/SDDMM" treats a 128x128 NODE TILE as the unit of sparsity,
matching the MXU's systolic tile: the kept-pair set of a graph is packed
into per-(dst-tile, src-tile) blocks, empty blocks are skipped entirely,
and each nonempty block is computed DENSELY on the MXU then masked. For
k-hop-pruned graphs (paths/trees/DAGs with locality) most blocks are empty;
for AMR-scale graphs (N <= 128) the layout degenerates to the fused dense
kernel's single tile.

Layout produced here (consumed by ops.pallas.block_sparse_attention):
  tile_src [B, Td, Smax] int32 — for each dst tile, the src-tile ids of its
      nonempty blocks, -1 padded (Smax = max nonempty blocks per dst tile);
  tile_rel [B, Td, Smax, T, T] int32 — the relation-bank row per pair
      inside each block, -1 where the pair is dropped (the mask rides in
      the sign bit: rel >= 0 <=> pair kept).

Storage/traffic are O(nonempty_blocks * T^2), not O(N^2).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

TILE = 128


def pack_block_sparse(keep: np.ndarray, rel_index: np.ndarray,
                      tile: int = TILE) -> Tuple[np.ndarray, np.ndarray]:
    """keep: [B, N, N] bool kept-pair mask; rel_index: [B, N, N] int32.

    Returns (tile_src [B, Td, Smax], tile_rel [B, Td, Smax, tile, tile]).
    N must be a multiple of `tile` (pad nodes to the bucket ladder first).
    """
    B, N, N2 = keep.shape
    assert N == N2 and N % tile == 0, (N, N2, tile)
    Td = N // tile
    # nonempty block map [B, Td, Ts]
    blocks = keep.reshape(B, Td, tile, Td, tile).any(axis=(2, 4))
    smax = max(1, int(blocks.sum(-1).max()))
    tile_src = np.full((B, Td, smax), -1, np.int32)
    tile_rel = np.full((B, Td, smax, tile, tile), -1, np.int32)
    masked_rel = np.where(keep, rel_index, -1).astype(np.int32)
    for b in range(B):
        for d in range(Td):
            srcs = np.nonzero(blocks[b, d])[0]
            tile_src[b, d, : len(srcs)] = srcs
            for i, s in enumerate(srcs):
                tile_rel[b, d, i] = masked_rel[
                    b, d * tile:(d + 1) * tile, s * tile:(s + 1) * tile]
    return tile_src, tile_rel


def pack_block_sparse_src(keep: np.ndarray, rel_index: np.ndarray,
                          tile: int = TILE) -> Tuple[np.ndarray, np.ndarray]:
    """Src-major transpose of pack_block_sparse, for the backward kernel's
    dK/dV pass (which accumulates per SOURCE tile, the flash-attention
    column-major schedule).

    keep/rel_index: [B, N, N] as in pack_block_sparse. Returns
      tile_dst [B, Ts, Smax_s] int32 — for each src tile, the dst-tile ids
          of its nonempty blocks, -1 padded;
      tile_rel_src [B, Ts, Smax_s, tile, tile] int32 — the TRANSPOSED
          relation block ([src-local j, dst-local i] orientation, so the
          kernel's per-row scatter walks source rows), -1 = dropped pair.
    """
    B, N, N2 = keep.shape
    assert N == N2 and N % tile == 0, (N, N2, tile)
    Ts = N // tile
    blocks = keep.reshape(B, Ts, tile, Ts, tile).any(axis=(2, 4))  # [B,Td,Ts]
    blocks_t = blocks.transpose(0, 2, 1)                           # [B,Ts,Td]
    smax = max(1, int(blocks_t.sum(-1).max()))
    tile_dst = np.full((B, Ts, smax), -1, np.int32)
    tile_rel_src = np.full((B, Ts, smax, tile, tile), -1, np.int32)
    masked_rel = np.where(keep, rel_index, -1).astype(np.int32)
    for b in range(B):
        for s in range(Ts):
            dsts = np.nonzero(blocks_t[b, s])[0]
            tile_dst[b, s, : len(dsts)] = dsts
            for i, d in enumerate(dsts):
                tile_rel_src[b, s, i] = masked_rel[
                    b, d * tile:(d + 1) * tile, s * tile:(s + 1) * tile].T
    return tile_dst, tile_rel_src


def keep_from_edge_cells(edge_src, edge_dst, edge_mask, num_nodes: int,
                         edge_rel=None):
    """Rebuild the [B, N, N] kept-pair mask (and optionally a rel matrix)
    from batchify's [B, S, S, Ec] cell tensors — used when only the edge
    form is available."""
    B, S, S2, Ec = edge_src.shape
    nl = num_nodes // S
    keep = np.zeros((B, num_nodes, num_nodes), bool)
    rel = np.zeros((B, num_nodes, num_nodes), np.int32)
    for b in range(B):
        for d in range(S):
            for s in range(S2):
                m = edge_mask[b, d, s]
                ii = edge_dst[b, d, s][m] + d * nl
                jj = edge_src[b, d, s][m] + s * nl
                keep[b, ii, jj] = True
                if edge_rel is not None:
                    rel[b, ii, jj] = edge_rel[b, d, s][m]
    return (keep, rel) if edge_rel is not None else keep
