"""The graph-transformer encoder stack.

Reference counterpart: generator/graph_transformer.py in jcyk/gtos
(SURVEY.md §2.2 "Graph transformer (core encoder)", §3.4): N post-LN layers
of relation-aware multi-head attention + FFN over all node pairs. The
attention scores use the exact 4-term bank decomposition from
gtos_tpu.ops.attention instead of materializing the O(N^2 * D) relation pair
tensor; a Pallas fused kernel can be swapped in via `impl`, and the O(E)
sparse edge-list path (optionally context-parallel over the mesh's 'graph'
axis via the ring schedule) via `impl='sparse'` + edge tensors.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from gtos_tpu.models.components import (
    FeedForward, PostLNResidual, merge_heads, split_heads,
)
from gtos_tpu.ops.attention import bank_relation_attention

# edge arrays as passed through the stack: edge_src/edge_dst/edge_rel/
# edge_mask [B, S, S, Ec] cell layout, plus tile_src/tile_rel for the
# block-sparse kernel (see gtos_tpu.models.generator.batch_edges)
EdgeDict = Dict[str, jnp.ndarray]


class RelationMultiheadAttention(nn.Module):
    """Relation-aware MHA: e_ij = scale * (q_i + a_ij).(k_j + b_ij).

    The relation bank vectors [P, Dr] are projected per layer into per-head
    a/b banks [P, H, Dh] (the counterpart of the reference's
    relation_in_proj — a single Linear chunked in two).

    impl: "xla" (pure-JAX bank decomposition), "pallas" (fused TPU kernel,
    custom_vjp), "pallas_interpret" (kernel under the Pallas interpreter
    for CPU tests), "sparse" (O(E) edge-list SDDMM/segment-softmax/SpMM —
    requires edge tensors; context-parallel over `cp_mesh`'s `cp_axis`
    when that axis has >1 devices, via the ring boundary-exchange
    schedule)."""

    d_model: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    cp_mesh: Optional[Any] = None
    cp_axis: str = "graph"
    cp_schedule: str = "ring"

    @nn.compact
    def __call__(self, x, rel_vecs, rel_index, node_mask,
                 edges: Optional[EdgeDict] = None):
        """x: [B,N,D]; rel_vecs: [P,Dr]; rel_index: [B,N,N]; node_mask: [B,N]."""
        assert self.impl in (
            "xla", "pallas", "pallas_interpret", "pallas_local",
            "pallas_local_interpret", "sparse", "block_sparse",
            "block_sparse_interpret"), (
            f"unknown attention impl {self.impl!r} (did 'auto' reach the "
            "model unresolved? resolve_attention_impl must run per batch)")
        H, Dh = self.heads, self.d_model // self.heads
        q = split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(x), H)
        k = split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(x), H)
        v = split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(x), H)
        if self.impl in ("pallas_local", "pallas_local_interpret"):
            # rel_vecs arrive PRE-LOCALIZED [B, P_loc, Dr] (gathered once
            # per stack by GraphTransformer — one scatter-add VJP per
            # step instead of per layer); the per-layer projection runs
            # directly in localized form with the SAME rel_proj params
            ab = nn.Dense(2 * self.d_model, dtype=self.dtype,
                          name="rel_proj")(rel_vecs)
            B, P_loc = ab.shape[:2]
            a_loc = ab[..., : self.d_model].reshape(B, P_loc, H, Dh)
            b_loc = ab[..., self.d_model:].reshape(B, P_loc, H, Dh)
            out = self._local(q, k, v, a_loc, b_loc, node_mask, edges)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="out_proj")(
                merge_heads(out.astype(self.dtype)))
        ab = nn.Dense(2 * self.d_model, dtype=self.dtype, name="rel_proj")(rel_vecs)
        P = ab.shape[0]
        a_bank = ab[:, : self.d_model].reshape(P, H, Dh)
        b_bank = ab[:, self.d_model:].reshape(P, H, Dh)
        if self.impl in ("sparse", "block_sparse",
                         "block_sparse_interpret"):
            assert edges is not None, (
                f"impl={self.impl!r} needs edge tensors (batchify "
                "build_edges / build_block_tiles)")
            out = self._sparse(q, k, v, a_bank, b_bank, edges)
        elif self.impl in ("pallas", "pallas_interpret"):
            from gtos_tpu.ops.pallas import relation_attention_trainable
            out = relation_attention_trainable(
                q, k, v, a_bank, b_bank, rel_index, node_mask,
                interpret=(self.impl == "pallas_interpret"))
        else:
            out, _ = bank_relation_attention(
                q, k, v, a_bank, b_bank, rel_index, node_mask)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(
            merge_heads(out.astype(self.dtype)))

    def _local(self, q, k, v, a_loc, b_loc, node_mask,
               edges: Optional[EdgeDict]):
        """Localized fused kernel (per-graph banks; batchify
        build_local_banks=True)."""
        assert edges is not None and "rel_index_loc" in edges, (
            f"impl={self.impl!r} needs localized-bank arrays "
            "(batchify build_local_banks=True)")
        from gtos_tpu.ops.pallas.local_relation_attention import (
            local_relation_attention_fwd_only,
            local_relation_attention_trainable,
        )
        interp = self.impl.endswith("_interpret")
        if "rel_sort" in edges:
            return local_relation_attention_trainable(
                q, k, v, a_loc, b_loc, edges["rel_index_loc"], node_mask,
                edges["rel_sort"], edges["rel_bnd"], edges["rel_sortT"],
                edges["rel_bndT"], interpret=interp)
        # inference batches ship no sorted-scatter auxiliaries; the
        # forward-only entry raises a TYPED message if differentiated
        return local_relation_attention_fwd_only(
            interp, q, k, v, a_loc, b_loc, edges["rel_index_loc"],
            node_mask)

    def _sparse(self, q, k, v, a_bank, b_bank, edges: EdgeDict):
        # edge cells are absent when only the tile layouts were built
        # (build_block_tiles without build_edges) — fine for the paths
        # that never touch the COO form (fused-backward ring, tile-bwd)
        src, dst, rel, mask = (edges.get("edge_src"), edges.get("edge_dst"),
                               edges.get("edge_rel"), edges.get("edge_mask"))
        if self.cp_mesh is not None and \
                self.cp_mesh.shape.get(self.cp_axis, 1) > 1:
            if self.impl.startswith("block_sparse"):
                # the composed flagship: ring CP with the Pallas tile
                # kernel as the per-step compute (VERDICT r2 next #2)
                from gtos_tpu.parallel.ring_block_sparse import (
                    ring_block_sparse_relation_attention,
                )
                assert "ctile_src" in edges, (
                    "block_sparse + CP needs the per-cell tile layout "
                    "(batchify build_block_tiles with cp_shards > 1)")
                return ring_block_sparse_relation_attention(
                    self.cp_mesh, q, k, v, a_bank, b_bank,
                    edges["ctile_src"], edges["ctile_rel"],
                    src, dst, rel, mask,
                    ctile_dst=edges.get("ctile_dst"),
                    ctile_rel_src=edges.get("ctile_rel_src"),
                    axis_name=self.cp_axis,
                    interpret=self.impl.endswith("_interpret"))
            if self.cp_schedule == "a2a":
                from gtos_tpu.parallel.a2a_attention import (
                    a2a_sparse_relation_attention,
                )
                return a2a_sparse_relation_attention(
                    self.cp_mesh, q, k, v, a_bank, b_bank,
                    src, dst, rel, mask, axis_name=self.cp_axis)
            from gtos_tpu.parallel.ring_attention import (
                ring_sparse_relation_attention,
            )
            return ring_sparse_relation_attention(
                self.cp_mesh, q, k, v, a_bank, b_bank,
                src, dst, rel, mask, axis_name=self.cp_axis)
        from gtos_tpu.ops.sparse_relation import flatten_edge_cells
        fsrc = fdst = frel = fmask = None
        if src is not None:
            fsrc, fdst, frel, fmask = flatten_edge_cells(
                src, dst, rel, mask, num_nodes=q.shape[2])
        if self.impl.startswith("block_sparse"):
            # Pallas tile-kernel forward; Pallas two-pass backward when the
            # src-major tile layout is in the batch, else XLA segment
            # backward on the same edge set (custom_vjp either way)
            from gtos_tpu.ops.pallas.block_sparse_attention import (
                block_sparse_relation_attention_trainable,
            )
            return block_sparse_relation_attention_trainable(
                q, k, v, a_bank, b_bank, edges["tile_src"],
                edges["tile_rel"], fsrc, fdst, frel, fmask,
                tile_dst=edges.get("tile_dst"),
                tile_rel_src=edges.get("tile_rel_src"),
                interpret=self.impl.endswith("_interpret"))
        from gtos_tpu.ops.sparse_relation import sparse_relation_attention
        return sparse_relation_attention(
            q, k, v, a_bank, b_bank, fsrc, fdst, frel, fmask)


class GraphTransformerLayer(nn.Module):
    d_model: int
    d_ff: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    cp_mesh: Optional[Any] = None
    cp_axis: str = "graph"
    cp_schedule: str = "ring"

    @nn.compact
    def __call__(self, x, rel_vecs, rel_index, node_mask, deterministic=True,
                 edges: Optional[EdgeDict] = None):
        attn = RelationMultiheadAttention(
            self.d_model, self.heads, dtype=self.dtype,
            impl=self.impl, cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
            cp_schedule=self.cp_schedule, name="self_attn",
        )(x, rel_vecs, rel_index, node_mask, edges)
        x = PostLNResidual(self.dropout, dtype=self.dtype, name="attn_res")(
            x, attn, deterministic)
        ff = FeedForward(self.d_model, self.d_ff, self.dropout,
                         dtype=self.dtype, name="ffn")(x, deterministic)
        x = PostLNResidual(self.dropout, dtype=self.dtype, name="ffn_res")(
            x, ff, deterministic)
        return x


class GraphTransformer(nn.Module):
    layers: int
    d_model: int
    d_ff: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    cp_mesh: Optional[Any] = None
    cp_axis: str = "graph"
    cp_schedule: str = "ring"

    @nn.compact
    def __call__(self, x, rel_vecs, rel_index, node_mask, deterministic=True,
                 edges: Optional[EdgeDict] = None):
        if self.impl in ("pallas_local", "pallas_local_interpret"):
            # localize the GRU's relation vectors ONCE for the whole
            # stack: every layer projects the localized [B, P_loc, Dr]
            # view, so the gather's scatter-add VJP back to the global
            # rows runs once per step, not once per layer (measured
            # ~0.85 ms per scatter at production shapes on v5e)
            assert edges is not None and "bank_map" in edges, (
                "impl=pallas_local needs batchify build_local_banks=True")
            from gtos_tpu.ops.localize import localize_bank
            # scatter-free backward when batchify shipped the sort-order
            # auxiliaries (train batches); plain gather otherwise
            rel_vecs = localize_bank(rel_vecs, edges["bank_map"],
                                     edges.get("loc_perm"),
                                     edges.get("loc_bnd"))
            if "rel_sort" not in edges:
                # sorted-scatter auxiliaries for the localized backward,
                # computed ON DEVICE once per step (shared by all layers;
                # DCE'd in no-grad programs) — the host used to build and
                # ship these four [B, N, P_loc]-sized arrays per batch
                from gtos_tpu.ops.pallas.local_relation_attention import (
                    device_sort_bnd,
                )
                idxl = edges["rel_index_loc"]
                P_loc = edges["bank_map"].shape[1]
                srt, bnd = device_sort_bnd(idxl, P_loc)
                srtT, bndT = device_sort_bnd(
                    jnp.swapaxes(idxl, 1, 2), P_loc)
                edges = dict(edges, rel_sort=srt, rel_bnd=bnd,
                             rel_sortT=srtT, rel_bndT=bndT)
        for i in range(self.layers):
            x = GraphTransformerLayer(
                self.d_model, self.d_ff, self.heads, self.dropout,
                dtype=self.dtype, impl=self.impl, cp_mesh=self.cp_mesh,
                cp_axis=self.cp_axis, cp_schedule=self.cp_schedule,
                name=f"layer{i}",
            )(x, rel_vecs, rel_index, node_mask, deterministic, edges)
        # zero padded nodes so downstream cross-attention sees clean memory
        return jnp.where(node_mask[:, :, None], x, 0.0)
