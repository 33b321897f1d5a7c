"""The top graph-to-sequence model: encoder + relation GRU + graph
transformer + copy decoder.

Reference counterpart: the Generator top model in jcyk/gtos (SURVEY.md §2.2
"Top model", §3.4): forward(batch) -> loss for training; encode once +
decode_step repeatedly for search. The copy mechanism mixes the generation
softmax with the alignment layer's cross-attention distribution scattered
onto an extended vocabulary:

    P(w) = g * P_vocab(w) + (1 - g) * sum_i alpha_i * [cp_seq_i == w]

realized by default as a one-hot MXU matmul (copy_impl='onehot'; the
XLA scatter-add — the TPU equivalent of the reference's scatter_add_
onto a vocab-size tensor — remains as copy_impl='scatter', but its
serialized VJP measured 1.5 ms/step at the dominant bucket). The same
model class serves the translator (dependency NMT) path with
use_copy=False.
"""

from __future__ import annotations

from typing import Dict, Optional

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from gtos_tpu.models.decoder import Decoder
from gtos_tpu.models.encoder import RelationEncoder, TokenEncoder
from gtos_tpu.models.graph_transformer import GraphTransformer
from gtos_tpu.utils.config import ModelConfig

EPS = 1e-9

# auto impl dispatch: per-graph localized banks beat the global-bank kernel
# when they are much smaller than the batch bank (fewer per-pair gather
# chunks); at path-diverse buckets P_loc approaches P and the global kernel
# wins (benchmarks/train_step.json impl_guidance). The threshold is the
# measured crossover's safe side.
AUTO_LOCAL_RATIO = 4


def resolve_attention_impl(impl: str, arrays) -> str:
    """Map attention_impl='auto' to the right kernel for THIS batch
    (VERDICT r3 next #6 — the best impl is bucket-dependent; a pinned
    choice eats up to 6x regret on the wrong bucket).

    Dispatch order (measured, benchmarks/train_step.json):
      1. 'block_sparse' when the batch carries tile layouts. Under the
         'auto' aux mode batchify emits these only as the OVERFLOW
         fallback — a batch whose path diversity exceeds the per-graph
         bank ladder — because the dense localized kernel beat the
         all-pairs tile kernel at every bucket where its banks fit
         (N=128: 16.7 vs 44.6 ms/step; unpruned tiles carry all N^2
         pairs, so O(E) buys nothing without khop — and khop demands an
         explicit sparse impl, train.py's guard);
      2. 'pallas_local' when the batch carries localized banks and the
         per-graph bank is at least AUTO_LOCAL_RATIO x smaller than the
         global bank (fewer per-pair gather chunks);
      3. the global-bank 'pallas' kernel otherwise.
    Non-auto impls pass through unchanged."""
    if not impl.startswith("auto"):
        return impl
    suffix = "_interpret" if impl.endswith("_interpret") else ""
    if "tile_src" in arrays:
        return "block_sparse" + suffix
    if "bank_map" in arrays:
        P = arrays["rel_bank"].shape[0]
        P_loc = arrays["bank_map"].shape[1]
        if P_loc * AUTO_LOCAL_RATIO <= P:
            return "pallas_local" + suffix
    return "pallas" + suffix


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class Generator(nn.Module):
    cfg: ModelConfig
    # context-parallel mesh for the sparse encoder (runtime wiring, not part
    # of the serialized config): when set and its cp_axis has >1 devices,
    # the encoder's relation attention runs edge-partitioned with the ring
    # boundary-exchange schedule (gtos_tpu.parallel.ring_attention)
    cp_mesh: Optional[object] = None
    cp_axis: str = "graph"

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        self.token_encoder = TokenEncoder(
            cfg.concept_vocab, cfg.char_vocab, cfg.d_model, cfg.char_dim,
            cfg.char_filters, cfg.char_widths, cfg.dropout, dtype=dt,
            add_positions=cfg.use_node_positions)
        self.relation_encoder = RelationEncoder(
            cfg.relation_vocab, cfg.rel_emb_dim, cfg.rel_hidden,
            cfg.d_model, cfg.dropout, dtype=dt)
        self.graph_transformer = GraphTransformer(
            cfg.enc_layers, cfg.d_model, cfg.d_ff, cfg.heads, cfg.dropout,
            dtype=dt, impl=cfg.attention_impl, cp_mesh=self.cp_mesh,
            cp_axis=self.cp_axis, cp_schedule=cfg.cp_schedule)
        self.decoder = Decoder(
            cfg.token_vocab, cfg.dec_layers, cfg.d_model, cfg.d_ff,
            cfg.heads, cfg.dropout, cfg.max_target_len, dtype=dt)
        if not cfg.tie_embeddings:
            self.out_proj = nn.Dense(cfg.token_vocab, dtype=dt)
        if cfg.use_copy:
            self.copy_gate = nn.Dense(1, dtype=dt)

    # ---------------- encoding ----------------

    def encode(self, concept, concept_char, concept_mask, rel_bank,
               rel_length, rel_index, deterministic: bool = True,
               edges=None):
        """-> concept representations [B, N, D].

        edges: (src, dst, rel, mask) cell tensors for the sparse encoder
        (attention_impl='sparse'); None for the dense paths."""
        x = self.token_encoder(concept, concept_char, deterministic)
        rel_vecs = self.relation_encoder(rel_bank, rel_length, deterministic)
        return self.graph_transformer(
            x, rel_vecs, rel_index, concept_mask, deterministic, edges)

    # ---------------- output distribution ----------------

    def _logits(self, h):
        if self.cfg.tie_embeddings:
            return self.decoder.output_logits(h)
        return self.out_proj(h)

    def ext_log_probs(self, h, align_probs, cp_seq, copy_mask):
        """Extended-vocabulary log P.

        h: [..., D]; align_probs: [..., H, N] cross-attn probs;
        cp_seq: [B, N] broadcastable to the leading dims of h;
        copy_mask: [B, N] likewise. Returns [..., ext_vocab] f32 log-probs.
        """
        cfg = self.cfg
        logits = self._logits(h).astype(jnp.float32)
        p_vocab = jax.nn.softmax(logits, axis=-1)            # [..., V]
        if not cfg.use_copy:
            pad = cfg.ext_vocab - cfg.token_vocab
            if pad:
                p_vocab = jnp.pad(p_vocab, [(0, 0)] * (p_vocab.ndim - 1) + [(0, pad)],
                                  constant_values=0.0)
            return jnp.log(p_vocab + EPS)

        # alpha: average attention heads, mask to copyable nodes, renormalize
        alpha = jnp.mean(align_probs.astype(jnp.float32), axis=-2)  # [..., N]
        cm = jnp.broadcast_to(
            copy_mask.reshape(copy_mask.shape[0],
                              *([1] * (alpha.ndim - 2)),
                              copy_mask.shape[1]),
            alpha.shape)
        alpha = jnp.where(cm, alpha, 0.0)
        alpha = alpha / (alpha.sum(-1, keepdims=True) + EPS)

        g = jax.nn.sigmoid(self.copy_gate(h).astype(jnp.float32))   # [..., 1]

        *lead, V = p_vocab.shape
        pad_tail = cfg.ext_vocab - V
        gen = jnp.pad(g * p_vocab,
                      [(0, 0)] * (p_vocab.ndim - 1) + [(0, pad_tail)])
        if cfg.copy_impl == "onehot":
            # copy mass as ONE one-hot matmul: copy[..., w] =
            # sum_i alpha[..., i] [cp_seq[b, i] == w]. The scatter-add
            # below and its VJP measured 1.5 ms/step at the dominant
            # bucket (train_step_breakdown.json r5); the matmul runs on
            # the MXU and differentiates into another matmul. The one-hot
            # is exact in bf16 (0/1), alpha rounds to bf16 (~1e-3
            # relative on a probability) — parity-tested vs the scatter.
            oh = (cp_seq[:, :, None]
                  == jnp.arange(cfg.ext_vocab)[None, None, :])  # [B,N,E]
            ohb = oh.astype(jnp.bfloat16)
            # split-precision bf16 matmul: hi + (alpha - hi) residual term
            # recovers f32 accuracy (~1e-6) at 2x a cheap MXU matmul —
            # the one-hot itself is exact in bf16
            a32 = (1.0 - g) * alpha
            a_hi = a32.astype(jnp.bfloat16)
            a_lo = (a32 - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            ein = functools.partial(jnp.einsum, "b...i,bie->b...e",
                                    preferred_element_type=jnp.float32)
            copy = ein(a_hi, ohb) + ein(a_lo, ohb)
            return jnp.log(gen + copy + EPS)
        # "scatter": the reference's torch scatter_add_ contract
        B = cp_seq.shape[0]
        N = cp_seq.shape[1]
        cp = jnp.broadcast_to(
            cp_seq.reshape(B, *([1] * (alpha.ndim - 2)), N), alpha.shape)
        ext = _scatter_add_last(gen, cp, (1.0 - g) * alpha)
        return jnp.log(ext + EPS)

    # ---------------- training ----------------

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = False):
        """Teacher-forced loss. batch: arrays from GraphBatch.arrays()."""
        cfg = self.cfg
        mem = self.encode(
            batch["concept"], batch["concept_char"], batch["concept_mask"],
            batch["rel_bank"], batch["rel_length"], batch["rel_index"],
            deterministic, edges=batch_edges(batch))
        h, align = self.decoder(
            batch["token_in"], mem, batch["concept_mask"], deterministic)
        # align: [B, H, T, N] -> per-position [B, T, H, N]
        align = jnp.transpose(align, (0, 2, 1, 3))
        logp = self.ext_log_probs(h, align, batch["cp_seq"], batch["copy_mask"])

        tgt = batch["token_out"]                                 # [B, T]
        mask = batch["token_mask"].astype(jnp.float32)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        n_tok = mask.sum() + EPS
        loss = (nll * mask).sum() / n_tok
        if cfg.label_smoothing > 0.0:
            # Standard label smoothing over the FINAL (copy-mixed) output
            # distribution: target = (1-eps)*onehot + eps*uniform(V), with
            # the uniform mass spread over the real token vocab only (the
            # OOV tail of the extended vocab is per-instance and mostly
            # padding, so smoothing onto it would inject log(EPS) noise).
            smooth = -(logp[..., : cfg.token_vocab].mean(-1) * mask).sum() / n_tok
            loss = (1.0 - cfg.label_smoothing) * loss + cfg.label_smoothing * smooth
        acc = ((logp.argmax(-1) == tgt) * mask).sum() / n_tok
        return loss, {"loss": loss, "acc": acc, "n_tok": mask.sum()}

    # ---------------- incremental decoding ----------------

    def init_cache(self, mem, horizon=None):
        """horizon: decode-step budget; sizes the self-KV buffers (HBM
        traffic per step scales with them — decoder.init_cache note)."""
        return self.decoder.init_cache(mem.shape[0], mem, horizon=horizon)

    def decode_step(self, token_t, pos, caches, concept_mask, cp_seq,
                    copy_mask):
        """One decode step.

        token_t: [B] previous tokens (token-vocab ids; copied OOVs must be
        mapped to UNK by the caller before feeding back). Returns
        (log_probs [B, ext_vocab] f32, new_caches)."""
        h, new_caches, align = self.decoder.step(
            token_t, pos, caches, concept_mask)
        logp = self.ext_log_probs(h, align, cp_seq, copy_mask)
        return logp, new_caches


def batch_edges(batch: Dict[str, jnp.ndarray]):
    """Extract the sparse-encoder edge arrays from a batch dict, if present
    (COO cells for impl='sparse'; plus block tiles for 'block_sparse')."""
    keys = ("edge_src", "edge_dst", "edge_rel", "edge_mask", "tile_src",
            "tile_rel", "tile_dst", "tile_rel_src", "ctile_src",
            "ctile_rel", "ctile_dst", "ctile_rel_src",
            # localized-bank auxiliaries (impl='pallas_local')
            "bank_map", "rel_index_loc", "loc_perm", "loc_bnd", "rel_sort",
            "rel_bnd", "rel_sortT", "rel_bndT")
    out = {k: batch[k] for k in keys if k in batch}
    return out or None


def _scatter_add_last(ext, idx, vals):
    """ext[..., K].at[..., idx].add(vals) over the last axis.

    idx, vals: [..., N] with idx into the last axis of ext."""
    lead = ext.shape[:-1]
    grids = jnp.meshgrid(*[jnp.arange(s) for s in lead], indexing="ij")
    index_arrays = tuple(g[..., None] for g in grids) + (idx,)
    return ext.at[index_arrays].add(vals)
