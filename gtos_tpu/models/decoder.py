"""Transformer decoder with an alignment cross-attention for the copy path.

Reference counterpart: generator/decoder.py (DecodeLayer) + transformer.py
in jcyk/gtos (SURVEY.md §2.2 "Decoder + copy mechanism", §3.4 DECODE):
causal self-attention over the shifted target, cross-attention to the
concept representations, with a designated alignment layer's cross-attention
distribution feeding the copy mechanism (the copy mix itself lives in
models/generator.py).

Two execution modes share all parameters:
  __call__  — full teacher-forced sequence (training),
  step      — one token with an explicit fixed-size KV-cache pytree, shaped
              for lax.while_loop beam search (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gtos_tpu.models.components import (
    FeedForward, MultiheadAttention, PostLNResidual, causal_mask,
    sinusoidal_positions,
)


class DecoderLayer(nn.Module):
    d_model: int
    d_ff: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiheadAttention(self.d_model, self.heads,
                                            dtype=self.dtype)
        self.self_res = PostLNResidual(self.dropout, dtype=self.dtype)
        self.cross_attn = MultiheadAttention(self.d_model, self.heads,
                                             dtype=self.dtype)
        self.cross_res = PostLNResidual(self.dropout, dtype=self.dtype)
        self.ffn = FeedForward(self.d_model, self.d_ff, self.dropout,
                               dtype=self.dtype)
        self.ffn_res = PostLNResidual(self.dropout, dtype=self.dtype)

    def __call__(self, x, mem, mem_mask, self_mask, deterministic=True):
        """x: [B,T,D]; mem: [B,N,D]; mem_mask: [B,N]; self_mask: [1,1,T,T].

        Returns (x, cross_probs [B,H,T,N])."""
        sa, _ = self.self_attn(x, x, x, self_mask)
        x = self.self_res(x, sa, deterministic)
        ca, cross_probs = self.cross_attn(
            x, mem, mem, mem_mask[:, None, None, :])
        x = self.cross_res(x, ca, deterministic)
        ff = self.ffn(x, deterministic)
        x = self.ffn_res(x, ff, deterministic)
        return x, cross_probs

    def init_cache(self, B: int, Tmax: int, mem):
        """Cache pytree: self-attn KV buffers + precomputed memory KV.

        Tmax should be the SEARCH horizon, not the model's max length:
        every decode step streams the whole self-KV buffer through the
        attention and (under beam search) through the parent reorder, so
        oversizing it is pure HBM waste — sizing 128 -> 64 alone measured
        0.27 -> 0.09 ms/step at B*K=128 on v5e
        (benchmarks/decode_ablate.json)."""
        H, Dh = self.heads, self.d_model // self.heads
        mem_k, mem_v = self.cross_attn.project_kv(mem, mem)
        zeros = jnp.zeros((B, H, Tmax, Dh), dtype=self.dtype)
        return dict(self_k=zeros, self_v=zeros, mem_k=mem_k, mem_v=mem_v)

    def step(self, x_t, cache, pos, mem_mask):
        """x_t: [B,1,D]; pos: scalar. Returns (x_t, new_cache, cross_probs)."""
        sa, ck, cv = self.self_attn.step_self(
            x_t, cache["self_k"], cache["self_v"], pos)
        x_t = self.self_res(x_t, sa, True)
        ca, cross_probs = self.cross_attn.attend_precomputed(
            x_t, cache["mem_k"], cache["mem_v"], mem_mask[:, None, None, :])
        x_t = self.cross_res(x_t, ca, True)
        ff = self.ffn(x_t, True)
        x_t = self.ffn_res(x_t, ff, True)
        new_cache = dict(self_k=ck, self_v=cv,
                         mem_k=cache["mem_k"], mem_v=cache["mem_v"])
        return x_t, new_cache, cross_probs


class Decoder(nn.Module):
    """Embedding + positions + N DecoderLayers. The output/copy head lives in
    the top model so it can tie weights with this embedding."""

    vocab: int
    layers: int
    d_model: int
    d_ff: int
    heads: int
    dropout: float
    max_len: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model, dtype=self.dtype)
        self.blocks = [
            DecoderLayer(self.d_model, self.d_ff, self.heads, self.dropout,
                         dtype=self.dtype, name=f"layer{i}")
            for i in range(self.layers)
        ]
        self.pos_table = sinusoidal_positions(self.max_len, self.d_model)
        self.input_dropout = nn.Dropout(self.dropout)

    def embed_tokens(self, ids):
        return self.embed(ids) * (self.d_model ** 0.5)

    def output_logits(self, h):
        """Tied softmax projection: h [.., D] -> logits [.., vocab]."""
        return self.embed.attend(h.astype(self.embed.embedding.dtype))

    def __call__(self, token_in, mem, mem_mask, deterministic=True):
        """token_in: [B,T] -> (h [B,T,D], align_probs [B,H,T,N])."""
        B, T = token_in.shape
        x = self.embed_tokens(token_in)
        x = x + self.pos_table[None, :T].astype(x.dtype)
        x = self.input_dropout(x, deterministic=deterministic)
        smask = causal_mask(T)
        align = None
        for blk in self.blocks:
            x, cross = blk(x, mem, mem_mask, smask, deterministic)
            align = cross  # alignment layer = last layer's cross-attention
        return x, align

    def init_cache(self, B, mem, horizon=None):
        """horizon: self-KV buffer length (number of decode steps); defaults
        to max_len for back-compat, but callers that know their search
        horizon should pass it (see DecoderLayer.init_cache)."""
        Tmax = self.max_len if horizon is None else min(horizon,
                                                        self.max_len)
        return [blk.init_cache(B, Tmax, mem) for blk in self.blocks]

    def step(self, token_t, pos, caches, mem_mask):
        """token_t: [B] int32; pos: scalar int32.

        Returns (h_t [B,D], new_caches, align_probs [B,H,N])."""
        x = self.embed_tokens(token_t[:, None])
        pos_emb = jax.lax.dynamic_slice_in_dim(
            self.pos_table, pos, 1, axis=0)
        x = x + pos_emb[None].astype(x.dtype)
        new_caches = []
        align = None
        for blk, cache in zip(self.blocks, caches):
            x, cache, cross = blk.step(x, cache, pos, mem_mask)
            new_caches.append(cache)
            align = cross
        return x[:, 0], new_caches, align[:, :, 0]
