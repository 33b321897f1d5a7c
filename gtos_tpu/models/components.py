"""Shared transformer building blocks.

Reference counterpart: generator/transformer.py in jcyk/gtos (SURVEY.md §2.2
"Transformer utilities"): fairseq-style multi-head attention with incremental
decode caching, sinusoidal positions, post-LN residual layers. Departures for
TPU: batch-major [B, T, D] layout everywhere; the decode cache is an explicit
pytree of fixed-size buffers (SURVEY.md §7 hard-part #4) so beam search can
live inside lax.while_loop instead of Python.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sinusoidal_positions(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """[length, dim] sinusoidal embeddings (even dims sin, odd dims cos)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, D/H]."""
    B, T, D = x.shape
    return x.reshape(B, T, heads, D // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, Dh] -> [B, T, H*Dh]."""
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def attend(
    q: jnp.ndarray,            # [B, H, Tq, Dh]
    k: jnp.ndarray,            # [B, H, Tk, Dh]
    v: jnp.ndarray,            # [B, H, Tk, Dh]
    mask: Optional[jnp.ndarray],  # broadcastable to [B, H, Tq, Tk]; True=keep
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled dot-product attention; softmax in f32. Returns (out, probs)."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, probs


class MultiheadAttention(nn.Module):
    """Projections + attention, usable full-sequence or one-step-with-cache."""

    d_model: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    def __call__(self, query, key, value, mask=None):
        """query [B,Tq,D], key/value [B,Tk,D]; mask [B,1|H,Tq,Tk] or None."""
        q = split_heads(self.q_proj(query), self.heads)
        k = split_heads(self.k_proj(key), self.heads)
        v = split_heads(self.v_proj(value), self.heads)
        out, probs = attend(q, k, v, mask)
        return self.out_proj(merge_heads(out)), probs

    def project_kv(self, key, value):
        """Precompute K/V (e.g. cross-attention memory, built once)."""
        k = split_heads(self.k_proj(key), self.heads)
        v = split_heads(self.v_proj(value), self.heads)
        return k, v

    def attend_precomputed(self, query, k, v, mask=None):
        """Attention against already-projected K/V ([B,H,Tk,Dh])."""
        q = split_heads(self.q_proj(query), self.heads)
        out, probs = attend(q, k, v, mask)
        return self.out_proj(merge_heads(out)), probs

    def step_self(self, x_t, cache_k, cache_v, pos, pad_mask=None):
        """One causal self-attention step.

        x_t: [B, 1, D]; cache_k/v: [B, H, Tmax, Dh] (positions < pos valid);
        pos: scalar int32. Returns (out [B,1,D], new_cache_k, new_cache_v)."""
        q = split_heads(self.q_proj(x_t), self.heads)      # [B,H,1,Dh]
        k_t = split_heads(self.k_proj(x_t), self.heads)
        v_t = split_heads(self.v_proj(x_t), self.heads)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t, pos, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t, pos, axis=2)
        Tmax = cache_k.shape[2]
        valid = jnp.arange(Tmax)[None, None, None, :] <= pos  # [1,1,1,Tmax]
        out, _ = attend(q, cache_k, cache_v, valid)
        return self.out_proj(merge_heads(out)), cache_k, cache_v


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(h)


class PostLNResidual(nn.Module):
    """x = LayerNorm(x + f(x)) — the reference's fairseq post-LN convention."""

    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sub, deterministic: bool = True):
        sub = nn.Dropout(self.dropout)(sub, deterministic=deterministic)
        # LayerNorm statistics in f32 regardless of compute dtype
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(
            (x + sub).astype(jnp.float32)
        ).astype(x.dtype)


def causal_mask(T: int) -> jnp.ndarray:
    """[1, 1, T, T] lower-triangular True mask."""
    return jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
