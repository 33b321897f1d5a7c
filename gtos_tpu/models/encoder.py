"""Input encoders: concept/char token encoder and the path-GRU relation
encoder.

Reference counterpart: generator/encoder.py in jcyk/gtos (SURVEY.md §2.2
"Token encoder", "Relation encoder"): concept embedding + character CNN,
and a bidirectional GRU over each unique relation path in the bank. TPU
departures: the GRU is a pair of lax.scan sweeps over the (small) bank with
length masking — the bank dedup means each unique path is encoded exactly
once per batch, and pair vectors are gathered on device.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class CharCNN(nn.Module):
    """Multi-width char convolutions, max-pooled. chars: [B, N, C] ids."""

    char_vocab: int
    char_dim: int
    filters: int
    widths: tuple
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, chars):
        B, N, C = chars.shape
        emb = nn.Embed(self.char_vocab, self.char_dim, dtype=self.dtype,
                       name="char_embed")(chars)          # [B,N,C,dc]
        x = emb.reshape(B * N, C, self.char_dim)
        pooled = []
        for w in self.widths:
            h = nn.Conv(self.filters, kernel_size=(w,), padding="SAME",
                        dtype=self.dtype, name=f"conv{w}")(x)
            h = nn.relu(h)
            # mask pad chars out of the max-pool
            pad = (chars.reshape(B * N, C) != 0)[:, :, None]
            h = jnp.where(pad, h, -1e9)
            pooled.append(jnp.max(h, axis=1))             # [B*N, filters]
        h = jnp.concatenate(pooled, axis=-1)
        # all-pad words (e.g. the CLS node) max-pool to -1e9; zero them
        any_char = (chars.reshape(B * N, C) != 0).any(axis=1, keepdims=True)
        h = jnp.where(any_char, h, 0.0)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="char_proj")(h)
        return out.reshape(B, N, self.out_dim)


class TokenEncoder(nn.Module):
    """Concept embedding + CharCNN -> d_model, LayerNorm, dropout.

    add_positions: sinusoidal positions added to node embeddings — used by
    the translator (dependency NMT) path where nodes are the source words
    in sentence order (SURVEY.md §2.2 "translator/ mirror"); AMR concepts
    are unordered so the generator path leaves it off."""

    vocab: int
    char_vocab: int
    d_model: int
    char_dim: int
    char_filters: int
    char_widths: tuple
    dropout: float
    dtype: jnp.dtype = jnp.float32
    add_positions: bool = False

    @nn.compact
    def __call__(self, ids, chars, deterministic: bool = True):
        emb = nn.Embed(self.vocab, self.d_model, dtype=self.dtype,
                       name="embed")(ids)
        ch = CharCNN(self.char_vocab, self.char_dim, self.char_filters,
                     self.char_widths, self.d_model, dtype=self.dtype,
                     name="char_cnn")(chars)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="merge")(
            jnp.concatenate([emb, ch], axis=-1))
        if self.add_positions:
            from gtos_tpu.models.components import sinusoidal_positions
            pos = sinusoidal_positions(ids.shape[1], self.d_model)
            x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)).astype(self.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _MaskedGRUStep(nn.Module):
    """One GRU step with a length mask freezing the carry at pad positions.
    Scanned over time by nn.scan in RelationEncoder."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, inp):
        x_t, m_t = inp
        h_new, _ = nn.GRUCell(self.hidden, dtype=self.dtype, name="cell")(h, x_t)
        h = jnp.where(m_t[:, None], h_new, h)
        return h, ()


class RelationEncoder(nn.Module):
    """Bidirectional GRU over the relation bank.

    bank: [P, L] label ids; lengths: [P]. Returns [P, out_dim] with row
    vectors for zero-length (pad) paths forced to zero. Each unique path in
    the batch is encoded once (the dedup trick — SURVEY.md §2.2)."""

    relation_vocab: int
    emb_dim: int
    hidden: int
    out_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bank, lengths, deterministic: bool = True):
        P, L = bank.shape
        embed = nn.Embed(self.relation_vocab, self.emb_dim,
                         dtype=self.dtype, name="rel_embed")
        # one-hot MXU matmul instead of a row gather: the relation-label
        # vocab is small (a few hundred roles), so [P*L, V] @ [V, e] is
        # trivial MXU work — and its VJP is another matmul, replacing the
        # serialized scatter-add of P*L rows into the tiny table that
        # dominated the GRU backward (r4 breakdown). Params identical.
        one_hot = jax.nn.one_hot(bank, self.relation_vocab,
                                 dtype=self.dtype)
        emb = one_hot @ embed.embedding.astype(self.dtype)  # [P,L,e]
        emb = nn.Dropout(self.dropout)(emb, deterministic=deterministic)

        # flax lifted scan: params broadcast across time steps. Path
        # buckets cap L at 8, so the scan FULLY UNROLLS: XLA fuses the
        # tiny per-step matmuls and, crucially, differentiates straight
        # code instead of a reverse scan (the scan backward measured
        # ~8x its forward at the dominant bucket — r4 breakdown).
        ScanGRU = nn.scan(
            _MaskedGRUStep, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=0, out_axes=0,
            unroll=L)

        h0 = jnp.zeros((P, self.hidden), dtype=self.dtype)
        steps = jnp.arange(L)
        valid = steps[:, None] < lengths[None, :]          # [L,P]
        xs = emb.transpose(1, 0, 2)                        # [L,P,e]
        h_fwd, _ = ScanGRU(self.hidden, self.dtype, name="gru_fwd")(
            h0, (xs, valid))
        # backward: reverse both sequence and mask; padding sits at the
        # front of the reversed sequence and is skipped by the carry freeze.
        h_bwd, _ = ScanGRU(self.hidden, self.dtype, name="gru_bwd")(
            h0, (xs[::-1], valid[::-1]))

        h = jnp.concatenate([h_fwd, h_bwd], axis=-1)       # [P,2*hidden]
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")(h)
        out = jnp.where((lengths > 0)[:, None], out, 0.0).astype(self.dtype)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
