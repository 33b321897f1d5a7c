"""jit-compiled batched beam search in lax.while_loop.

Reference counterpart: generator/search.py (Hypothesis/Beam) + the Python
time-step loop in generator/work.py of jcyk/gtos (SURVEY.md §2.2 "Beam
search", §3.5). The reference expands/prunes Python object frontiers per
step; here the whole search is one XLA program (BASELINE.json north_star:
"Python beam loop -> jit-compiled lax.while"):

  * beams are flattened into the batch dimension (B*K) so every decode step
    is one batched forward;
  * KV caches are fixed-size buffers reordered by gather when beams are
    re-ranked;
  * finished hypotheses live in a fixed-size pool merged by top-k each step
    (no dynamic shapes anywhere);
  * early exit when no alive beam can still beat the worst finished score.

Copy-extended ids (>= token_vocab) are mapped to UNK when fed back as the
next input token, matching pointer-generator practice.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamResult:
    """seqs: [B, K, Tmax+1] ext-vocab ids (position 0 is STR; END included);
    scores: [B, K] length-normalized log-probs, best first;
    lengths: [B, K] number of emitted tokens incl. END."""

    seqs: jnp.ndarray
    scores: jnp.ndarray
    lengths: jnp.ndarray


def _length_penalty(length, alpha):
    # GNMT-style normalization ((5 + len) / 6)^alpha; alpha=0 -> pure logp.
    return ((5.0 + length) / 6.0) ** alpha


def beam_search(
    step_fn: Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_caches: Any,
    batch_size: int,
    beam_size: int,
    max_steps: int,
    ext_vocab: int,
    token_vocab: int,
    str_id: int,
    end_id: int,
    unk_id: int,
    alpha: float = 0.6,
    reorder_fn: Callable[[Any, jnp.ndarray], Any] | None = None,
) -> BeamResult:
    """Run batched beam search.

    step_fn(tokens [B*K] int32, pos scalar int32, caches) ->
        (log_probs [B*K, ext_vocab] f32, new_caches)
    init_caches: cache pytree with leading dim B*K (memory already tiled
    per beam by the caller).
    reorder_fn(caches, flat_parent [B*K] int32) -> caches: permutes the
    per-beam state when beams are re-ranked. Defaults to gathering every
    leaf; callers whose caches contain beam-INVARIANT leaves (e.g. the
    decoder's precomputed memory KV, identical across a graph's beams)
    should pass a version that skips them — reordering them is pure HBM
    traffic (benchmarks/decode_ablate.json).

    The reorder is applied at the START of the next step rather than the
    end of the current one (the parents ride the carry): the gather then
    feeds straight into the step's dynamic_update_slice chain, which XLA
    can keep in place — measured 3.10 -> 0.60 ms/step at B=16, K=8,
    config-2 scale on v5e (decode_ablate.json full vs full_pre_h64,
    together with horizon-sized caches).
    """
    B, K, V = batch_size, beam_size, ext_vocab
    Tmax = max_steps

    alive_seq = jnp.full((B, K, Tmax + 1), 0, dtype=jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(str_id)
    # only beam 0 is live at t=0 (all beams hold identical state)
    alive_logp = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32)[None], (B, 1))
    fin_seq = jnp.zeros((B, K, Tmax + 1), dtype=jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF, dtype=jnp.float32)
    fin_len = jnp.zeros((B, K), dtype=jnp.int32)

    if reorder_fn is None:
        reorder_fn = lambda caches, fp: jax.tree_util.tree_map(  # noqa: E731
            lambda c: c[fp], caches)

    def cond(state):
        t, alive_logp, fin_scores, *_ = state
        # best possible score any alive beam could still reach (no further
        # logp decrease, maximal length normalization benefit at alpha>=0)
        best_alive = alive_logp.max(-1) / _length_penalty(
            jnp.float32(Tmax), alpha)
        worst_fin = fin_scores.min(-1)
        improving = (best_alive > worst_fin).any()
        return jnp.logical_and(t < Tmax, improving)

    def body(state):
        (t, alive_logp, fin_scores, alive_seq, fin_seq, fin_len, caches,
         parent_prev) = state

        if K > 1:
            # apply the PREVIOUS step's beam re-ranking to the caches now
            # (see docstring); t=0 carries the identity permutation
            flat_prev = (jnp.arange(B)[:, None] * K + parent_prev
                         ).reshape(-1)
            caches = reorder_fn(caches, flat_prev)

        tok_t = alive_seq[:, :, t].reshape(B * K)
        tok_t = jnp.where(tok_t >= token_vocab, unk_id, tok_t)
        logp, caches = step_fn(tok_t, t, caches)
        logp = logp.reshape(B, K, V).astype(jnp.float32)

        cand = alive_logp[:, :, None] + logp            # [B,K,V]
        flat = cand.reshape(B, K * V)
        topv, topi = jax.lax.top_k(flat, 2 * K)          # [B,2K]
        parent = topi // V
        tok = (topi % V).astype(jnp.int32)
        is_end = tok == end_id

        # candidate sequences [B,2K,Tmax+1]
        seqs = jnp.take_along_axis(
            alive_seq, parent[:, :, None], axis=1)
        seqs = seqs.at[:, :, t + 1].set(tok)

        # ---- merge finished candidates into the pool ----
        norm = topv / _length_penalty((t + 1).astype(jnp.float32), alpha)
        fin_cand_scores = jnp.where(is_end, norm, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)
        all_fin_seq = jnp.concatenate([fin_seq, seqs], axis=1)
        all_fin_len = jnp.concatenate(
            [fin_len, jnp.full((B, 2 * K), t + 1, jnp.int32)], axis=1)
        fs, fi = jax.lax.top_k(all_fin_scores, K)
        fin_scores = fs
        fin_seq = jnp.take_along_axis(all_fin_seq, fi[:, :, None], axis=1)
        fin_len = jnp.take_along_axis(all_fin_len, fi, axis=1)

        # ---- keep top-K non-finished as the new alive set ----
        alive_cand = jnp.where(is_end, NEG_INF, topv)
        av, ai = jax.lax.top_k(alive_cand, K)            # over 2K
        alive_logp = av
        alive_seq = jnp.take_along_axis(seqs, ai[:, :, None], axis=1)
        # new beam k of batch b continues parent beam; applied to the
        # caches at the start of the NEXT iteration
        chosen_parent = jnp.take_along_axis(parent, ai, axis=1)  # [B,K]

        return (t + 1, alive_logp, fin_scores, alive_seq, fin_seq, fin_len,
                caches, chosen_parent)

    identity_parent = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1))
    state = (jnp.int32(0), alive_logp, fin_scores, alive_seq, fin_seq,
             fin_len, init_caches, identity_parent)
    (t, alive_logp, fin_scores, alive_seq, fin_seq, fin_len, _, _) = (
        jax.lax.while_loop(cond, body, state))

    # fall back to alive beams where nothing finished
    alive_norm = alive_logp / _length_penalty(t.astype(jnp.float32), alpha)
    no_fin = fin_scores <= NEG_INF / 2
    final_scores = jnp.where(no_fin, alive_norm, fin_scores)
    final_seq = jnp.where(no_fin[:, :, None], alive_seq, fin_seq)
    final_len = jnp.where(no_fin, t, fin_len)

    order = jnp.argsort(-final_scores, axis=1)
    return BeamResult(
        seqs=jnp.take_along_axis(final_seq, order[:, :, None], axis=1),
        scores=jnp.take_along_axis(final_scores, order, axis=1),
        lengths=jnp.take_along_axis(final_len, order, axis=1),
    )


def greedy_search(step_fn, init_caches, batch_size, max_steps, ext_vocab,
                  token_vocab, str_id, end_id, unk_id):
    """Greedy decode = beam_search with K=1, alpha=0."""
    return beam_search(
        step_fn, init_caches, batch_size, 1, max_steps, ext_vocab,
        token_vocab, str_id, end_id, unk_id, alpha=0.0)


def tile_for_beams(tree, beam_size: int):
    """Repeat every leaf's batch dim K times: [B, ...] -> [B*K, ...]."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree)


def detokenize(seq, token_itos, oov_list, end_id):
    """Host-side: ext-vocab id sequence -> list of token strings.

    seq: [T+1] ids (position 0 = STR); oov_list: this instance's OOV
    strings (ids >= len(token_itos) index into it)."""
    V = len(token_itos)
    out = []
    for idx in list(seq)[1:]:
        idx = int(idx)
        if idx == end_id:
            break
        if idx >= V:
            j = idx - V
            out.append(oov_list[j] if j < len(oov_list) else "<UNK>")
        else:
            out.append(token_itos[idx])
    return out
