"""Model-facing decoding entry: encode once, beam-search the decoder.

Reference counterpart: the per-batch portion of generator/work.py in
jcyk/gtos (SURVEY.md §3.5) — encode the graph side once, then expand beams
over cached decoder state. Here the entire search is one jitted program per
(batch-shape, beam) signature.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from gtos_tpu.infer.beam import BeamResult, beam_search, detokenize
from gtos_tpu.models.generator import Generator


@functools.partial(
    jax.jit,
    static_argnames=("model", "beam_size", "max_steps", "alpha",
                     "str_id", "end_id", "unk_id"),
)
def beam_decode_arrays(
    model: Generator,
    params,
    arrays: Dict[str, jnp.ndarray],
    beam_size: int = 8,
    max_steps: int = 64,
    alpha: float = 0.6,
    str_id: int = 2,
    end_id: int = 3,
    unk_id: int = 1,
) -> BeamResult:
    """arrays: the GraphBatch.arrays() payload. Returns BeamResult."""
    cfg = model.cfg
    B = arrays["concept"].shape[0]
    K = beam_size

    from gtos_tpu.models.generator import batch_edges
    mem = model.apply(
        params, arrays["concept"], arrays["concept_char"],
        arrays["concept_mask"], arrays["rel_bank"], arrays["rel_length"],
        arrays["rel_index"], True, edges=batch_edges(arrays),
        method=Generator.encode)

    # tile per-beam: [B, ...] -> [B*K, ...]
    rep = lambda x: jnp.repeat(x, K, axis=0)
    mem_t = rep(mem)
    concept_mask = rep(arrays["concept_mask"])
    cp_seq = rep(arrays["cp_seq"])
    copy_mask = rep(arrays["copy_mask"])

    steps = min(max_steps, cfg.max_target_len - 1)
    # self-KV buffers sized to the search horizon, not max_target_len:
    # every decode step streams (and under beam search reorders) the whole
    # buffer (decoder.init_cache note; benchmarks/decode_ablate.json)
    caches = model.apply(params, mem_t, steps, method=Generator.init_cache)

    def step_fn(tokens, pos, caches):
        return model.apply(
            params, tokens, pos, caches, concept_mask, cp_seq, copy_mask,
            method=Generator.decode_step)

    def reorder_fn(caches, flat_parent):
        # mem_k/mem_v are tiled per beam and never written: identical
        # across a graph's beams, so the parent gather would be a no-op
        # realized as full-buffer HBM traffic — reorder self-KV only
        return [
            {k: (v[flat_parent] if k in ("self_k", "self_v") else v)
             for k, v in c.items()} for c in caches]

    return beam_search(
        step_fn, caches, B, K, steps, cfg.ext_vocab,
        cfg.token_vocab, str_id=str_id, end_id=end_id, unk_id=unk_id,
        alpha=alpha, reorder_fn=reorder_fn)


def decode_batch(
    model: Generator, params, batch, token_vocab,
    beam_size: int = 8, max_steps: int = 64, alpha: float = 0.6,
) -> List[List[str]]:
    """GraphBatch -> best hypothesis token list per instance (host-side).

    token_vocab: the target-side Vocab — supplies the id->string table and
    the STR/END/UNK special ids (previously hardcoded; VERDICT r1 weak #7).

    attention_impl='auto' is resolved HERE per batch (one place for every
    decode caller — work.py, the dev-BLEU hook, user scripts)."""
    if model.cfg.attention_impl.startswith("auto"):
        import dataclasses

        from gtos_tpu.models.generator import resolve_attention_impl
        impl = resolve_attention_impl(model.cfg.attention_impl,
                                      batch.arrays())
        model = Generator(dataclasses.replace(model.cfg,
                                              attention_impl=impl),
                          cp_mesh=model.cp_mesh, cp_axis=model.cp_axis)
    res = beam_decode_arrays(
        model, params, batch.arrays(), beam_size=beam_size,
        max_steps=max_steps, alpha=alpha, str_id=token_vocab.str_id,
        end_id=token_vocab.end_id, unk_id=token_vocab.unk_id)
    seqs = jax.device_get(res.seqs)
    out = []
    for b in range(len(batch.oov_lists)):
        out.append(detokenize(
            seqs[b, 0], token_vocab.itos, batch.oov_lists[b],
            end_id=token_vocab.end_id))
    return out
