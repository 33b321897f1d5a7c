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
    static_argnames=("model", "beam_size", "max_steps", "alpha"),
)
def beam_decode_arrays(
    model: Generator,
    params,
    arrays: Dict[str, jnp.ndarray],
    beam_size: int = 8,
    max_steps: int = 64,
    alpha: float = 0.6,
) -> BeamResult:
    """arrays: the GraphBatch.arrays() payload. Returns BeamResult."""
    cfg = model.cfg
    B = arrays["concept"].shape[0]
    K = beam_size

    mem = model.apply(
        params, arrays["concept"], arrays["concept_char"],
        arrays["concept_mask"], arrays["rel_bank"], arrays["rel_length"],
        arrays["rel_index"], True, method=Generator.encode)

    # tile per-beam: [B, ...] -> [B*K, ...]
    rep = lambda x: jnp.repeat(x, K, axis=0)
    mem_t = rep(mem)
    concept_mask = rep(arrays["concept_mask"])
    cp_seq = rep(arrays["cp_seq"])
    copy_mask = rep(arrays["copy_mask"])

    caches = model.apply(params, mem_t, method=Generator.init_cache)

    def step_fn(tokens, pos, caches):
        return model.apply(
            params, tokens, pos, caches, concept_mask, cp_seq, copy_mask,
            method=Generator.decode_step)

    # str/end/unk ids are fixed by Vocab construction: PAD=0, UNK=1, STR=2,
    # END=3 (gtos_tpu.data.vocab specials order)
    return beam_search(
        step_fn, caches, B, K,
        min(max_steps, cfg.max_target_len - 1), cfg.ext_vocab,
        cfg.token_vocab, str_id=2, end_id=3, unk_id=1, alpha=alpha)


def decode_batch(
    model: Generator, params, batch, token_itos: List[str],
    beam_size: int = 8, max_steps: int = 64, alpha: float = 0.6,
) -> List[List[str]]:
    """GraphBatch -> best hypothesis token list per instance (host-side)."""
    res = beam_decode_arrays(
        model, params, batch.arrays(), beam_size=beam_size,
        max_steps=max_steps, alpha=alpha)
    seqs = jax.device_get(res.seqs)
    out = []
    for b in range(len(batch.oov_lists)):
        out.append(detokenize(
            seqs[b, 0], token_itos, batch.oov_lists[b], end_id=3))
    return out
