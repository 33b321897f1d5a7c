"""Beam search: mechanics on a synthetic step_fn, then end-to-end with the
model (greedy == step-by-step argmax; beam covers greedy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import batchify
from gtos_tpu.data.dataloader import preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.infer.beam import beam_search, detokenize, greedy_search
from gtos_tpu.infer.decode import beam_decode_arrays, decode_batch
from gtos_tpu.models import Generator
from gtos_tpu.utils.config import ModelConfig

STR_ID, END_ID, UNK_ID = 2, 3, 1


def _toy_step_fn(logits_table):
    """Deterministic LM: log-probs depend only on position."""
    def step_fn(tokens, pos, caches):
        B = tokens.shape[0]
        lp = jax.nn.log_softmax(logits_table[pos])
        return jnp.tile(lp[None], (B, 1)), caches
    return step_fn


def test_beam_finds_higher_scoring_path_than_greedy():
    """Classic trap: greedy takes token A at t=0, but the best full path
    goes through token B."""
    V = 6
    table = np.full((4, V), -10.0, dtype=np.float32)
    # t=0: A(id 4) slightly better than B(id 5)
    table[0, 4] = 2.0
    table[0, 5] = 1.9
    # t=1: after anything, END is mediocre unless we came from B
    table[1, END_ID] = 0.0
    table[1, 4] = 0.1
    # t=2: all paths must end
    table[2, END_ID] = 5.0
    table[3, END_ID] = 5.0
    step = _toy_step_fn(jnp.array(table))

    res_greedy = greedy_search(step, (), 1, 4, V, V, STR_ID, END_ID, UNK_ID)
    res_beam = beam_search(step, (), batch_size=1, beam_size=3, max_steps=4,
                           ext_vocab=V, token_vocab=V, str_id=STR_ID,
                           end_id=END_ID, unk_id=UNK_ID, alpha=0.0)
    assert float(res_beam.scores[0, 0]) >= float(res_greedy.scores[0, 0]) - 1e-5
    # beam scores sorted descending
    s = np.asarray(res_beam.scores[0])
    assert (np.diff(s) <= 1e-6).all()


def test_beam_emits_end_and_respects_max_steps():
    V = 5
    table = np.full((3, V), 0.0, dtype=np.float32)
    step = _toy_step_fn(jnp.array(table))
    res = beam_search(step, (), batch_size=2, beam_size=3, max_steps=3,
                      ext_vocab=V, token_vocab=V, str_id=STR_ID,
                      end_id=END_ID, unk_id=UNK_ID)
    assert res.seqs.shape == (2, 3, 4)
    assert (np.asarray(res.lengths) <= 3).all()


@pytest.fixture(scope="module")
def model_setup():
    graphs, targets = synthetic_amr_corpus(4, seed=3)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances[:2], tv, cv, rv, chv, lm, batch_size_bucket=2)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=16, dropout=0.0)
    model = Generator(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    return model, params, batch, cfg, tv


def test_model_beam_decode_runs(model_setup):
    model, params, batch, cfg, tv = model_setup
    res = beam_decode_arrays(model, params, batch.arrays(), beam_size=3,
                             max_steps=8)
    assert res.seqs.shape[0] == batch.batch_size
    assert res.seqs.shape[1] == 3
    # all sequences start with STR
    assert (np.asarray(res.seqs[:, :, 0]) == STR_ID).all()
    hyps = decode_batch(model, params, batch, tv, beam_size=3,
                        max_steps=8)
    assert len(hyps) == 2
    for h in hyps:
        assert all(isinstance(w, str) for w in h)


def test_model_beam1_matches_manual_greedy(model_setup):
    """beam_size=1 must replicate stepping the model with argmax by hand."""
    model, params, batch, cfg, tv = model_setup
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
    res = beam_decode_arrays(model, params, arrays, beam_size=1,
                             max_steps=6, alpha=0.0)

    mem = model.apply(params, arrays["concept"], arrays["concept_char"],
                      arrays["concept_mask"], arrays["rel_bank"],
                      arrays["rel_length"], arrays["rel_index"], True,
                      method=Generator.encode)
    caches = model.apply(params, mem, method=Generator.init_cache)
    B = arrays["concept"].shape[0]
    tok = jnp.full((B,), STR_ID, jnp.int32)
    manual = []
    for t in range(6):
        logp, caches = model.apply(
            params, tok, t, caches, arrays["concept_mask"],
            arrays["cp_seq"], arrays["copy_mask"],
            method=Generator.decode_step)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        manual.append(np.asarray(nxt))
        tok = jnp.where(nxt >= cfg.token_vocab, UNK_ID, nxt)
    manual = np.stack(manual, axis=1)  # [B, 6]

    got = np.asarray(res.seqs[:, 0, 1:7])
    for b in range(B):
        for t in range(6):
            assert got[b, t] == manual[b, t], (b, t, got[b], manual[b])
            if manual[b, t] == END_ID:
                break
