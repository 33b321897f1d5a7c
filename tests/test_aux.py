"""Aux subsystems: postprocessing, profiling timer, scaling harness,
bf16 config, nan-debugging mode, OOV cap guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data.postprocess import (
    detokenize, join_bpe, postprocess_hypothesis, reattach_entities,
)


def test_join_bpe():
    assert join_bpe(["un@@", "believ@@", "able", "news"]) == \
        ["unbelievable", "news"]
    assert join_bpe(["dangling@@"]) == ["dangling"]


def test_detokenize():
    assert detokenize(["Hello", ",", "world", "!"]) == "Hello, world!"
    assert detokenize(["he", "'s", "here"]) == "he's here"


def test_reattach_entities():
    toks = ["person_0", "visited", "city_1", "."]
    m = {"person_0": "Barack Obama", "city_1": "Rome"}
    assert reattach_entities(toks, m) == \
        ["Barack", "Obama", "visited", "Rome", "."]
    assert reattach_entities(toks, None) == toks


def test_postprocess_pipeline():
    out = postprocess_hypothesis(
        ["per@@", "son_0", "ar@@", "rived", "!"],
        entity_map={"person_0": "Ada Lovelace"}, detok=True)
    assert out == "Ada Lovelace arrived!"


def test_step_timer():
    from gtos_tpu.utils.profiling import StepTimer
    t = StepTimer()
    t.step(n_tokens=100, n_edges=1000)
    t.step(n_tokens=100, n_edges=1000)
    r = t.rates()
    assert r["tokens_per_s"] > 0 and r["edges_per_s"] > 0


def test_scaling_harness_small():
    from gtos_tpu.parallel.scaling import scaling_report
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rep = scaling_report(num_nodes=256, dim=16)
    assert rep["n_devices"] >= 2
    assert rep["edges_per_s_1dev"] > 0
    assert rep["ring"]["edges_per_s_mesh"] > 0
    assert rep["a2a"]["edges_per_s_mesh"] > 0
    assert rep["faster_schedule"] in ("ring", "a2a")
    assert rep["per_device_nodes"] == 256 // rep["n_devices"]
    # CPU-mesh efficiency is not meaningful; just check the math holds
    for sched in ("ring", "a2a"):
        assert abs(rep[sched]["efficiency"]
                   - rep[sched]["speedup"] / rep["n_devices"]) < 1e-9


def test_bfloat16_config_trains():
    import dataclasses
    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.utils.config import ModelConfig

    graphs, targets = synthetic_amr_corpus(4, seed=7)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    batch = batchify(preprocess(graphs, targets), tv, cv, rv, chv, lm,
                     batch_size_bucket=4)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0,
        compute_dtype="bfloat16")
    model = Generator(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    loss, _ = model.apply(params, batch.arrays(), deterministic=True)
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: model.apply(p, batch.arrays(), deterministic=True)[0]
    )(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_oov_cap_respected():
    """More unique OOV copy targets than the cap must degrade to UNK, not
    overflow the extended vocabulary."""
    from gtos_tpu.data import batchify, Vocab
    from gtos_tpu.data.batching import BucketSpec, Instance
    from gtos_tpu.data.vocab import LexicalMap
    from gtos_tpu.graph.paths import SELF_LABEL

    n = 24
    concepts = [f"zz{i}" for i in range(n)]  # all OOV in the token vocab
    paths = [[(SELF_LABEL,)] * n for _ in range(n)]
    inst = Instance(concepts=concepts, pair_paths=paths, target=["a"])
    tv = Vocab(["a"])
    cv = Vocab(concepts)
    rv = Vocab([SELF_LABEL])
    chv = Vocab(list("z0123456789"))
    spec = BucketSpec(max_oov=16)
    batch = batchify([inst], tv, cv, rv, chv, LexicalMap(), spec=spec,
                     batch_size_bucket=1)
    assert batch.num_oov == 16
    assert batch.cp_seq.max() < len(tv) + 16
    # overflowed concepts degrade to UNK
    assert (batch.cp_seq[batch.copy_mask] == tv.unk_id).sum() >= n - 16


def test_trainer_fails_fast_on_nonfinite_loss():
    """SURVEY.md §5 failure detection: a non-finite loss must abort the
    run with a FloatingPointError telling the user to --resume."""
    import numpy as np
    import jax.numpy as jnp

    from gtos_tpu.data import DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.train.trainer import Trainer
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    graphs, targets = synthetic_amr_corpus(4, seed=1, min_nodes=3,
                                           max_nodes=5)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=16, d_ff=32, heads=2, enc_layers=1,
        dec_layers=1, char_dim=4, char_filters=8, rel_emb_dim=4,
        rel_hidden=8, max_oov=16, max_target_len=32, dropout=0.0)
    dl = DataLoader(instances, tv, cv, rv, chv, lm, batch_size_tokens=128)
    first = next(iter(dl))
    trainer = Trainer(Generator(cfg), cfg,
                      TrainConfig(total_steps=3, warmup_steps=1,
                                  eval_every=100, checkpoint_every=100),
                      first.arrays())

    real_step = trainer.train_step

    def poisoned(state, arrays):
        state, metrics = real_step(state, arrays)
        return state, dict(metrics, loss=jnp.float32(np.nan))

    trainer.train_step = poisoned
    with pytest.raises(FloatingPointError, match="--resume"):
        trainer.fit(dl, log_every=100)


def test_model_clean_under_debug_nans():
    """jax_debug_nans mode (SURVEY.md §5 race/NaN detection): a full
    forward+backward on a healthy model must not trip the NaN checker —
    this guards the masked-softmax/-1e9/log(EPS) paths, which are exactly
    where naive implementations produce hidden NaNs."""
    import jax

    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.utils.config import ModelConfig

    graphs, targets = synthetic_amr_corpus(4, seed=2, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=4,
                     build_edges=True)
    for impl in ("xla", "sparse"):
        cfg = ModelConfig(
            token_vocab=len(tv), concept_vocab=len(cv),
            relation_vocab=len(rv), char_vocab=len(chv), d_model=16,
            d_ff=32, heads=2, enc_layers=1, dec_layers=1, char_dim=4,
            char_filters=8, rel_emb_dim=4, rel_hidden=8, max_oov=16,
            max_target_len=32, dropout=0.0, label_smoothing=0.1,
            attention_impl=impl)
        model = Generator(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch.arrays(), deterministic=True)
        prev = jax.config.jax_debug_nans
        try:
            jax.config.update("jax_debug_nans", True)
            loss, grads = jax.value_and_grad(
                lambda p: model.apply(p, batch.arrays(),
                                      deterministic=True)[0])(params)
            jax.block_until_ready(grads)
        finally:
            jax.config.update("jax_debug_nans", prev)


def test_golden_batch_determinism():
    """Deterministic-batch golden hash (SURVEY.md §5): identical corpus +
    seed must produce byte-identical batches across runs and processes —
    the property multi-host batchify-everywhere relies on."""
    import hashlib

    from gtos_tpu.data import DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus

    def corpus_hash():
        graphs, targets = synthetic_amr_corpus(10, seed=6, min_nodes=3,
                                               max_nodes=7)
        tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
        instances = preprocess(graphs, targets)
        dl = DataLoader(instances, tv, cv, rv, chv, lm,
                        batch_size_tokens=128, for_train=True, seed=11,
                        build_edges=True)
        h = hashlib.sha256()
        for batch in dl:
            for k, v in sorted(batch.arrays().items()):
                h.update(k.encode())
                h.update(v.tobytes())
        return h.hexdigest()

    assert corpus_hash() == corpus_hash()
