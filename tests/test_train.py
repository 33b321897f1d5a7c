"""End-to-end training smoke: overfit a tiny synthetic corpus, decode it
back, checkpoint round-trip (SURVEY.md §4 plan item d)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import DataLoader
from gtos_tpu.data.dataloader import preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.infer.decode import decode_batch
from gtos_tpu.models import Generator
from gtos_tpu.train.checkpoint import CheckpointManager
from gtos_tpu.train.trainer import Trainer, init_state
from gtos_tpu.train.optim import inverse_sqrt_schedule, make_optimizer
from gtos_tpu.utils.config import ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def tiny_run():
    graphs, targets = synthetic_amr_corpus(12, seed=5, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=64, d_ff=128, heads=4, enc_layers=2,
        dec_layers=2, char_dim=8, char_filters=16, rel_emb_dim=16,
        rel_hidden=32, max_oov=16, max_target_len=32, dropout=0.0)
    # Note peak lr = lr_scale * d^-0.5 * warmup^-0.5 = 0.0125 here; hotter
    # settings saturate this tiny model and stall (observed empirically).
    tcfg = TrainConfig(total_steps=250, warmup_steps=100, lr_scale=1.0,
                       eval_every=1000, checkpoint_every=1000)
    model = Generator(cfg)
    dl = DataLoader(instances, tv, cv, rv, chv, lm, batch_size_tokens=512,
                    for_train=True, seed=1)
    first = next(iter(dl))
    trainer = Trainer(model, cfg, tcfg, first.arrays())
    loss0 = float(model.apply(trainer.state.params, first.arrays(),
                              deterministic=True)[0])
    last = trainer.fit(dl, log_every=1000)
    return model, trainer, cfg, tv, dl, instances, loss0, last


def test_schedule_shape():
    sched = inverse_sqrt_schedule(512, warmup_steps=100, scale=1.0)
    lrs = [float(sched(s)) for s in [0, 50, 99, 100, 400, 10000]]
    assert lrs[0] < lrs[1] < lrs[2]              # warming up
    assert lrs[3] >= lrs[4] >= lrs[5]            # decaying
    peak = (512 ** -0.5) * (100 ** -0.5)
    assert abs(lrs[3] - peak) / peak < 0.05


def test_loss_decreases(tiny_run):
    model, trainer, cfg, tv, dl, instances, loss0, last = tiny_run
    assert last["loss"] < loss0 * 0.5, (loss0, last)


def test_overfit_decodes_training_data(tiny_run):
    """After overfitting, greedy decode should reproduce most target tokens
    (exercises the copy path end-to-end)."""
    model, trainer, cfg, tv, dl, instances, loss0, last = tiny_run
    from gtos_tpu.data import batchify
    batch = batchify(instances[:4], dl.vocabs["token"], dl.vocabs["concept"],
                     dl.vocabs["relation"], dl.vocabs["char"],
                     dl.lexical_map, batch_size_bucket=4)
    hyps = decode_batch(model, trainer.state.params, batch, tv,
                        beam_size=2, max_steps=30)
    matches, total = 0, 0
    for hyp, inst in zip(hyps, instances[:4]):
        ref = inst.target
        total += len(ref)
        matches += sum(1 for a, b in zip(hyp, ref) if a == b)
    assert total > 0
    assert matches / total > 0.6, (matches, total, hyps)


def test_checkpoint_roundtrip(tiny_run, tmp_path_factory):
    model, trainer, cfg, tv, dl, instances, loss0, last = tiny_run
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    mgr = CheckpointManager(ckpt_dir, cfg, trainer.train_cfg)
    mgr.save(int(trainer.state.step), trainer.state)
    mgr.wait()

    # fresh state, restore
    tx = make_optimizer(trainer.train_cfg, cfg.d_model)
    batch = next(iter(dl))
    fresh = init_state(model, tx, batch.arrays(), seed=999)
    restored = mgr.restore_latest(fresh)
    assert restored is not None
    assert int(restored.step) == int(trainer.state.step)
    l_orig = float(model.apply(trainer.state.params, batch.arrays(),
                               deterministic=True)[0])
    l_rest = float(model.apply(restored.params, batch.arrays(),
                               deterministic=True)[0])
    np.testing.assert_allclose(l_rest, l_orig, rtol=1e-5)
    # config sidecar readable
    cfg2 = CheckpointManager.load_model_config(ckpt_dir)
    assert cfg2 == cfg


def test_label_smoothing_loss(tiny_run):
    """label_smoothing > 0 must yield a finite loss, finite grads, and
    differ from the unsmoothed loss (VERDICT r1 weak #9: the smoothed path
    was untested)."""
    import dataclasses

    model, trainer, cfg, tv, dl, instances, loss0, last = tiny_run
    cfg_ls = dataclasses.replace(cfg, label_smoothing=0.1)
    model_ls = Generator(cfg_ls)
    batch = next(iter(dl))
    arrays = batch.arrays()
    # same params work (label smoothing adds no parameters)
    l_plain, _ = model.apply(trainer.state.params, arrays, deterministic=True)
    l_smooth, _ = model_ls.apply(trainer.state.params, arrays,
                                 deterministic=True)
    assert np.isfinite(float(l_smooth))
    assert float(l_smooth) != float(l_plain)
    # smoothing penalizes the overfit (near-one-hot) model: loss goes up
    assert float(l_smooth) > float(l_plain)
    grads = jax.grad(
        lambda p: model_ls.apply(p, arrays, deterministic=True)[0]
    )(trainer.state.params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_restore_after_accum_training(tmp_path_factory):
    """Checkpoints written by a run with accum_steps>1 (optax.MultiSteps
    wraps the opt-state pytree) and weight_decay>0 (adamw state) must
    restore in an inference-style rebuild that reads train_config.json
    (VERDICT r1 weak #1 regression)."""
    import json

    from gtos_tpu.utils.config import TrainConfig as TC

    graphs, targets = synthetic_amr_corpus(6, seed=3, min_nodes=3,
                                           max_nodes=5)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    tcfg = TC(total_steps=4, warmup_steps=2, accum_steps=2,
              weight_decay=0.01, eval_every=100, checkpoint_every=100)
    model = Generator(cfg)
    dl = DataLoader(instances, tv, cv, rv, chv, lm, batch_size_tokens=256,
                    for_train=True, seed=1)
    first = next(iter(dl))
    ckpt_dir = str(tmp_path_factory.mktemp("accum_ckpt"))
    mgr = CheckpointManager(ckpt_dir, cfg, tcfg)
    trainer = Trainer(model, cfg, tcfg, first.arrays(),
                      checkpoint_manager=mgr)
    trainer.fit(dl, log_every=1000)

    # inference-style restore: template opt state built from the SAVED
    # train config, exactly as infer/work.py does
    with open(os.path.join(ckpt_dir, "train_config.json")) as f:
        saved_tcfg = TC.from_json(f.read())
    assert saved_tcfg.accum_steps == 2 and saved_tcfg.weight_decay == 0.01
    tx = make_optimizer(saved_tcfg, cfg.d_model)
    template = init_state(model, tx, first.arrays(), seed=0)
    restored = mgr.restore_latest(template)
    assert restored is not None
    l, _ = model.apply(restored.params, first.arrays(), deterministic=True)
    assert np.isfinite(float(l))

    # and the DEFAULT-config template (the old bug) must NOT be silently
    # wrong: it differs in opt-state structure
    tx_bad = make_optimizer(TC(), cfg.d_model)
    bad_template = init_state(model, tx_bad, first.arrays(), seed=0)
    bad_leaves = jax.tree_util.tree_structure(bad_template.opt_state)
    good_leaves = jax.tree_util.tree_structure(template.opt_state)
    assert bad_leaves != good_leaves


def test_prefetch_iter_matches_plain_map():
    from gtos_tpu.data.prefetch import prefetch_iter

    items = list(range(20))
    fn = lambda x: x * x  # noqa: E731
    assert list(prefetch_iter(items, fn, depth=3)) == [fn(x) for x in items]
    assert list(prefetch_iter(items, fn, depth=0)) == [fn(x) for x in items]

    # exceptions in the transform propagate to the consumer
    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_iter(items, boom, depth=2))

    # early abandonment doesn't hang (worker is signalled to stop)
    it = prefetch_iter(items, fn, depth=2)
    assert next(it) == 0
    it.close()


def test_async_dispatch_equals_sync_training():
    """The prefetch + bounded-inflight pipeline (trainer.py) is a pure
    scheduling change: final params must be bit-identical to the
    synchronous loop."""
    graphs, targets = synthetic_amr_corpus(8, seed=9, min_nodes=3,
                                           max_nodes=5)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=4, char_filters=8, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    tcfg = TrainConfig(total_steps=12, warmup_steps=4, eval_every=1000,
                       checkpoint_every=1000)

    def run(prefetch, inflight):
        model = Generator(cfg)
        dl = DataLoader(instances, tv, cv, rv, chv, lm,
                        batch_size_tokens=256, for_train=True, seed=3)
        first = next(iter(dl))
        tr = Trainer(model, cfg, tcfg, first.arrays(),
                     prefetch=prefetch, max_inflight=inflight)
        last = tr.fit(dl, log_every=6)
        return tr.state.params, last

    p_sync, last_sync = run(prefetch=0, inflight=0)
    p_async, last_async = run(prefetch=2, inflight=2)
    assert last_sync["step"] == last_async["step"] == 12
    assert abs(last_sync["loss"] - last_async["loss"]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_sync, p_async)


def test_auto_impl_dispatch():
    """attention_impl='auto' resolves per batch and both candidate kernels
    produce the same loss on the same batch/params (VERDICT r3 next #6)."""
    import dataclasses

    from gtos_tpu.data import BucketSpec, batchify
    from gtos_tpu.models.generator import resolve_attention_impl

    graphs, targets = synthetic_amr_corpus(12, seed=5, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances[:8], tv, cv, rv, chv, lm,
                     spec=BucketSpec(bank=(1024,), local_bank=(128,)),
                     build_local_banks=True)
    arrays = batch.arrays()
    # P_loc=128 vs P=1024 -> localized kernel; without banks -> global
    assert resolve_attention_impl("auto_interpret", arrays) == \
        "pallas_local_interpret"
    no_banks = {k: v for k, v in arrays.items() if k != "bank_map"}
    assert resolve_attention_impl("auto_interpret", no_banks) == \
        "pallas_interpret"
    assert resolve_attention_impl("sparse", arrays) == "sparse"

    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=64, d_ff=128, heads=4, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=16,
        rel_hidden=32, max_oov=16, max_target_len=32, dropout=0.0)
    impls = ["pallas_interpret", "pallas_local_interpret"]
    models = [Generator(dataclasses.replace(cfg, attention_impl=i))
              for i in impls]
    params = models[0].init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        arrays, deterministic=True)
    losses = [float(m.apply(params, arrays, deterministic=True)[0])
              for m in models]
    # one parameter tree serves both kernels with the same result
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)


def test_auto_impl_trainer_smoke():
    """A Trainer under attention_impl='auto_interpret' builds per-impl
    steps lazily and trains with a finite loss."""
    graphs, targets = synthetic_amr_corpus(8, seed=3, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=16,
        rel_hidden=32, max_oov=16, max_target_len=32, dropout=0.0,
        attention_impl="auto_interpret")
    tcfg = TrainConfig(total_steps=2, warmup_steps=10, eval_every=100,
                       checkpoint_every=100)
    model = Generator(cfg)
    dl = DataLoader(instances, tv, cv, rv, chv, lm, batch_size_tokens=512,
                    for_train=True, seed=1, build_local_banks=True)
    first = next(iter(dl))
    trainer = Trainer(model, cfg, tcfg, first.arrays())
    last = trainer.fit(dl, log_every=1)
    assert np.isfinite(last["loss"])
    assert all(i in ("pallas_interpret", "pallas_local_interpret")
               for i in trainer._steps)


def test_auto_aux_prefers_local_banks_at_every_bucket():
    """batchify's 'auto' aux mode builds localized banks at every bucket
    where the per-graph ladder fits — the dense localized kernel beat the
    all-pairs tile kernel at every measured bucket (train_step.json
    N128: 16.7 vs 44.6 ms/step) — and one auto Trainer trains mixed
    buckets through per-impl dispatched steps (VERDICT r4 weak #10)."""
    from gtos_tpu.data import batchify
    from gtos_tpu.graph.paths import RelationPathConfig
    from gtos_tpu.models.generator import resolve_attention_impl
    from gtos_tpu.train.trainer import Trainer

    small_g, small_t = synthetic_amr_corpus(4, seed=1, min_nodes=4,
                                            max_nodes=9)
    big_g, big_t = synthetic_amr_corpus(2, seed=2, min_nodes=90,
                                        max_nodes=110)
    tv, cv, rv, chv, lm = build_vocabs(small_g + big_g, small_t + big_t)
    pc = RelationPathConfig(max_path_len=3)
    kw = dict(build_block_tiles="auto", build_local_banks="auto")
    b_small = batchify(preprocess(small_g, small_t, pc), tv, cv, rv, chv,
                       lm, batch_size_bucket=4, **kw)
    b_big = batchify(preprocess(big_g, big_t, pc), tv, cv, rv, chv, lm,
                     batch_size_bucket=2, **kw)
    a_small, a_big = b_small.arrays(), b_big.arrays()
    assert "bank_map" in a_small and "tile_src" not in a_small
    assert "bank_map" in a_big and "tile_src" not in a_big
    assert resolve_attention_impl("auto_interpret", a_small) in (
        "pallas_interpret", "pallas_local_interpret")
    # a 2-graph batch has high bank overlap (P_loc ~ P) so the ratio rule
    # may legitimately keep the global kernel — the point is it stays on
    # a DENSE kernel, never the all-pairs tile path
    assert resolve_attention_impl("auto_interpret", a_big) in (
        "pallas_interpret", "pallas_local_interpret")

    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=8, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=128, dropout=0.0,
        attention_impl="auto_interpret")
    arr_small = {k: np.asarray(v) for k, v in a_small.items()}
    arr_big = {k: np.asarray(v) for k, v in a_big.items()}
    tr = Trainer(Generator(cfg), cfg, TrainConfig(warmup_steps=10),
                 arr_small)
    for arrs in (arr_small, arr_big):
        tr.state, m = tr._step_for(arrs)(tr.state, arrs)
        assert np.isfinite(float(m["loss"]))


def test_auto_aux_falls_back_to_tiles_on_local_overflow():
    """A batch whose per-graph path diversity overflows the local-bank
    ladder at a TILE-aligned bucket falls back to the tile layouts
    instead of raising BatchCapacityError, resolve_attention_impl routes
    it to the block-sparse kernel, and the auto train step matches the
    pinned block_sparse model (the dispatch's large-graph escape hatch —
    VERDICT r4 weak #10)."""
    import dataclasses

    from gtos_tpu.data import BucketSpec, batchify
    from gtos_tpu.graph.paths import RelationPathConfig
    from gtos_tpu.models.generator import resolve_attention_impl
    from gtos_tpu.train.trainer import Trainer

    big_g, big_t = synthetic_amr_corpus(2, seed=2, min_nodes=90,
                                        max_nodes=110)
    tv, cv, rv, chv, lm = build_vocabs(big_g, big_t)
    inst = preprocess(big_g, big_t, RelationPathConfig(max_path_len=3))
    # local ladder capped far below the graphs' path diversity
    spec = BucketSpec(local_bank=(128,))
    b = batchify(inst, tv, cv, rv, chv, lm, batch_size_bucket=2, spec=spec,
                 build_block_tiles="auto", build_local_banks="auto")
    a = b.arrays()
    assert "tile_src" in a and "bank_map" not in a
    assert resolve_attention_impl("auto_interpret", a) == \
        "block_sparse_interpret"

    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=8, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=128, dropout=0.0,
        attention_impl="auto_interpret")
    arrs = {k: np.asarray(v) for k, v in a.items()}
    tr = Trainer(Generator(cfg), cfg, TrainConfig(warmup_steps=10), arrs)
    pinned = Generator(dataclasses.replace(
        cfg, attention_impl="block_sparse_interpret"))
    l_pinned = float(pinned.apply(tr.state.params, arrs,
                                  deterministic=True)[0])
    tr.state, m = tr._step_for(arrs)(tr.state, arrs)
    np.testing.assert_allclose(float(m["loss"]), l_pinned, rtol=2e-4)
