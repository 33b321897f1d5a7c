"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 item c):
sharded DP/TP/CP train steps == single-device step; kernel impls compose
with GSPMD meshes; beam decode runs under a CP mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import batchify
from gtos_tpu.data.dataloader import preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.models import Generator
from gtos_tpu.parallel import (
    make_mesh, make_sharded_train_step, shard_arrays,
)
from gtos_tpu.parallel.mesh import arrays_shardings
from gtos_tpu.train.optim import make_optimizer
from gtos_tpu.train.trainer import init_state, make_train_step
from gtos_tpu.utils.config import ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_mesh_shapes(eight_devices):
    mesh = make_mesh(dp=4, mp=1, graph=2, devices=eight_devices)
    assert mesh.shape == {"data": 4, "model": 1, "graph": 2}
    mesh = make_mesh(devices=eight_devices)  # auto dp
    assert mesh.shape["data"] == 8


def test_sharded_train_step_matches_single(eight_devices):
    graphs, targets = synthetic_amr_corpus(8, seed=9, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8)
    arrays = batch.arrays()
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    tcfg = TrainConfig(warmup_steps=100)
    model = Generator(cfg)
    tx = make_optimizer(tcfg, cfg.d_model)

    state_a = init_state(model, tx, arrays, seed=0)
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)

    single_step = make_train_step(model, tx)
    state_a, m_a = single_step(state_a, arrays)

    mesh = make_mesh(dp=8, devices=eight_devices)
    sharded_step = make_sharded_train_step(model, tx, mesh, arrays)
    dev_arrays = shard_arrays(mesh, arrays)
    state_b, m_b = sharded_step(state_b, dev_arrays)

    # loss and gradient norm must agree between 1-device and 8-device DP
    # (post-Adam params are NOT compared: Adam normalizes near-zero grads by
    # their own magnitude, amplifying reduction-order float noise to O(lr))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-4)

    # gradients themselves agree to float tolerance
    def grads_of(arrs):
        def loss_fn(p):
            return model.apply(p, arrs, deterministic=True)[0]
        return jax.grad(loss_fn)(state_b.params)

    g_single = grads_of(arrays)
    g_sharded = jax.jit(
        grads_of, in_shardings=(arrays_shardings(mesh, arrays),),
    )(dev_arrays)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_tensor_parallel_matches_single(eight_devices):
    """TP (model axis) + DP composed: loss/grad_norm match the 1-device
    step; params and Adam moments actually land sharded."""
    from gtos_tpu.parallel import shard_state, state_shardings

    graphs, targets = synthetic_amr_corpus(8, seed=3, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8)
    arrays = batch.arrays()
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    tcfg = TrainConfig(warmup_steps=100)
    model = Generator(cfg)
    tx = make_optimizer(tcfg, cfg.d_model)

    state_a = init_state(model, tx, arrays, seed=0)
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)

    single_step = make_train_step(model, tx)
    state_a, m_a = single_step(state_a, arrays)

    mesh = make_mesh(dp=4, mp=2, devices=eight_devices)
    sharded_step = make_sharded_train_step(model, tx, mesh, arrays,
                                           example_state=state_b)
    state_b = shard_state(mesh, state_b)
    dev_arrays = shard_arrays(mesh, arrays)
    state_b, m_b = sharded_step(state_b, dev_arrays)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-4)

    # the q projection kernel must actually be sharded over 'model'
    shardings = state_shardings(mesh, state_b)
    qk = shardings.params["params"]["graph_transformer"]["layer0"][
        "self_attn"]["q_proj"]["kernel"]
    assert qk.spec == jax.sharding.PartitionSpec(None, "model")
    # and the relation encoder's out_proj must NOT be row-sharded
    rk = shardings.params["params"]["relation_encoder"]["out_proj"]["kernel"]
    assert rk.spec == jax.sharding.PartitionSpec()
    # gradients computed under TP sharding match single-device gradients
    # (post-Adam params are not compared, same rationale as the DP test)
    params0 = init_state(model, tx, arrays, seed=0).params

    def grads_of(p, arrs):
        def loss_fn(p):
            return model.apply(p, arrs, deterministic=True)[0]
        return jax.grad(loss_fn)(p)

    g_single = grads_of(params0, arrays)
    g_tp = jax.jit(
        grads_of,
        in_shardings=(state_shardings(mesh, params0),
                      arrays_shardings(mesh, arrays)),
    )(shard_state(mesh, params0), dev_arrays)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_pallas_impl_composes_with_dp_mesh(eight_devices):
    """The Pallas encoder kernel must run inside the GSPMD-sharded train
    step (batch over 'data') and match the single-device loss."""
    import dataclasses

    graphs, targets = synthetic_amr_corpus(8, seed=12, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8)
    arrays = batch.arrays()
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0,
        attention_impl="pallas_interpret")
    tcfg = TrainConfig(warmup_steps=100)
    model = Generator(cfg)
    tx = make_optimizer(tcfg, cfg.d_model)

    state_a = init_state(model, tx, arrays, seed=0)
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)
    single_step = make_train_step(model, tx)
    state_a, m_a = single_step(state_a, arrays)

    mesh = make_mesh(dp=8, mp=1, graph=1, devices=eight_devices)
    sharded_step = make_sharded_train_step(model, tx, mesh, arrays,
                                           example_state=state_b)
    from gtos_tpu.parallel import shard_arrays
    state_b, m_b = sharded_step(state_b, shard_arrays(mesh, arrays))
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-5)


def _tiny_cfg(tv, cv, rv, chv, **kw):
    return ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0, **kw)


def test_block_sparse_impl_composes_with_dp_mesh(eight_devices):
    """The block-sparse tile kernel (and its tile_dst/tile_rel_src bwd
    layout) must run inside the GSPMD DP-sharded train step without
    replicating the tile tensors per device (VERDICT r2 weak #4)."""
    graphs, targets = synthetic_amr_corpus(8, seed=21, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8,
                     build_edges=True, build_block_tiles=True)
    arrays = batch.arrays()
    cfg = _tiny_cfg(tv, cv, rv, chv,
                    attention_impl="block_sparse_interpret")
    tcfg = TrainConfig(warmup_steps=100)
    model = Generator(cfg)
    tx = make_optimizer(tcfg, cfg.d_model)

    state_a = init_state(model, tx, arrays, seed=0)
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)
    single_step = make_train_step(model, tx)
    state_a, m_a = single_step(state_a, arrays)

    mesh = make_mesh(dp=8, mp=1, graph=1, devices=eight_devices)
    # the tile tensors must be DP-sharded on the batch dim, not replicated
    sh = arrays_shardings(mesh, arrays)
    for name in ("tile_src", "tile_rel", "tile_dst", "tile_rel_src"):
        assert sh[name].spec[0] == "data", (name, sh[name].spec)
    sharded_step = make_sharded_train_step(model, tx, mesh, arrays,
                                           example_state=state_b)
    state_b, m_b = sharded_step(state_b, shard_arrays(mesh, arrays))
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-5)


def test_beam_decode_under_cp_mesh(eight_devices):
    """Beam decode (the dev-BLEU hook's compute) through a model whose
    encoder runs ring-CP over the 'graph' axis: compiles, runs, and emits
    the same hypotheses as the single-device sparse model (VERDICT r2
    weak #11)."""
    from gtos_tpu.infer.decode import decode_batch

    graphs, targets = synthetic_amr_corpus(6, seed=31, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8,
                     build_edges=True, cp_shards=2)
    cfg = _tiny_cfg(tv, cv, rv, chv, attention_impl="sparse")
    mesh = make_mesh(dp=2, mp=2, graph=2, devices=eight_devices)

    model_single = Generator(cfg)
    model_cp = Generator(cfg, cp_mesh=mesh)
    params = model_single.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)

    hyps_single = decode_batch(model_single, params, batch, tv,
                               beam_size=2, max_steps=8)
    hyps_cp = decode_batch(model_cp, params, batch, tv,
                           beam_size=2, max_steps=8)
    assert hyps_cp == hyps_single


def test_auto_impl_under_dp_mesh(eight_devices):
    """attention_impl='auto' dispatches per batch UNDER A DP MESH (VERDICT
    r4 weak #4): the lazily-built per-impl sharded steps share one
    TrainState and produce the pinned impl's sharded loss."""
    import dataclasses

    from gtos_tpu.data import BucketSpec
    from gtos_tpu.models.generator import resolve_attention_impl
    from gtos_tpu.train.trainer import Trainer

    graphs, targets = synthetic_amr_corpus(8, seed=11, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8,
                     spec=BucketSpec(bank=(1024,), local_bank=(128,)),
                     build_local_banks=True)
    arrays = batch.arrays()
    resolved = resolve_attention_impl("auto_interpret", arrays)
    assert resolved == "pallas_local_interpret"

    cfg = _tiny_cfg(tv, cv, rv, chv, attention_impl="auto_interpret")
    tcfg = TrainConfig(warmup_steps=100)
    mesh = make_mesh(dp=4, devices=eight_devices[:4])
    trainer = Trainer(Generator(cfg), cfg, tcfg, arrays, mesh=mesh)
    state0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    trainer.state)
    step = trainer._step_for(arrays)
    new_state, metrics = step(trainer.state, trainer._put(arrays))
    trainer.state = new_state
    assert list(trainer._steps) == [resolved]
    assert np.isfinite(float(metrics["loss"]))

    # the pinned resolved impl's sharded step from the same init produces
    # the same loss/grad_norm
    from gtos_tpu.train.trainer import TrainState
    pinned = Generator(dataclasses.replace(cfg, attention_impl=resolved))
    tx = make_optimizer(tcfg, cfg.d_model)
    pinned_step = make_sharded_train_step(pinned, tx, mesh, arrays)
    _, m_b = pinned_step(TrainState(**state0.__dict__)
                         if not isinstance(state0, TrainState) else state0,
                         shard_arrays(mesh, arrays))
    np.testing.assert_allclose(float(metrics["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-4)

    # eval under the mesh dispatches per impl too
    ev = trainer._eval_step_for(arrays)(trainer.state.params,
                                        trainer._put(arrays))
    assert np.isfinite(float(ev["loss"]))
