"""Model-level tests: init, loss, shapes, incremental-vs-teacher-forced
consistency, copy distribution properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import batchify
from gtos_tpu.data.dataloader import preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.models import Generator
from gtos_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def setup():
    graphs, targets = synthetic_amr_corpus(6, seed=0)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=64, d_ff=128, heads=4,
        enc_layers=2, dec_layers=2, char_dim=16, char_filters=32,
        rel_emb_dim=16, rel_hidden=32, max_oov=16, max_target_len=32,
        dropout=0.1)
    model = Generator(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    return model, params, batch, cfg


def test_loss_finite_and_improvable(setup):
    model, params, batch, cfg = setup
    (loss, metrics) = model.apply(params, batch.arrays(), deterministic=True)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    # gradient flows to every parameter group
    def loss_fn(p):
        l, _ = model.apply(p, batch.arrays(), deterministic=True)
        return l
    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
    assert nonzero > len(flat) * 0.75


def test_ext_log_probs_normalized(setup):
    model, params, batch, cfg = setup
    arrays = batch.arrays()
    mem = model.apply(params, arrays["concept"], arrays["concept_char"],
                      arrays["concept_mask"], arrays["rel_bank"],
                      arrays["rel_length"], arrays["rel_index"],
                      True, method=Generator.encode)
    h, align = model.apply(params, arrays["token_in"], mem,
                           arrays["concept_mask"], True,
                           method=lambda m, *a: m.decoder(*a))
    align_t = jnp.transpose(align, (0, 2, 1, 3))
    logp = model.apply(params, h, align_t, arrays["cp_seq"],
                       arrays["copy_mask"], method=Generator.ext_log_probs)
    total = jnp.exp(logp).sum(-1)
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-3)


def test_incremental_matches_teacher_forced(setup):
    """decode_step with KV cache must reproduce the full forward pass
    (deterministic), position by position."""
    model, params, batch, cfg = setup
    arrays = batch.arrays()
    mem = model.apply(params, arrays["concept"], arrays["concept_char"],
                      arrays["concept_mask"], arrays["rel_bank"],
                      arrays["rel_length"], arrays["rel_index"],
                      True, method=Generator.encode)
    # full teacher-forced
    h_full, align_full = model.apply(
        params, arrays["token_in"], mem, arrays["concept_mask"], True,
        method=lambda m, *a: m.decoder(*a))
    align_t = jnp.transpose(align_full, (0, 2, 1, 3))
    logp_full = model.apply(params, h_full, align_t, arrays["cp_seq"],
                            arrays["copy_mask"], method=Generator.ext_log_probs)

    # incremental
    caches = model.apply(params, mem, method=Generator.init_cache)
    T = min(5, arrays["token_in"].shape[1])
    for t in range(T):
        logp_t, caches = model.apply(
            params, arrays["token_in"][:, t], t, caches,
            arrays["concept_mask"], arrays["cp_seq"], arrays["copy_mask"],
            method=Generator.decode_step)
        np.testing.assert_allclose(
            np.asarray(logp_t), np.asarray(logp_full[:, t]),
            rtol=2e-3, atol=2e-3,
            err_msg=f"incremental/teacher-forced mismatch at t={t}")


@pytest.fixture(scope="module")
def oov_setup():
    """A constructed batch with a FORCED copy-only OOV target: the concept
    'zorblat' copies to the surface token 'zorblat', which is absent from
    the token vocab, so the only way to emit it is the extended-id copy
    path (the mechanism that drives AMR BLEU — SURVEY.md §2.2 decoder row)."""
    from gtos_tpu.graph.ir import Graph

    graphs, targets = synthetic_amr_corpus(6, seed=0)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    assert "zorblat" not in tv.stoi
    g = Graph(nodes=["zorblat", "boy"], edges=[(0, "ARG0", 1)])
    insts = preprocess([g], [["zorblat", "boy"]])
    batch = batchify(insts, tv, cv, rv, chv, lm, batch_size_bucket=1)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=64, d_ff=128, heads=4,
        enc_layers=1, dec_layers=1, char_dim=16, char_filters=32,
        rel_emb_dim=16, rel_hidden=32, max_oov=16, max_target_len=32,
        dropout=0.0)
    model = Generator(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    return model, params, batch, cfg, tv


def test_copy_mass_reaches_oov(oov_setup):
    """The extended ids past the token vocab must carry real probability
    mass from the copy distribution even at random init."""
    model, params, batch, cfg, tv = oov_setup
    V = cfg.token_vocab
    assert batch.num_oov == 1
    assert batch.oov_lists[0] == ["zorblat"]
    # 'zorblat' appears in the target as an extended id
    assert (batch.token_out >= V).any()
    # and in cp_seq at the node that copies to it
    assert (batch.cp_seq == V).any()

    arrays = batch.arrays()
    mem = model.apply(params, arrays["concept"], arrays["concept_char"],
                      arrays["concept_mask"], arrays["rel_bank"],
                      arrays["rel_length"], arrays["rel_index"],
                      True, method=Generator.encode)
    h, align = model.apply(params, arrays["token_in"], mem,
                           arrays["concept_mask"], True,
                           method=lambda m, *a: m.decoder(*a))
    align_t = jnp.transpose(align, (0, 2, 1, 3))
    logp = model.apply(params, h, align_t, arrays["cp_seq"],
                       arrays["copy_mask"], method=Generator.ext_log_probs)
    p_ext = np.asarray(jnp.exp(logp))[..., V]  # prob of the OOV ext id
    # gate ~ 0.5 at init and alpha spreads over a handful of nodes, so the
    # copy path must put clearly-nonzero mass here (EPS floor is 1e-9)
    assert p_ext.max() > 1e-4, p_ext.max()


def test_copy_oov_end_to_end(oov_setup):
    """Overfit on the single OOV instance: beam search must emit the
    extended id and detokenize must restore the OOV string."""
    import optax

    from gtos_tpu.infer.decode import beam_decode_arrays, decode_batch

    model, params, batch, cfg, tv = oov_setup
    V = cfg.token_vocab
    arrays = batch.arrays()
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss, _ = model.apply(p, arrays, deterministic=True)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.5, float(loss)

    res = beam_decode_arrays(model, params, arrays, beam_size=2, max_steps=8,
                             str_id=tv.str_id, end_id=tv.end_id,
                             unk_id=tv.unk_id)
    seqs = np.asarray(res.seqs)
    assert (seqs[0, 0] >= V).any(), "beam never emitted an extended id"
    hyps = decode_batch(model, params, batch, tv, beam_size=2, max_steps=8)
    assert "zorblat" in hyps[0], hyps[0]


def test_copy_onehot_matches_scatter():
    """copy_impl='onehot' (one-hot MXU matmul) reproduces the scatter-add
    reference's loss and gradients (bf16-rounded alpha tolerance) —
    train_step_breakdown.json r5: the scatter VJP was 1.5 ms/step."""
    import dataclasses

    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus

    graphs, targets = synthetic_amr_corpus(8, seed=21, min_nodes=3,
                                           max_nodes=8)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8)
    arrays = batch.arrays()
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0,
        copy_impl="scatter")
    m_sc = Generator(cfg)
    m_oh = Generator(dataclasses.replace(cfg, copy_impl="onehot"))
    params = m_sc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        arrays, deterministic=True)

    def gloss(m):
        def f(p):
            return m.apply(p, arrays, deterministic=True)[0]
        return jax.jit(jax.value_and_grad(f))(params)

    (l_sc, g_sc), (l_oh, g_oh) = gloss(m_sc), gloss(m_oh)
    np.testing.assert_allclose(float(l_oh), float(l_sc), rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_oh),
                    jax.tree_util.tree_leaves(g_sc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-3)
