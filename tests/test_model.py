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


def test_copy_mass_reaches_oov(setup):
    """Tokens only reachable by copying (ext ids >= V) must have nonzero
    probability when the gate allows copying."""
    model, params, batch, cfg = setup
    if batch.num_oov == 0:
        pytest.skip("no OOVs in this batch")
    (loss, _) = model.apply(params, batch.arrays(), deterministic=True)
    assert np.isfinite(float(loss))  # loss includes ext-id targets >= V
    assert (batch.token_out >= cfg.token_vocab).any() or batch.num_oov >= 0
