"""Pallas fused relation attention: interpret-mode parity vs the XLA bank
path, gradient flow through the custom_vjp, model-level impl switch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.ops.attention import bank_relation_attention
from gtos_tpu.ops.pallas import (
    pallas_relation_attention, relation_attention_trainable,
)
from gtos_tpu.utils.benchlib import attention_inputs


@pytest.mark.parametrize("N", [16, 128])
@pytest.mark.parametrize("P", [128, 256])
def test_kernel_matches_xla(N, P):
    B, H, Dh = 2, 4, 32
    q, k, v, a_bank, b_bank, idx, mask = attention_inputs(
        jax.random.PRNGKey(0), B, H, N, Dh, P, jnp.float32)
    mask = mask.at[0, N - 3:].set(False)
    out_ref, _ = bank_relation_attention(q, k, v, a_bank, b_bank, idx, mask)
    out_pl, _ = pallas_relation_attention(q, k, v, a_bank, b_bank, idx, mask,
                                          interpret=True)
    # padded-node rows are garbage in both; compare real rows
    np.testing.assert_allclose(
        np.asarray(out_pl[0, :, : N - 3]), np.asarray(out_ref[0, :, : N - 3]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_pl[1]), np.asarray(out_ref[1]), rtol=2e-4, atol=2e-4)


def test_custom_vjp_grads_match_xla():
    B, H, N, Dh, P = 2, 2, 16, 16, 128
    q, k, v, a_bank, b_bank, idx, mask = attention_inputs(
        jax.random.PRNGKey(1), B, H, N, Dh, P, jnp.float32)

    def loss_pl(q, a_bank):
        out = relation_attention_trainable(
            q, k, v, a_bank, b_bank, idx, mask, interpret=True)
        return jnp.sum(out ** 2)

    def loss_xla(q, a_bank):
        out, _ = bank_relation_attention(q, k, v, a_bank, b_bank, idx, mask)
        return jnp.sum(out ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(q, a_bank)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(q, a_bank)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_model_impl_switch():
    """Generator with attention_impl='pallas_interpret' == 'xla'."""
    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.utils.config import ModelConfig
    import dataclasses

    graphs, targets = synthetic_amr_corpus(4, seed=2)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    batch = batchify(preprocess(graphs, targets), tv, cv, rv, chv, lm,
                     batch_size_bucket=4)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    m_xla = Generator(cfg)
    params = m_xla.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    l_xla = float(m_xla.apply(params, batch.arrays(), deterministic=True)[0])
    m_pl = Generator(dataclasses.replace(cfg, attention_impl="pallas_interpret"))
    l_pl = float(m_pl.apply(params, batch.arrays(), deterministic=True)[0])
    np.testing.assert_allclose(l_pl, l_xla, rtol=1e-4)
