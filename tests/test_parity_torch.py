"""Golden-parity tests vs independent PyTorch implementations.

BASELINE.json config 1 ("activations allclose vs reference") — since the
reference mount is empty (SURVEY.md provenance warning), the reference math
is embodied by torch twins that load weights FROM the flax modules and run
the same computation on torch's own kernels (GRU, conv1d, softmax).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.models.encoder import CharCNN, RelationEncoder
from gtos_tpu.models.graph_transformer import RelationMultiheadAttention

from torch_twin import TorchCharCNN, TorchRelationEncoder, TorchRelationMHA


def test_relation_gru_matches_torch():
    vocab, emb, hidden, out = 17, 12, 20, 24
    m = RelationEncoder(relation_vocab=vocab, emb_dim=emb, hidden=hidden,
                        out_dim=out, dropout=0.0)
    rng = np.random.default_rng(0)
    P, L = 9, 6
    bank = rng.integers(1, vocab, size=(P, L)).astype(np.int32)
    lengths = np.array([0, 1, 2, 3, 4, 5, 6, 3, 1], dtype=np.int32)
    params = m.init(jax.random.PRNGKey(0), jnp.array(bank), jnp.array(lengths))
    ours = np.asarray(m.apply(params, jnp.array(bank), jnp.array(lengths)))
    twin = TorchRelationEncoder(
        jax.tree_util.tree_map(np.asarray, params), vocab, emb, hidden, out)
    theirs = twin(bank, lengths)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_relation_mha_matches_torch():
    d_model, heads = 32, 4
    B, N, P, Dr = 2, 7, 11, 16
    m = RelationMultiheadAttention(d_model, heads)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, N, d_model)).astype(np.float32)
    rel_vecs = rng.standard_normal((P, Dr)).astype(np.float32)
    rel_index = rng.integers(0, P, size=(B, N, N)).astype(np.int32)
    node_mask = np.ones((B, N), dtype=bool)
    node_mask[0, 5:] = False
    params = m.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(rel_vecs),
                    jnp.array(rel_index), jnp.array(node_mask))
    ours = np.asarray(m.apply(params, jnp.array(x), jnp.array(rel_vecs),
                              jnp.array(rel_index), jnp.array(node_mask)))
    twin = TorchRelationMHA(
        jax.tree_util.tree_map(np.asarray, params), d_model, heads)
    theirs = twin(x, rel_vecs, rel_index, node_mask)
    # padded-node rows attend to garbage in both impls identically; compare
    # real rows only
    np.testing.assert_allclose(ours[0, :5], theirs[0, :5], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours[1], theirs[1], rtol=1e-4, atol=1e-5)


def test_char_cnn_matches_torch():
    vocab, cd, nf, out = 30, 8, 16, 24
    widths = (3, 5)
    m = CharCNN(char_vocab=vocab, char_dim=cd, filters=nf, widths=widths,
                out_dim=out)
    rng = np.random.default_rng(2)
    B, N, C = 2, 5, 9
    chars = rng.integers(0, vocab, size=(B, N, C)).astype(np.int32)
    chars[0, 0, :] = 0  # an all-pad word (the CLS node case)
    params = m.init(jax.random.PRNGKey(0), jnp.array(chars))
    ours = np.asarray(m.apply(params, jnp.array(chars)))
    twin = TorchCharCNN(jax.tree_util.tree_map(np.asarray, params),
                        vocab, cd, nf, widths, out)
    theirs = twin(chars)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
