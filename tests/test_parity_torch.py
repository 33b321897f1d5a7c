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


def test_decoder_layer_matches_torch():
    import jax.numpy as jnp
    from gtos_tpu.models.decoder import DecoderLayer
    from torch_twin import TorchDecoderLayer

    d_model, heads = 32, 4
    B, T, N = 2, 6, 5
    m = DecoderLayer(d_model, d_ff=64, heads=heads, dropout=0.0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, d_model)).astype(np.float32)
    mem = rng.standard_normal((B, N, d_model)).astype(np.float32)
    mem_mask = np.ones((B, N), dtype=bool)
    mem_mask[0, 3:] = False
    smask = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    params = m.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mem),
                    jnp.array(mem_mask), smask)
    ours, ours_probs = m.apply(params, jnp.array(x), jnp.array(mem),
                               jnp.array(mem_mask), smask)
    twin = TorchDecoderLayer(jax.tree_util.tree_map(np.asarray, params),
                             d_model, heads)
    theirs, theirs_probs = twin(x, mem, mem_mask)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_probs), theirs_probs,
                               rtol=1e-4, atol=1e-5)


def test_copy_mix_matches_torch():
    """The extended-vocab copy mixture scatter == torch scatter_add_."""
    import jax.numpy as jnp
    from torch_twin import torch_copy_mix
    from gtos_tpu.models.generator import _scatter_add_last

    rng = np.random.default_rng(4)
    B, T, V, N, EXT = 2, 4, 10, 6, 14
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    align = rng.random((B, T, 3, N)).astype(np.float32)
    align = align / align.sum(-1, keepdims=True)
    gate = rng.standard_normal((B, T, 1)).astype(np.float32)
    cp_seq = rng.integers(0, EXT, (B, N)).astype(np.int32)
    copy_mask = np.ones((B, N), dtype=bool)
    copy_mask[:, 0] = False

    # jax version of the same mixture (mirrors Generator.ext_log_probs)
    p_vocab = jax.nn.softmax(jnp.array(logits), axis=-1)
    alpha = jnp.mean(jnp.array(align), axis=-2)
    alpha = jnp.where(jnp.array(copy_mask)[:, None, :], alpha, 0.0)
    alpha = alpha / (alpha.sum(-1, keepdims=True) + 1e-9)
    g = jax.nn.sigmoid(jnp.array(gate))
    ext = jnp.zeros((B, T, EXT)).at[..., :V].set(g * p_vocab)
    cp = jnp.broadcast_to(jnp.array(cp_seq)[:, None, :], alpha.shape)
    ext = _scatter_add_last(ext, cp, (1 - g) * alpha)
    ours = np.asarray(jnp.log(ext + 1e-9))

    theirs = torch_copy_mix(logits, align, gate, cp_seq, copy_mask, EXT)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
