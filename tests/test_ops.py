"""Property tests: bank decomposition == dense materialization; sparse ops
== dense masked math on random graphs (SURVEY.md §4 test plan, item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.ops import (
    bank_relation_attention,
    bank_relation_scores,
    dense_relation_scores_reference,
)
from gtos_tpu.ops.attention import masked_softmax
from gtos_tpu.ops.segment import (
    segment_softmax, sparse_graph_attention, sparse_sddmm, sparse_spmm,
)


def _rand_attn_inputs(key, B=2, H=4, N=10, D=8, P=17):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, N, D))
    k = jax.random.normal(ks[1], (B, H, N, D))
    v = jax.random.normal(ks[2], (B, H, N, D))
    a_bank = jax.random.normal(ks[3], (P, H, D))
    b_bank = jax.random.normal(ks[4], (P, H, D))
    rel_index = jax.random.randint(ks[5], (B, N, N), 0, P)
    return q, k, v, a_bank, b_bank, rel_index


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bank_decomposition_matches_dense(seed):
    q, k, v, a_bank, b_bank, rel_index = _rand_attn_inputs(
        jax.random.PRNGKey(seed))
    e_bank = bank_relation_scores(q, k, a_bank, b_bank, rel_index)
    e_dense = dense_relation_scores_reference(q, k, a_bank, b_bank, rel_index)
    np.testing.assert_allclose(np.asarray(e_bank), np.asarray(e_dense),
                               rtol=1e-5, atol=1e-5)


def test_bank_attention_masking():
    q, k, v, a_bank, b_bank, rel_index = _rand_attn_inputs(
        jax.random.PRNGKey(3), B=2, N=8)
    key_mask = jnp.array([[True] * 5 + [False] * 3,
                          [True] * 8])
    out, attn = bank_relation_attention(
        q, k, v, a_bank, b_bank, rel_index, key_mask)
    # no attention mass on masked keys
    assert float(jnp.abs(attn[0, :, :, 5:]).max()) < 1e-6
    # rows sum to 1
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_bank_attention_jits_and_grads():
    q, k, v, a_bank, b_bank, rel_index = _rand_attn_inputs(
        jax.random.PRNGKey(4))
    key_mask = jnp.ones(q.shape[0:1] + q.shape[2:3], dtype=bool)

    @jax.jit
    def loss(q, a_bank):
        out, _ = bank_relation_attention(
            q, k, v, a_bank, b_bank, rel_index, key_mask)
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=(0, 1))(q, a_bank)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    # bank rows that are never referenced get zero grad
    used = set(np.asarray(rel_index).flatten().tolist())
    unused = [p for p in range(a_bank.shape[0]) if p not in used]
    if unused:
        assert float(jnp.abs(g[1][jnp.array(unused)]).max()) == 0.0


def _random_graph_coo(rng, N, E_real, E_pad):
    """dst-sorted COO with padding edges pointing at a real node but masked.

    Edges are deduplicated: the dense reference uses an adjacency mask which
    cannot represent multi-edges."""
    pairs = set()
    while len(pairs) < E_real:
        pairs.add((int(rng.integers(0, N)), int(rng.integers(0, N))))
    pairs = sorted(pairs, key=lambda p: p[1])
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    src = np.concatenate([src, np.zeros(E_pad, dtype=np.int64)])
    dst = np.concatenate([dst, np.full(E_pad, N - 1, dtype=np.int64)])
    order = np.argsort(dst, kind="stable")
    mask = np.concatenate([np.ones(E_real, bool), np.zeros(E_pad, bool)])
    return (jnp.array(src[order], jnp.int32), jnp.array(dst[order], jnp.int32),
            jnp.array(mask[order]))


@pytest.mark.parametrize("seed", [0, 1])
def test_sparse_attention_matches_dense_masked(seed):
    rng = np.random.default_rng(seed)
    N, D, E_real, E_pad = 12, 8, 30, 6
    src, dst, emask = _random_graph_coo(rng, N, E_real, E_pad)
    key = jax.random.PRNGKey(seed)
    q, k, v = (jax.random.normal(kk, (N, D)) for kk in jax.random.split(key, 3))

    out_sparse = sparse_graph_attention(q, k, v, src, dst, emask, N)

    # dense reference: adjacency-masked softmax attention; nodes with no
    # in-edges produce zero output in the sparse path.
    adj = np.full((N, N), False)
    srcs, dsts = np.asarray(src), np.asarray(dst)
    for e in range(len(srcs)):
        if bool(np.asarray(emask)[e]):
            adj[dsts[e], srcs[e]] = True
    scores = np.asarray(q @ k.T) * (D ** -0.5)
    scores = np.where(adj, scores, -1e9)
    dense = np.zeros((N, D))
    for i in range(N):
        if adj[i].any():
            w = np.exp(scores[i] - scores[i].max())
            w = np.where(adj[i], w, 0.0)
            w = w / w.sum()
            dense[i] = w @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out_sparse), dense, rtol=2e-4, atol=2e-4)


def test_segment_softmax_normalizes():
    scores = jnp.array([1.0, 2.0, 3.0, 0.5, 0.5])
    seg = jnp.array([0, 0, 1, 1, 1])
    w = segment_softmax(scores, seg, 2)
    np.testing.assert_allclose(float(w[:2].sum()), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(w[2:].sum()), 1.0, atol=1e-6)
