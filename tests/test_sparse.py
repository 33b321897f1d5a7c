"""Sparse (edge-list) relation attention + ring context parallelism.

Covers VERDICT r1 items 1-2: COO edge batching, the O(E) sparse encoder
mode, and the ring boundary-exchange schedule — each parity-checked against
the dense path on the virtual 8-CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import batchify
from gtos_tpu.data.dataloader import DataLoader, preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.models import Generator
from gtos_tpu.ops.attention import bank_relation_attention
from gtos_tpu.ops.sparse_relation import (
    flatten_edge_cells, sparse_relation_attention,
)
from gtos_tpu.parallel import make_mesh, ring_sparse_relation_attention
from gtos_tpu.utils.config import ModelConfig


def _random_attention_case(key, B=2, H=2, N=16, D=8, P=11, S=1, p_edge=1.0):
    """Random q/k/v/banks + a random edge set in the batchify cell layout."""
    ks = jax.random.split(key, 7)
    q, k, v = (jax.random.normal(kk, (B, H, N, D)) for kk in ks[:3])
    a_bank = jax.random.normal(ks[3], (P, H, D)) * 0.5
    b_bank = jax.random.normal(ks[4], (P, H, D)) * 0.5
    rel_index = jax.random.randint(ks[5], (B, N, N), 0, P)
    rng = np.random.default_rng(
        int(np.asarray(jax.random.key_data(ks[6]))[-1]))
    keep = rng.random((B, N, N)) < p_edge
    keep |= np.eye(N, dtype=bool)[None]  # every node attends to itself
    # build cells exactly as batchify does
    nl = N // S
    counts = np.zeros((B, S, S), np.int64)
    for b in range(B):
        ii, jj = np.nonzero(keep[b])
        np.add.at(counts[b], (ii // nl, jj // nl), 1)
    Ec = int(counts.max())
    esrc = np.zeros((B, S, S, Ec), np.int32)
    edst = np.zeros((B, S, S, Ec), np.int32)
    erel = np.zeros((B, S, S, Ec), np.int32)
    emask = np.zeros((B, S, S, Ec), bool)
    fill = np.zeros((B, S, S), np.int64)
    ridx = np.asarray(rel_index)
    for b in range(B):
        ii, jj = np.nonzero(keep[b])
        for i, j in zip(ii, jj):
            d, s = i // nl, j // nl
            p = fill[b, d, s]
            esrc[b, d, s, p] = j % nl
            edst[b, d, s, p] = i % nl
            erel[b, d, s, p] = ridx[b, i, j]
            emask[b, d, s, p] = True
            fill[b, d, s] += 1
    edges = tuple(jnp.asarray(x) for x in (esrc, edst, erel, emask))
    return q, k, v, a_bank, b_bank, rel_index, jnp.asarray(keep), edges


def _dense_masked_reference(q, k, v, a_bank, b_bank, rel_index, keep):
    """Dense relation attention with an arbitrary PAIR mask (the sparse
    semantics): softmax over kept pairs only."""
    from gtos_tpu.ops.attention import bank_relation_scores
    e = bank_relation_scores(q, k, a_bank, b_bank, rel_index)
    e = jnp.where(keep[:, None, :, :], e, -1e9)
    attn = jax.nn.softmax(e, axis=-1)
    attn = jnp.where(keep[:, None, :, :], attn, 0.0)
    return jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))


def test_sparse_full_graph_matches_dense():
    """All-pairs edge set (khop=0 equivalent) must reproduce the dense op."""
    q, k, v, a_bank, b_bank, rel_index, keep, edges = _random_attention_case(
        jax.random.PRNGKey(0), p_edge=1.0)
    mask = jnp.ones((q.shape[0], q.shape[2]), bool)
    dense, _ = bank_relation_attention(
        q, k, v, a_bank, b_bank, rel_index, mask)
    src, dst, rel, emask = flatten_edge_cells(*edges, num_nodes=q.shape[2])
    sparse = sparse_relation_attention(
        q, k, v, a_bank, b_bank, src, dst, rel, emask)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_sparse_pruned_matches_masked_dense():
    """A random pruned edge set must equal dense attention masked to the
    same pairs (softmax renormalized over kept keys)."""
    q, k, v, a_bank, b_bank, rel_index, keep, edges = _random_attention_case(
        jax.random.PRNGKey(1), p_edge=0.4)
    ref = _dense_masked_reference(q, k, v, a_bank, b_bank, rel_index, keep)
    src, dst, rel, emask = flatten_edge_cells(*edges, num_nodes=q.shape[2])
    sparse = sparse_relation_attention(
        q, k, v, a_bank, b_bank, src, dst, rel, emask)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("graph_axis", [2, 4])
def test_ring_matches_single_device(graph_axis):
    """The ring CP schedule must be bit-compatible (up to f32 reduction
    order) with the single-device sparse op."""
    S = graph_axis
    q, k, v, a_bank, b_bank, rel_index, keep, edges = _random_attention_case(
        jax.random.PRNGKey(2), N=16, S=S, p_edge=0.5)
    src, dst, rel, emask = flatten_edge_cells(*edges, num_nodes=q.shape[2])
    single = sparse_relation_attention(
        q, k, v, a_bank, b_bank, src, dst, rel, emask)
    mesh = make_mesh(dp=8 // S, mp=1, graph=S)
    ring = ring_sparse_relation_attention(
        mesh, q, k, v, a_bank, b_bank, *edges)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_ring_inside_jit_with_data_axis():
    """The ring op must compose with GSPMD 'data' sharding inside one jit
    (the configuration the sharded train step uses)."""
    S = 2
    q, k, v, a_bank, b_bank, rel_index, keep, edges = _random_attention_case(
        jax.random.PRNGKey(3), B=4, N=8, S=S, p_edge=0.7)
    mesh = make_mesh(dp=2, mp=2, graph=S)
    from jax.sharding import NamedSharding, PartitionSpec as P
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))

    @jax.jit
    def f(q, k, v, a, b, edges):
        out = ring_sparse_relation_attention(mesh, q, k, v, a, b, *edges)
        return out.sum()

    src, dst, rel, emask = flatten_edge_cells(*edges, num_nodes=q.shape[2])
    expect = sparse_relation_attention(
        q, k, v, a_bank, b_bank, src, dst, rel, emask).sum()
    got = f(qs, k, v, a_bank, b_bank, edges)
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)


# ---------------- data layer ----------------


@pytest.fixture(scope="module")
def corpus():
    graphs, targets = synthetic_amr_corpus(8, seed=7, min_nodes=4,
                                           max_nodes=10)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    return graphs, targets, tv, cv, rv, chv, lm, instances


def test_batchify_edges_all_pairs(corpus):
    graphs, targets, tv, cv, rv, chv, lm, instances = corpus
    batch = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                     build_edges=True, cp_shards=1)
    B, S, S2, Ec = batch.edge_src.shape
    assert (B, S, S2) == (4, 1, 1)
    # khop=0: edge count per graph == (real nodes)^2
    n_real = batch.concept_mask.sum(-1)
    counts = batch.edge_mask.reshape(B, -1).sum(-1)
    np.testing.assert_array_equal(counts, n_real ** 2)
    # every (dst, src) pair is a real-node pair and rel matches rel_index
    for b in range(B):
        m = batch.edge_mask[b, 0, 0]
        ii = batch.edge_dst[b, 0, 0][m]
        jj = batch.edge_src[b, 0, 0][m]
        assert batch.concept_mask[b][ii].all()
        assert batch.concept_mask[b][jj].all()
        np.testing.assert_array_equal(
            batch.edge_rel[b, 0, 0][m], batch.rel_index[b][ii, jj])


def test_batchify_edges_khop_prunes(corpus):
    graphs, targets, tv, cv, rv, chv, lm, instances = corpus
    full = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                    build_edges=True, cp_shards=1, sparse_khop=0)
    pruned = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                      build_edges=True, cp_shards=1, sparse_khop=1)
    assert pruned.edge_mask.sum() < full.edge_mask.sum()
    # self + global edges survive pruning: node i has at least edges
    # (i<-i), (i<-0), and 0<-i
    B = pruned.concept_mask.shape[0]
    for b in range(B):
        m = pruned.edge_mask[b, 0, 0]
        ii = pruned.edge_dst[b, 0, 0][m]
        jj = pruned.edge_src[b, 0, 0][m]
        pairs = set(zip(ii.tolist(), jj.tolist()))
        for i in np.nonzero(pruned.concept_mask[b])[0]:
            assert (i, i) in pairs
            assert (i, 0) in pairs and (0, i) in pairs


def test_batchify_edges_cp_cells_consistent(corpus):
    """The S>1 cell layout must contain exactly the same global edges as
    the S=1 layout."""
    graphs, targets, tv, cv, rv, chv, lm, instances = corpus
    flat = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                    build_edges=True, cp_shards=1)
    cells = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                     build_edges=True, cp_shards=4)
    N = flat.concept.shape[1]

    def edge_set(batch):
        src, dst, rel, mask = flatten_edge_cells(
            jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
            jnp.asarray(batch.edge_rel), jnp.asarray(batch.edge_mask), N)
        src, dst, rel, mask = map(np.asarray, (src, dst, rel, mask))
        out = []
        for b in range(src.shape[0]):
            m = mask[b]
            out.append(set(zip(dst[b][m].tolist(), src[b][m].tolist(),
                               rel[b][m].tolist())))
        return out
    assert edge_set(flat) == edge_set(cells)


# ---------------- model integration ----------------


@pytest.fixture(scope="module")
def model_pair(corpus):
    graphs, targets, tv, cv, rv, chv, lm, instances = corpus
    base = dict(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=4, enc_layers=2,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0)
    dense_cfg = ModelConfig(**base, attention_impl="xla")
    sparse_cfg = ModelConfig(**base, attention_impl="sparse")
    batch = batchify(instances[:4], tv, cv, rv, chv, lm, batch_size_bucket=4,
                     build_edges=True, cp_shards=1)
    dense = Generator(dense_cfg)
    params = dense.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.arrays(), deterministic=True)
    return dense, Generator(sparse_cfg), params, batch, instances, \
        (tv, cv, rv, chv, lm)


def test_model_sparse_matches_dense_loss(model_pair):
    """Same params: sparse all-pairs encoder == dense encoder (the padded
    dense rows differ but are masked out of the loss)."""
    dense, sparse, params, batch, instances, vocabs = model_pair
    l_dense, m_dense = dense.apply(params, batch.arrays(),
                                   deterministic=True)
    l_sparse, m_sparse = sparse.apply(params, batch.arrays(),
                                      deterministic=True)
    np.testing.assert_allclose(float(l_sparse), float(l_dense), rtol=1e-4)
    np.testing.assert_allclose(float(m_sparse["acc"]), float(m_dense["acc"]),
                               rtol=1e-4)


def test_model_sparse_cp_matches_single(model_pair):
    """Generator with the ring CP encoder over a real 'graph' mesh axis ==
    single-device sparse, through the FULL model loss and grads."""
    dense, sparse, params, batch, instances, vocabs = model_pair
    tv, cv, rv, chv, lm = vocabs
    S = 2
    cp_batch = batchify(instances[:4], tv, cv, rv, chv, lm,
                        batch_size_bucket=4, build_edges=True, cp_shards=S)
    mesh = make_mesh(dp=2, mp=2, graph=S)
    cp_model = Generator(sparse.cfg, cp_mesh=mesh)

    l_single, _ = sparse.apply(params, batch.arrays(), deterministic=True)
    l_cp, _ = cp_model.apply(params, cp_batch.arrays(), deterministic=True)
    np.testing.assert_allclose(float(l_cp), float(l_single), rtol=1e-4)

    g_single = jax.grad(
        lambda p: sparse.apply(p, batch.arrays(), deterministic=True)[0]
    )(params)
    g_cp = jax.grad(
        lambda p: cp_model.apply(p, cp_batch.arrays(), deterministic=True)[0]
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_cp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("graph_axis", [2, 4])
def test_a2a_matches_single_device(graph_axis):
    """The all-to-all scatter-combine CP schedule (partial softmax stats
    returned to the dst owner in one collective) must match the
    single-device sparse op."""
    from gtos_tpu.parallel.a2a_attention import a2a_sparse_relation_attention

    S = graph_axis
    q, k, v, a_bank, b_bank, rel_index, keep, edges = _random_attention_case(
        jax.random.PRNGKey(6), N=16, S=S, p_edge=0.5)
    src, dst, rel, emask = flatten_edge_cells(*edges, num_nodes=q.shape[2])
    single = sparse_relation_attention(
        q, k, v, a_bank, b_bank, src, dst, rel, emask)
    mesh = make_mesh(dp=8 // S, mp=1, graph=S)
    out = a2a_sparse_relation_attention(
        mesh, q, k, v, a_bank, b_bank, *edges)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_model_sparse_cp_a2a_matches_single(model_pair):
    """Generator with cp_schedule='a2a' over a real 'graph' axis == the
    single-device sparse model, through the full loss and grads."""
    import dataclasses

    dense, sparse, params, batch, instances, vocabs = model_pair
    tv, cv, rv, chv, lm = vocabs
    S = 2
    cp_batch = batchify(instances[:4], tv, cv, rv, chv, lm,
                        batch_size_bucket=4, build_edges=True, cp_shards=S)
    mesh = make_mesh(dp=2, mp=2, graph=S)
    a2a_cfg = dataclasses.replace(sparse.cfg, cp_schedule="a2a")
    cp_model = Generator(a2a_cfg, cp_mesh=mesh)

    l_single, _ = sparse.apply(params, batch.arrays(), deterministic=True)
    l_cp, _ = cp_model.apply(params, cp_batch.arrays(), deterministic=True)
    np.testing.assert_allclose(float(l_cp), float(l_single), rtol=1e-4)

    g_single = jax.grad(
        lambda p: sparse.apply(p, batch.arrays(), deterministic=True)[0]
    )(params)
    g_cp = jax.grad(
        lambda p: cp_model.apply(p, cp_batch.arrays(), deterministic=True)[0]
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_cp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
