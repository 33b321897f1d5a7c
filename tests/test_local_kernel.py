"""Localized relation-attention kernels (ops/pallas/local_relation_attention)
vs the XLA bank decomposition: forward and gradients, plus the model-level
pallas_local impl vs xla (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.ops.attention import bank_relation_attention
from gtos_tpu.ops.pallas.local_relation_attention import (
    local_relation_attention, local_relation_attention_trainable,
)


def sort_bnd(ix, P_loc):
    """Host reference for batchify's sorted-scatter auxiliaries."""
    Bb, Nn, _ = ix.shape
    srt = np.argsort(ix, axis=2, kind="stable").astype(np.int32)
    off = (np.arange(Bb * Nn, dtype=np.int64) * P_loc).reshape(Bb, Nn, 1)
    cnt = np.bincount((ix.astype(np.int64) + off).ravel(),
                      minlength=Bb * Nn * P_loc)
    bnd = np.cumsum(cnt.reshape(Bb, Nn, P_loc), axis=2).astype(np.int32)
    return srt, bnd


def build_case(B, H, N, Dh, P, P_loc, seed=0):
    rng = np.random.default_rng(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q, k, v = (jax.random.normal(kk, (B, H, N, Dh)) for kk in ks[:3])
    a_bank = jax.random.normal(ks[3], (P, H, Dh)) * 0.5
    b_bank = jax.random.normal(ks[4], (P, H, Dh)) * 0.5
    bank_map = np.zeros((B, P_loc), np.int32)
    idx_loc = np.zeros((B, N, N), np.int32)
    rel_index = np.zeros((B, N, N), np.int32)
    for b in range(B):
        nloc = rng.integers(P_loc // 2, P_loc)
        rows = np.concatenate(
            [[0], np.sort(rng.choice(np.arange(1, P), nloc - 1,
                                     replace=False))])
        bank_map[b, :nloc] = rows
        il = rng.integers(0, nloc, (N, N))
        idx_loc[b] = il
        rel_index[b] = rows[il]
    mask = np.ones((B, N), bool)
    mask[0, N - 5:] = False
    srt, bnd = sort_bnd(idx_loc, P_loc)
    srtT, bndT = sort_bnd(
        np.ascontiguousarray(idx_loc.transpose(0, 2, 1)), P_loc)
    j = jnp.asarray
    return (q, k, v, a_bank, b_bank, j(rel_index), j(mask), j(bank_map),
            j(idx_loc), j(srt), j(bnd), j(srtT), j(bndT))


@pytest.mark.parametrize("B,H,N,Dh,P,P_loc", [
    (2, 2, 32, 16, 200, 128),
    (2, 2, 16, 16, 600, 512),
    (1, 3, 64, 32, 300, 256),
])
def test_localized_forward_matches_dense(B, H, N, Dh, P, P_loc):
    (q, k, v, a_bank, b_bank, rel_index, mask, bank_map, idx_loc,
     *_aux) = build_case(B, H, N, Dh, P, P_loc)
    ref, _ = bank_relation_attention(q, k, v, a_bank, b_bank, rel_index,
                                     mask)
    out = local_relation_attention(
        q, k, v, a_bank[bank_map], b_bank[bank_map], idx_loc, mask,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,H,N,Dh,P,P_loc", [
    (2, 2, 32, 16, 200, 128),
    (1, 3, 64, 32, 300, 256),
])
def test_localized_grads_match_dense_vjp(B, H, N, Dh, P, P_loc):
    """Grads wrt q, k, v AND both GLOBAL banks: the sorted-scatter backward
    plus the bank_map gather's XLA scatter-add must reproduce autodiff of
    the dense reference."""
    (q, k, v, a_bank, b_bank, rel_index, mask, bank_map, idx_loc,
     srt, bnd, srtT, bndT) = build_case(B, H, N, Dh, P, P_loc)

    def loss_kernel(q, k, v, ab, bb):
        o = local_relation_attention_trainable(
            q, k, v, ab[bank_map], bb[bank_map], idx_loc, mask,
            srt, bnd, srtT, bndT, interpret=True)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v, ab, bb):
        o, _ = bank_relation_attention(q, k, v, ab, bb, rel_index, mask)
        return (o.astype(jnp.float32) ** 2).sum()

    g_k = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    for name, a, b in zip("qkvab", g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_model_pallas_local_matches_xla():
    """Full-model loss and gradients agree between attention_impl=xla and
    pallas_local on real batchify output with build_local_banks."""
    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.utils.config import ModelConfig

    graphs, targets = synthetic_amr_corpus(8, seed=11, min_nodes=3,
                                           max_nodes=8)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=8,
                     build_local_banks=True)
    arrays = batch.arrays()
    # the sorted-scatter aux are device-computed now, not batch fields
    assert "bank_map" in arrays and "rel_sort" not in arrays
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=2,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0,
        attention_impl="pallas_local_interpret")
    model = Generator(cfg)
    xla_model = Generator(dataclasses.replace(cfg, attention_impl="xla"))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        arrays, deterministic=True)

    def gloss(m):
        def f(p):
            return m.apply(p, arrays, deterministic=True)[0]
        return jax.jit(jax.value_and_grad(f))(params)

    (l_loc, g_loc), (l_xla, g_xla) = gloss(model), gloss(xla_model)
    np.testing.assert_allclose(float(l_loc), float(l_xla), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_loc),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_inference_batch_forward_only():
    """for_train=False batches carry bank_map/rel_index_loc; the model
    computes the sorted-scatter aux on device (DCE'd in no-grad
    programs), so inference batches are trainable too."""
    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.utils.config import ModelConfig

    graphs, targets = synthetic_amr_corpus(4, seed=13, min_nodes=3,
                                           max_nodes=6)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=4,
                     for_train=False, build_local_banks=True)
    assert batch.bank_map is not None and batch.rel_sort is None
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=32, dropout=0.0,
        attention_impl="pallas_local_interpret")
    model = Generator(cfg)
    arrays = batch.arrays()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        arrays, deterministic=True)
    loss, metrics = model.apply(params, arrays, deterministic=True)
    assert np.isfinite(float(loss))


def test_fwd_only_grad_raises_typed_error():
    """Differentiating the inference (fwd-only) localized path raises a
    typed message, not an opaque Pallas failure (VERDICT r3 weak #9)."""
    from gtos_tpu.ops.pallas.local_relation_attention import (
        local_relation_attention_fwd_only,
    )

    (q, k, v, a_bank, b_bank, rel_index, mask, bank_map, idx_loc,
     *_aux) = build_case(2, 2, 32, 16, 200, 128)

    def loss(q):
        o = local_relation_attention_fwd_only(
            True, q, k, v, a_bank[bank_map], b_bank[bank_map], idx_loc,
            mask)
        return (o.astype(jnp.float32) ** 2).sum()

    # forward works
    assert np.isfinite(float(loss(q)))
    with pytest.raises(TypeError, match="device_sort_bnd"):
        jax.grad(loss)(q)


def test_device_sort_bnd_matches_host():
    """device_sort_bnd reproduces the host sort_bnd arrays bit-exactly
    (the contract that let batchify stop building/shipping them)."""
    from gtos_tpu.data import BucketSpec
    from gtos_tpu.data.batching import _build_local_banks
    from gtos_tpu.ops.pallas.local_relation_attention import device_sort_bnd

    rng = np.random.default_rng(3)
    B, N, P = 4, 16, 128
    # realistic slot matrix: small contiguous per-graph widths incl. 0s
    idx = np.zeros((B, N, N), np.int32)
    for b in range(B):
        w = int(rng.integers(5, 100))
        idx[b, :12, :12] = rng.integers(0, w, (12, 12))
    spec = BucketSpec(local_bank=(P,))
    host = _build_local_banks(idx, spec, for_train=True)
    srt, bnd = device_sort_bnd(jnp.asarray(host["rel_index_loc"]), P)
    np.testing.assert_array_equal(np.asarray(srt), host["rel_sort"])
    np.testing.assert_array_equal(np.asarray(bnd), host["rel_bnd"])
    srtT, bndT = device_sort_bnd(
        jnp.swapaxes(jnp.asarray(host["rel_index_loc"]), 1, 2), P)
    np.testing.assert_array_equal(np.asarray(srtT), host["rel_sortT"])
    np.testing.assert_array_equal(np.asarray(bndT), host["rel_bndT"])


def test_localize_bank_scatter_free_grads_match_gather():
    """ops/localize.py: the scatter-free backward (permute + blocked
    prefix sum + boundary gathers) matches the plain gather's XLA
    scatter-add VJP, including colliding rows across graphs and pad
    slots mapping to row 0."""
    from gtos_tpu.ops.localize import build_localize_aux, localize_bank

    rng = np.random.default_rng(0)
    B, P_loc, P, D = 5, 96, 300, 24  # B*P_loc not a multiple of 128
    bank_map = np.zeros((B, P_loc), np.int32)
    for b in range(B):
        n = rng.integers(10, P_loc)
        rows = np.unique(rng.integers(0, P, size=n))
        bank_map[b, 1:1 + len(rows)] = rows  # slot 0 stays the pad row 0
    perm, bnd = build_localize_aux(bank_map, P)

    rel_vecs = jnp.asarray(rng.standard_normal((P, D)), jnp.float32)
    bm = jnp.asarray(bank_map)
    g_out = jnp.asarray(rng.standard_normal((B, P_loc, D)), jnp.float32)

    def loss(fn):
        return lambda rv: (fn(rv) * g_out).sum()

    ref = jax.grad(loss(lambda rv: rv[bm]))(rel_vecs)
    new = jax.grad(loss(lambda rv: localize_bank(
        rv, bm, jnp.asarray(perm), jnp.asarray(bnd))))(rel_vecs)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # forwards identical
    np.testing.assert_array_equal(
        np.asarray(localize_bank(rel_vecs, bm, jnp.asarray(perm),
                                 jnp.asarray(bnd))),
        np.asarray(rel_vecs[bm]))


def test_batchify_ships_localize_aux_for_train_only():
    """Train batches carry loc_perm/loc_bnd sized to the flat bank_map /
    bank; inference batches do not (fwd-only path needs no backward)."""
    from gtos_tpu.data import batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus

    graphs, targets = synthetic_amr_corpus(6, seed=3, min_nodes=3,
                                           max_nodes=8)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    tb = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=6,
                  build_local_banks=True)
    assert tb.loc_perm.shape == (tb.bank_map.size,)
    assert tb.loc_bnd.shape == (2, tb.rel_bank.shape[0])
    # boundaries partition the sorted ids: widths sum to the update count
    widths = tb.loc_bnd[1] - tb.loc_bnd[0]
    assert widths.sum() == tb.bank_map.size
    srt = tb.bank_map.reshape(-1)[tb.loc_perm]
    assert (np.diff(srt) >= 0).all()
    ib = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=6,
                  build_local_banks=True, for_train=False)
    assert ib.loc_perm is None and ib.loc_bnd is None
