"""Ring-CP x block-sparse composition (parallel/ring_block_sparse):
the Pallas tile kernel as the per-ring-step compute, on the virtual CPU
mesh, vs the single-device block-sparse kernel and the XLA sparse path
(VERDICT r2 next #2)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtos_tpu.data import BucketSpec, batchify
from gtos_tpu.data.dataloader import preprocess
from gtos_tpu.data.extract import build_vocabs
from gtos_tpu.data.synthetic import synthetic_amr_corpus
from gtos_tpu.models import Generator
from gtos_tpu.parallel import make_mesh
from gtos_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


SPEC = BucketSpec(nodes=(256,), bank=(16384, 65536))


@pytest.fixture(scope="module")
def big_batches():
    """Two batchify views of the same large-graph instances: cp_shards=2
    (cell tiles + edge cells) and cp_shards=1 (plain tiles)."""
    graphs, targets = synthetic_amr_corpus(2, seed=17, min_nodes=150,
                                           max_nodes=220)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    kw = dict(batch_size_bucket=2, spec=SPEC, build_edges=True,
              build_block_tiles=True, sparse_khop=2)
    b_cp = batchify(instances, tv, cv, rv, chv, lm, cp_shards=2, **kw)
    b_1 = batchify(instances, tv, cv, rv, chv, lm, cp_shards=1, **kw)
    return (tv, cv, rv, chv, lm), b_cp, b_1


def _rand_qkv(batch, H=2, Dh=16, seed=3):
    B, N = batch.concept_mask.shape
    P = batch.rel_bank.shape[0]
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q, k, v = (jax.random.normal(kk, (B, H, N, Dh)) for kk in ks[:3])
    a_bank = jax.random.normal(ks[3], (P, H, Dh)) * 0.5
    b_bank = jax.random.normal(ks[4], (P, H, Dh)) * 0.5
    return q, k, v, a_bank, b_bank


def test_cell_pack_matches_full_pack(big_batches):
    """Reassembling the per-cell tile layout covers exactly the pairs the
    full-tile layout covers."""
    _, b_cp, b_1 = big_batches
    assert b_cp.ctile_src is not None and b_1.tile_src is not None
    B, S, _, Tdl, _ = b_cp.ctile_src.shape
    N = b_cp.rel_index.shape[1]
    Nl = N // S

    def cover(tile_src, tile_rel, base_d, base_s):
        cov = np.full((N, N), -2, np.int64)
        Td, Smax = tile_src.shape
        for d in range(Td):
            for i, s in enumerate(tile_src[d]):
                if s < 0:
                    continue
                cov[base_d + d * 128:base_d + (d + 1) * 128,
                    base_s + s * 128:base_s + (s + 1) * 128] = \
                    tile_rel[d, i]
        return cov

    for b in range(B):
        full = cover(b_1.tile_src[b], b_1.tile_rel[b], 0, 0)
        cell = np.full((N, N), -2, np.int64)
        for d in range(S):
            for s in range(S):
                sub = cover(b_cp.ctile_src[b, d, s],
                            b_cp.ctile_rel[b, d, s], d * Nl, s * Nl)
                m = sub != -2
                cell[m] = sub[m]
        # kept pairs identical (uncovered blocks are empty either way)
        np.testing.assert_array_equal(np.maximum(full, -1),
                                      np.maximum(cell, -1))


def test_ring_block_sparse_matches_single_device(eight_devices, big_batches):
    from gtos_tpu.ops.pallas.block_sparse_attention import (
        block_sparse_relation_attention,
    )
    from gtos_tpu.parallel import ring_block_sparse_relation_attention

    _, b_cp, b_1 = big_batches
    q, k, v, a_bank, b_bank = _rand_qkv(b_cp)
    ref = block_sparse_relation_attention(
        q, k, v, a_bank, b_bank, jnp.asarray(b_1.tile_src),
        jnp.asarray(b_1.tile_rel), interpret=True)

    mesh = make_mesh(dp=1, mp=1, graph=2, devices=eight_devices[:2])
    out = ring_block_sparse_relation_attention(
        mesh, q, k, v, a_bank, b_bank,
        jnp.asarray(b_cp.ctile_src), jnp.asarray(b_cp.ctile_rel),
        jnp.asarray(b_cp.edge_src), jnp.asarray(b_cp.edge_dst),
        jnp.asarray(b_cp.edge_rel), jnp.asarray(b_cp.edge_mask),
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_ring_block_sparse_grads_match_xla(eight_devices, big_batches):
    """Gradients of the composed path (custom VJP through the edge-cell
    XLA ring) vs autodiff of the single-device XLA sparse path."""
    from gtos_tpu.ops.sparse_relation import (
        flatten_edge_cells, sparse_relation_attention,
    )
    from gtos_tpu.parallel import ring_block_sparse_relation_attention

    _, b_cp, b_1 = big_batches
    q, k, v, a_bank, b_bank = _rand_qkv(b_cp)
    mesh = make_mesh(dp=1, mp=1, graph=2, devices=eight_devices[:2])

    def loss_ring(q, k, v, ab, bb):
        o = ring_block_sparse_relation_attention(
            mesh, q, k, v, ab, bb,
            jnp.asarray(b_cp.ctile_src), jnp.asarray(b_cp.ctile_rel),
            jnp.asarray(b_cp.edge_src), jnp.asarray(b_cp.edge_dst),
            jnp.asarray(b_cp.edge_rel), jnp.asarray(b_cp.edge_mask),
            interpret=True)
        return (o.astype(jnp.float32) ** 2).sum()

    fsrc, fdst, frel, fmask = flatten_edge_cells(
        jnp.asarray(b_1.edge_src), jnp.asarray(b_1.edge_dst),
        jnp.asarray(b_1.edge_rel), jnp.asarray(b_1.edge_mask),
        num_nodes=q.shape[2])

    def loss_ref(q, k, v, ab, bb):
        o = sparse_relation_attention(q, k, v, ab, bb, fsrc, fdst, frel,
                                      fmask)
        return (o.astype(jnp.float32) ** 2).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    for name, a, b in zip("qkvab", g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_ring_block_sparse_fused_bwd_grads(eight_devices, big_batches):
    """The FUSED Pallas reverse-accumulation ring backward (rotating dk/dv
    + per-cell two-pass tile backward, VERDICT r3 next #2) produces the
    same gradients as autodiff of the single-device XLA sparse path."""
    from gtos_tpu.ops.sparse_relation import (
        flatten_edge_cells, sparse_relation_attention,
    )
    from gtos_tpu.parallel import ring_block_sparse_relation_attention

    _, b_cp, b_1 = big_batches
    assert b_cp.ctile_dst is not None, "train batches carry ctile_dst"
    q, k, v, a_bank, b_bank = _rand_qkv(b_cp)
    mesh = make_mesh(dp=1, mp=1, graph=2, devices=eight_devices[:2])

    def loss_ring(q, k, v, ab, bb):
        o = ring_block_sparse_relation_attention(
            mesh, q, k, v, ab, bb,
            jnp.asarray(b_cp.ctile_src), jnp.asarray(b_cp.ctile_rel),
            ctile_dst=jnp.asarray(b_cp.ctile_dst),
            ctile_rel_src=jnp.asarray(b_cp.ctile_rel_src),
            interpret=True)
        return (o.astype(jnp.float32) ** 2).sum()

    fsrc, fdst, frel, fmask = flatten_edge_cells(
        jnp.asarray(b_1.edge_src), jnp.asarray(b_1.edge_dst),
        jnp.asarray(b_1.edge_rel), jnp.asarray(b_1.edge_mask),
        num_nodes=q.shape[2])

    def loss_ref(q, k, v, ab, bb):
        o = sparse_relation_attention(q, k, v, ab, bb, fsrc, fdst, frel,
                                      fmask)
        return (o.astype(jnp.float32) ** 2).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, a_bank, b_bank)
    for name, a, b in zip("qkvab", g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_model_block_sparse_cp_trains(eight_devices, big_batches):
    """Full model with impl=block_sparse under a graph=2 mesh: the sharded
    train step runs and matches the single-device loss."""
    from gtos_tpu.parallel import make_sharded_train_step, shard_arrays
    from gtos_tpu.train.optim import make_optimizer
    from gtos_tpu.train.trainer import init_state, make_train_step
    from gtos_tpu.utils.config import TrainConfig

    (tv, cv, rv, chv, lm), b_cp, b_1 = big_batches
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=32, d_ff=64, heads=2, enc_layers=1,
        dec_layers=1, char_dim=8, char_filters=16, rel_emb_dim=8,
        rel_hidden=16, max_oov=16, max_target_len=256, dropout=0.0,
        attention_impl="block_sparse_interpret", sparse_khop=2)
    tcfg = TrainConfig(warmup_steps=100)
    mesh = make_mesh(dp=1, mp=1, graph=2, devices=eight_devices[:2])

    single = Generator(cfg)
    cp_model = Generator(cfg, cp_mesh=mesh)
    tx = make_optimizer(tcfg, cfg.d_model)
    arrays_1 = b_1.arrays()
    arrays_cp = b_cp.arrays()

    state_a = init_state(single, tx, arrays_1, seed=0)
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)
    state_a, m_a = make_train_step(single, tx)(state_a, arrays_1)

    step = make_sharded_train_step(cp_model, tx, mesh, arrays_cp,
                                   example_state=state_b)
    state_b, m_b = step(state_b, shard_arrays(mesh, arrays_cp))
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=2e-4)
