"""Bank localization with a scatter-free backward.

The pallas_local encoder gathers the GRU's relation vectors into per-graph
banks once per step (`rel_vecs[bank_map]` — graph_transformer.py, reference
counterpart: the per-pair relation embedding lookup in jcyk/gtos's
RelationMultiheadAttention, SURVEY.md §3.4). The gather's transpose is a
[B*P_loc, D] -> [P, D] scatter-add, which XLA serializes over colliding
rows: 0.59 ms at the dominant production bucket (B=32, P_loc=768, P=16384,
D=512 on v5e — benchmarks/localize_vjp.json).

This module re-expresses that scatter with the same sort-order trick the
localized kernel uses in-kernel (ops/pallas/local_relation_attention.py):
permute the flat cotangent rows into bank-row order, take a blocked
inclusive prefix sum (128-row lower-triangular matmul on the MXU + a tiny
block-carry cumsum), and read each bank row's total as a difference of two
boundary gathers — no scatter at all. Measured 0.32 ms (1.8x) on the same
inputs, bit-exact vs the XLA scatter in f32 (localize_vjp.json).

The sort permutation and boundaries depend only on `bank_map`, which is
host data: batchify precomputes them (`loc_perm` [B*P_loc] int32,
`loc_bnd` [2, P] int32 — ~260 KB per batch) because an on-device argsort
of the 24k ids measured 3.5 ms, 6x the scatter it would replace. Batches
without the auxiliaries (inference, hand-built arrays) fall back to the
plain gather whose VJP is the XLA scatter-add.

Sharding note: under a DP mesh the flat permutation mixes rows across the
batch axis, so GSPMD resolves the backward's `g[perm]` gather with a
collective over the batch shards (~50 MB f32 at the dominant bucket). The
grad target [P, D] is replicated and psum'd either way; on a single chip
(where this path's cost was measured) no collective exists.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def build_localize_aux(bank_map: np.ndarray, P: int):
    """Host-side auxiliaries for the scatter-free localize backward.

    bank_map: [B, P_loc] int32 global bank row per local slot (rows sorted
    ascending per graph — np.unique order; pad slots map to row 0).
    Returns (loc_perm [B*P_loc] int32, loc_bnd [2, P] int32) with
    loc_bnd[0/1][p] = start/end of bank row p's run in the sorted flat ids.
    """
    flat = np.asarray(bank_map).reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    sorted_ids = flat[perm]
    rows = np.arange(P, dtype=flat.dtype)
    starts = np.searchsorted(sorted_ids, rows, side="left")
    ends = np.searchsorted(sorted_ids, rows, side="right")
    return perm, np.stack([starts, ends]).astype(np.int32)


def _blocked_prefix(gs):
    """Inclusive prefix sum along axis 0 of [M, D] (M % 128 == 0) via
    128-row blocks: within-block lower-triangular MXU matmul + exclusive
    block carry."""
    M, D = gs.shape
    nb = M // 128
    g3 = gs.reshape(nb, 128, D)
    tri = jnp.tril(jnp.ones((128, 128), gs.dtype))
    within = jnp.einsum("rc,bcd->brd", tri, g3)
    block_tot = within[:, -1, :]                       # [nb, D]
    carry = jnp.cumsum(block_tot, axis=0) - block_tot  # exclusive
    return (within + carry[:, None, :]).reshape(M, D)


@jax.custom_vjp
def _localize_aux(rel_vecs, bank_map, loc_perm, loc_bnd):
    return rel_vecs[bank_map]


def _localize_aux_fwd(rel_vecs, bank_map, loc_perm, loc_bnd):
    out = rel_vecs[bank_map]
    # zero-size dtype witness: residuals must be JAX types
    return out, (jnp.zeros((0,), rel_vecs.dtype), loc_perm, loc_bnd,
                 bank_map)


def _localize_aux_bwd(res, g):
    witness, perm, bnd, bank_map = res
    dtype, bm_shape = witness.dtype, bank_map.shape
    D = g.shape[-1]
    gs = g.reshape(-1, D)[perm].astype(jnp.float32)
    M = gs.shape[0]
    pad = (-M) % 128
    if pad:
        gs = jnp.concatenate([gs, jnp.zeros((pad, D), gs.dtype)], axis=0)
    cum = _blocked_prefix(gs)
    cumz = jnp.concatenate([jnp.zeros((1, D), jnp.float32), cum], axis=0)
    g_bank = (cumz[bnd[1]] - cumz[bnd[0]]).astype(dtype)
    z = lambda shape: np.zeros(shape, jax.dtypes.float0)  # noqa: E731
    return (g_bank, z(bm_shape), z(perm.shape), z(bnd.shape))


_localize_aux.defvjp(_localize_aux_fwd, _localize_aux_bwd)


def localize_bank(rel_vecs, bank_map, loc_perm=None, loc_bnd=None):
    """rel_vecs[bank_map] with a scatter-free backward when the host
    auxiliaries are present (training batches); plain gather otherwise."""
    if loc_perm is None or loc_bnd is None:
        return rel_vecs[bank_map]
    return _localize_aux(rel_vecs, bank_map, loc_perm, loc_bnd)
