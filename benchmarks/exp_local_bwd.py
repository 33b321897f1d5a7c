"""Experiment: decompose the PACKED localized backward kernel on the v5e.

Follows exp_local_fwd.py's method (per-variant subprocesses, marginal
slopes). Variants ablate the library backward's in-kernel phases:

  full        the library kernel (pre-packed operands, kernel only)
  empty       all operands fetched, near-zero compute
  nophase2    sorted-scatter skipped (g_t2 = g_t3 = 0; wrong math)
  nophase3    contractions + bank writes skipped (wrong math)
  noboundary  phase 2 without the per-chunk boundary gathers (prefix
              sums only; wrong math)
"""

import argparse
import functools
import json
import subprocess
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gtos_tpu.ops.pallas.local_relation_attention import (  # noqa: E402
    DP, _VMEM, _pack_qkv, _pad_lane, _sorted_scatter,
)

B, H, Dh = 32, 8, 64


def _bwd_variant_kernel(qkv_ref, go_ref, probs_ref, ab_ref, bb_ref,
                        sort_ref, bnd_ref, gqkv_ref, gab_ref, gbb_ref, *,
                        scale, Dh, N, variant):
    P_loc = ab_ref.shape[0]
    n_chunks = P_loc // 128
    Nc = sort_ref.shape[-1]
    f32 = jnp.float32

    if variant == "empty":
        gqkv_ref[...] = jnp.zeros_like(gqkv_ref)
        gab_ref[...] = ab_ref[...]
        gbb_ref[...] = bb_ref[...]
        _ = go_ref[0][0, 0] + probs_ref[0][0, 0] + \
            sort_ref[0, 0].astype(f32) + bnd_ref[0, 0].astype(f32)
        return

    sort_i = sort_ref[:N, :]
    sortT_i = sort_ref[N:2 * N, :]
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (N, P_loc), 1)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (Nc, Nc), 1)).astype(f32)
    bnd = bnd_ref[:N, :].astype(jnp.int32)
    bndT = bnd_ref[N:2 * N, :].astype(jnp.int32)

    qh_p = lambda h: qkv_ref[h][:, :DP]                  # noqa: E731
    kh_p = lambda h: qkv_ref[h][:, DP:2 * DP]            # noqa: E731
    vh_p = lambda h: qkv_ref[h][:, 2 * DP:3 * DP]        # noqa: E731

    ges = []
    for h in range(H):
        goh = go_ref[h].astype(f32)
        attn = probs_ref[h][:, :N]
        g_attn = jax.lax.dot_general(
            goh, vh_p(h).astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        gqkv_ref[h, :, 2 * DP:3 * DP] = jax.lax.dot_general(
            attn, goh, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(gqkv_ref.dtype)
        ge = attn * (g_attn - jnp.sum(g_attn * attn, axis=-1,
                                      keepdims=True))
        ges.append(ge * scale)

    if variant in ("headmajor", "fuse23"):
        # headmajor: compute/consume per head (the r4 order, packed
        # operands); fuse23: keep phase 1 separate but merge scatter +
        # contractions per head so only `ges` stays live across phases
        for h in range(H):
            ge = ges[h]
            ge_pad = _pad_lane(ge, Nc)
            geT_pad = _pad_lane(ge.T, Nc)
            g_t2 = _sorted_scatter(ge_pad, sort_i, bnd, n_chunks,
                                   tri, N, lane_p)
            g_t3 = _sorted_scatter(geT_pad, sortT_i, bndT,
                                   n_chunks, tri, N, lane_p)
            bsl = bb_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
            asl = ab_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
            qh32 = qh_p(h).astype(f32)
            kh32 = kh_p(h).astype(f32)
            gq = jax.lax.dot_general(
                ge, kh32, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            gq += _pad_lane(jax.lax.dot_general(
                g_t2, bsl, (((1,), (0,)), ((), ())),
                preferred_element_type=f32), DP)
            gk = jax.lax.dot_general(
                ge, qh32, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            gk += _pad_lane(jax.lax.dot_general(
                g_t3, asl, (((1,), (0,)), ((), ())),
                preferred_element_type=f32), DP)
            gqkv_ref[h, :, :DP] = gq.astype(gqkv_ref.dtype)
            gqkv_ref[h, :, DP:2 * DP] = gk.astype(gqkv_ref.dtype)
            gt4_col = jnp.sum(g_t2, axis=0).reshape(P_loc, 1)
            gbb_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
                g_t2, qh32[:, :Dh], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
                + gt4_col * asl).astype(gbb_ref.dtype)
            gab_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
                g_t3, kh32[:, :Dh], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
                + gt4_col * bsl).astype(gab_ref.dtype)
        return

    if variant in ("stackheads", "stackmxuT"):
        # ONE gather per chunk for ALL heads: the boundary indices are
        # head-invariant, so stacking S for the 8 heads on sublanes
        # ([H*N, Nc]) turns 2 x H x n_chunks takes into 2 x n_chunks
        # (if dynamic_gather cost is per-op, this is ~8x fewer shuffles)
        eyeN = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
                ).astype(f32)

        def trans(ge):
            if variant == "stackmxuT":
                # transpose via MXU: out[a,b] = sum_c ge[c,a] I[c,b]
                return jax.lax.dot_general(
                    ge, eyeN, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
            return ge.T

        ge_all = jnp.concatenate([_pad_lane(g, Nc) for g in ges], axis=0)
        geT_all = jnp.concatenate([_pad_lane(trans(g), Nc) for g in ges],
                                  axis=0)
        sort_all = jnp.concatenate([sort_i] * H, axis=0)
        sortT_all = jnp.concatenate([sortT_i] * H, axis=0)
        bnd_all = jnp.concatenate([bnd] * H, axis=0)
        bndT_all = jnp.concatenate([bndT] * H, axis=0)
        lane_all = jax.lax.broadcasted_iota(jnp.int32, (H * N, P_loc), 1)
        g2_all = _sorted_scatter(ge_all, sort_all, bnd_all, n_chunks,
                                 tri, 10 ** 9, lane_all)
        g3_all = _sorted_scatter(geT_all, sortT_all, bndT_all, n_chunks,
                                 tri, 10 ** 9, lane_all)
        # NB: N=10**9 disables the pad-column zeroing; instead zero the
        # pad columns before stacking
        gts = [(g2_all[h * N:(h + 1) * N], g3_all[h * N:(h + 1) * N])
               for h in range(H)]
    elif variant == "noTside":
        # full sorted-scatter on the plain side; the transposed side
        # (ge.T transpose + its sort gather + tri matmul + boundary
        # gathers) skipped — isolates the T-side total
        gts = []
        for h in range(H):
            ge_pad = _pad_lane(ges[h], Nc)
            g_t2 = _sorted_scatter(ge_pad, sort_i, bnd, n_chunks,
                                   tri, N, lane_p)
            gts.append((g_t2, g_t2))
    elif variant == "constidx":
        # both sides, but the boundary gathers use a constant iota index
        # (no bnd dependence) — isolates gather cost from index prep
        const = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)

        def scat(ge_pad, sort_x):
            sge = jnp.take_along_axis(ge_pad, sort_x, axis=1,
                                      mode="promise_in_bounds")
            S = jax.lax.dot_general(
                sge, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            outs = []
            for c in range(n_chunks):
                g_end = jnp.take_along_axis(
                    S, const, axis=1, mode="promise_in_bounds")
                g_st = jnp.take_along_axis(
                    S, const, axis=1, mode="promise_in_bounds")
                outs.append(g_end - 0.5 * g_st)
            return jnp.concatenate(outs, axis=1)

        gts = []
        for h in range(H):
            gts.append((scat(_pad_lane(ges[h], Nc), sort_i),
                        scat(_pad_lane(ges[h].T, Nc), sortT_i)))
    elif variant == "nophase2":
        gts = [(jnp.zeros((N, P_loc), f32),) * 2 for _ in range(H)]
    elif variant == "noboundary":
        gts = []
        for h in range(H):
            ge_pad = _pad_lane(ges[h], Nc)
            sge = jnp.take_along_axis(ge_pad, sort_i, axis=1,
                                      mode="promise_in_bounds")
            S = jax.lax.dot_general(
                sge, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            g = jnp.concatenate([S] * n_chunks, axis=1)[:, :P_loc]
            gts.append((g, g))
    else:
        gts = []
        for h in range(H):
            ge_pad = _pad_lane(ges[h], Nc)
            geT_pad = _pad_lane(ges[h].T, Nc)
            g_t2 = _sorted_scatter(ge_pad, sort_i, bnd, n_chunks,
                                   tri, N, lane_p)
            g_t3 = _sorted_scatter(geT_pad, sortT_i, bndT,
                                   n_chunks, tri, N, lane_p)
            gts.append((g_t2, g_t3))

    if variant == "nophase3":
        for h in range(H):
            gqkv_ref[h, :, :DP] = _pad_lane(gts[h][0][:, :Dh],
                                            DP).astype(gqkv_ref.dtype)
            gqkv_ref[h, :, DP:2 * DP] = _pad_lane(
                gts[h][1][:, :Dh], DP).astype(gqkv_ref.dtype)
        gab_ref[...] = ab_ref[...]
        gbb_ref[...] = bb_ref[...]
        return

    for h in range(H):
        ge = ges[h]
        g_t2, g_t3 = gts[h]
        bsl = bb_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        asl = ab_ref[:, h * Dh:(h + 1) * Dh].astype(f32)
        qh32 = qh_p(h).astype(f32)
        kh32 = kh_p(h).astype(f32)
        gq = jax.lax.dot_general(
            ge, kh32, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        gq += _pad_lane(jax.lax.dot_general(
            g_t2, bsl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32), DP)
        gk = jax.lax.dot_general(
            ge, qh32, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        gk += _pad_lane(jax.lax.dot_general(
            g_t3, asl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32), DP)
        gqkv_ref[h, :, :DP] = gq.astype(gqkv_ref.dtype)
        gqkv_ref[h, :, DP:2 * DP] = gk.astype(gqkv_ref.dtype)
        gt4_col = jnp.sum(g_t2, axis=0).reshape(P_loc, 1)
        gbb_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t2, qh32[:, :Dh], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
            + gt4_col * asl).astype(gbb_ref.dtype)
        gab_ref[:, h * Dh:(h + 1) * Dh] = (jax.lax.dot_general(
            g_t3, kh32[:, :Dh], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
            + gt4_col * bsl).astype(gab_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant", "scale", "N"))
def bwd_variant(qkv3, gop, probs, ab, bb, sorts, bnds, *, variant, scale,
                N):
    Bq = qkv3.shape[0]
    Hq = qkv3.shape[1]
    P_loc = ab.shape[1]
    Nc = sorts.shape[-1]
    rows2 = sorts.shape[1]

    qkvs = pl.BlockSpec((1, Hq, N, 3 * DP), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    gos = pl.BlockSpec((1, Hq, N, DP), lambda b, *_: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bank = pl.BlockSpec((1, P_loc, Hq * Dh), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    prob_spec = pl.BlockSpec((1, Hq, N, Nc), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    sort_spec = pl.BlockSpec((1, rows2, Nc), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((1, rows2, P_loc), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(qkv_r, go_r, probs_r, ab_r, bb_r, sort_r, bnd_r, gqkv_r,
               gab_r, gbb_r):
        _bwd_variant_kernel(qkv_r.at[0], go_r.at[0], probs_r.at[0],
                            ab_r.at[0], bb_r.at[0], sort_r.at[0],
                            bnd_r.at[0], gqkv_r.at[0], gab_r.at[0],
                            gbb_r.at[0], scale=scale, Dh=Dh, N=N,
                            variant=variant)

    return pl.pallas_call(
        kernel,
        grid=(Bq,),
        in_specs=[qkvs, gos, prob_spec, bank, bank, sort_spec, bnd_spec],
        out_specs=(qkvs, bank, bank),
        out_shape=(
            jax.ShapeDtypeStruct((Bq, Hq, N, 3 * DP), jnp.bfloat16),
            jax.ShapeDtypeStruct((Bq, P_loc, Hq * Dh), jnp.bfloat16),
            jax.ShapeDtypeStruct((Bq, P_loc, Hq * Dh), jnp.bfloat16),
        ),
        compiler_params=_VMEM,
    )(qkv3, gop, probs, ab, bb, sorts, bnds)


def measure(variant):
    sys.path.insert(0, "/root/repo")
    from bench import build_inputs, honest_batch
    from gtos_tpu.ops.pallas.local_relation_attention import (
        local_relation_attention,
    )
    inp = build_inputs(honest_batch())
    scale = Dh ** -0.5
    N = inp["N"]
    Nc = -(-N // 128) * 128
    rows2 = -(-(2 * N) // 8) * 8
    Bq = inp["q"].shape[0]

    _, probs = local_relation_attention(
        inp["q"], inp["k"], inp["v"], inp["a_loc"], inp["b_loc"],
        inp["idx_loc"], inp["mask"], with_probs=True)
    qkv3 = _pack_qkv(inp["q"], inp["k"], inp["v"])
    gop = _pad_lane(jnp.ones_like(inp["q"], jnp.float32), DP)
    P_loc = inp["a_loc"].shape[1]
    ab = inp["a_loc"].reshape(Bq, P_loc, H * Dh)
    bb = inp["b_loc"].reshape(Bq, P_loc, H * Dh)

    def pack2(a, b, lanes, dtype=jnp.int32):
        fill = jnp.zeros((Bq, rows2 - 2 * N, lanes), dtype)
        return jnp.concatenate(
            [_pad_lane(a, lanes).astype(dtype),
             _pad_lane(b, lanes).astype(dtype), fill], axis=1)

    sorts = pack2(inp["srt"], inp["srtT"], Nc)
    bnds = pack2(inp["bnd"], inp["bndT"], P_loc, dtype=jnp.int16)
    args = [jax.block_until_ready(x)
            for x in (qkv3, gop, probs, ab, bb, sorts, bnds)]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(qkv3, gop, probs, ab, bb, sorts, bnds, iters):
        def body(i, carry):
            o = bwd_variant(qkv3 + carry.astype(qkv3.dtype), gop, probs,
                            ab, bb, sorts, bnds, variant=variant,
                            scale=scale, N=N)
            return carry + 1e-30 * o[0].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run(iters, calls=3):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = loop(*args, iters=iters)
        np.asarray(r)
        return (time.perf_counter() - t0) / calls

    lo, hi = 20, 120
    np.asarray(loop(*args, iters=lo))
    np.asarray(loop(*args, iters=hi))
    t_lo = min(run(lo) for _ in range(3))
    t_hi = min(run(hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


VARIANTS = ["stackheads", "stackmxuT"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    args = ap.parse_args()
    if args.variant:
        t = measure(args.variant)
        print(json.dumps({"variant": args.variant, "ms": round(t * 1e3, 4)}))
        return
    results = {}
    for v in VARIANTS:
        p = subprocess.run(
            [sys.executable, __file__, "--variant", v],
            capture_output=True, text=True, timeout=1800)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        results[v] = (json.loads(line[-1])["ms"] if line
                      else f"FAILED: {p.stderr[-400:]}")
        print(f"{v}: {results[v]}", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
