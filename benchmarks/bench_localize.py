"""Bank-localize round-trip strategies on the real TPU (VERDICT r3 weak
#3 / next #3): the per-step gather of the GRU relation vectors into
per-graph banks (rel_vecs[bank_map]) and — the expensive half — its VJP,
a scatter-add of [B*P_loc, D] rows back onto the [P, D] global bank.

Strategies timed at the dominant-bucket shape:
  autodiff   — jnp.take + XLA's scatter-add VJP (the r3 baseline);
  segsum     — host-precomputed argsort of bank_map + sorted
               jax.ops.segment_sum (indices_are_sorted=True);
  cumsum     — same sorted order, segment sums as one f32 cumsum plus two
               boundary-row gathers (prefix-sum trick; trades a rounding
               epsilon for no scatter at all).

Writes benchmarks/localize_roundtrip.json and prints one JSON line.
"""

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def marginal(loop, c0, lo, hi, reps=3):
    np.asarray(loop(c0, lo))
    np.asarray(loop(c0, hi))

    def run(iters):
        t0 = time.perf_counter()
        np.asarray(loop(c0, iters))
        return time.perf_counter() - t0

    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def build(B=32, P=16384, P_loc=1024, D=512, seed=0):
    rng = np.random.default_rng(seed)
    # realistic bank_map rows: slot 0 = pad row 0, the rest distinct
    # ascending global rows per graph (np.unique's output shape)
    bank_map = np.zeros((B, P_loc), np.int32)
    for b in range(B):
        width = rng.integers(P_loc // 2, P_loc)
        rows = np.sort(rng.choice(np.arange(1, P), width, replace=False))
        bank_map[b, 1:width + 1] = rows
    flat = bank_map.ravel()
    order = np.argsort(flat, kind="stable").astype(np.int32)
    bnd = np.cumsum(np.bincount(flat, minlength=P)).astype(np.int32)
    rel_vecs = jnp.asarray(rng.standard_normal((P, D)), jnp.float32)
    return (rel_vecs, jnp.asarray(bank_map), jnp.asarray(order),
            jnp.asarray(bnd))


def main():
    rel_vecs, bank_map, order, bnd = build()
    P, D = rel_vecs.shape
    B, P_loc = bank_map.shape
    R = B * P_loc
    sorted_ids = jnp.take(bank_map.ravel(), order)

    def fwd(rv):
        return rv[bank_map]

    def bwd_auto(g):
        return jax.vjp(fwd, rel_vecs)[1](g)[0]

    def bwd_segsum(g):
        srt = jnp.take(g.reshape(R, D), order, axis=0)
        return jax.ops.segment_sum(srt, sorted_ids, num_segments=P,
                                   indices_are_sorted=True)

    def bwd_cumsum(g):
        srt = jnp.take(g.reshape(R, D), order, axis=0)
        cs = jnp.cumsum(srt, axis=0)
        start = jnp.concatenate([jnp.zeros((1,), bnd.dtype), bnd[:-1]])
        g_end = jnp.take(cs, jnp.maximum(bnd - 1, 0), axis=0)
        g_start = jnp.take(cs, jnp.maximum(start - 1, 0), axis=0)
        return (jnp.where((bnd > 0)[:, None], g_end, 0.0)
                - jnp.where((start > 0)[:, None], g_start, 0.0))

    # correctness first
    g = jax.random.normal(jax.random.PRNGKey(1), (B, P_loc, D))
    ref = np.asarray(bwd_auto(g))
    err_seg = float(np.abs(np.asarray(bwd_segsum(g)) - ref).max())
    err_cum = float(np.abs(np.asarray(bwd_cumsum(g)) - ref).max())

    def roundtrip_loop(bwd_fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(c, iters):
            def body(i, c):
                loc = fwd(rel_vecs + c)
                gg = bwd_fn(loc * 1e-3)
                return c + 1e-20 * gg.sum()
            return jax.lax.fori_loop(0, iters, body, c)
        return loop

    c0 = jnp.float32(0.0)
    t_auto = marginal(roundtrip_loop(bwd_auto), c0, 4, 16)
    t_seg = marginal(roundtrip_loop(bwd_segsum), c0, 4, 16)
    t_cum = marginal(roundtrip_loop(bwd_cumsum), c0, 4, 16)

    # HBM floor: fwd reads+writes R*D f32, bwd reads R*D + writes P*D
    bytes_total = (2 * R * D + R * D + P * D) * 4
    sol_ms = bytes_total / 819e9 * 1e3

    out = {
        "metric": "bank_localize_roundtrip_ms",
        "shape": {"B": B, "P": P, "P_loc": P_loc, "D": D},
        "autodiff_scatter_ms": round(t_auto * 1e3, 3),
        "sorted_segment_sum_ms": round(t_seg * 1e3, 3),
        "sorted_cumsum_ms": round(t_cum * 1e3, 3),
        "max_abs_err_vs_autodiff": {"segsum": err_seg, "cumsum": err_cum},
        "hbm_floor_ms": round(sol_ms, 3),
        "device": str(jax.devices()[0]),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "localize_roundtrip.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
