"""Experiment: what bandwidth can the localized kernel's bank traffic
actually achieve? (r5 kernel ablation follow-up)

The ablations showed the forward kernel is ~90% DMA-bound: 'empty'
(all operands fetched, zero compute) costs 191 us for ~60 MB -> ~315
GB/s, 38% of the v5e's 819 GB/s. This probes whether that's the chip or
the pipeline:

  xla_read      XLA reduce over both banks (pure-read floor, XLA's own
                pipelining)
  xla_copy      XLA elementwise add of the banks (read 2x + write 1x)
  pallas_auto   banks as ordinary blocked operands, zero compute
                (the kernel's current fetch path)
  pallas_man_K  banks as ANY/HBM refs; the kernel issues K concurrent
                async slice copies per bank into VMEM scratch

Each variant in its own subprocess. Prints GB/s per variant.
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

B, P_loc, HD = 32, 768, 512  # the honest bucket's bank shape


def make_banks():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ab = jax.random.normal(k1, (B, P_loc, HD), jnp.bfloat16)
    bb = jax.random.normal(k2, (B, P_loc, HD), jnp.bfloat16)
    return ab, bb


def bytes_moved(variant):
    bank = B * P_loc * HD * 2
    if variant == "xla_read":
        return 2 * bank
    if variant == "xla_copy":
        return 4 * bank
    return 2 * bank  # pallas variants: read both banks (+ tiny out)


def pallas_fetch(ab, bb, manual_k: int = 0):
    out_spec = pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    if manual_k == 0:
        bank = pl.BlockSpec((1, P_loc, HD), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

        def kernel(ab_r, bb_r, o_r):
            o_r[0] = (ab_r[0, :8, :128] + bb_r[0, :8, :128]).astype(
                o_r.dtype)

        return pl.pallas_call(
            kernel, grid=(B,), in_specs=[bank, bank], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ab, bb)

    K = manual_k
    rows = P_loc // K

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def kernel(ab_r, bb_r, o_r, sc_a, sc_b, sems):
        b = pl.program_id(0)
        dmas = []
        for s in range(K):
            d1 = pltpu.make_async_copy(
                ab_r.at[b, pl.ds(s * rows, rows), :],
                sc_a.at[pl.ds(s * rows, rows), :], sems.at[2 * s])
            d2 = pltpu.make_async_copy(
                bb_r.at[b, pl.ds(s * rows, rows), :],
                sc_b.at[pl.ds(s * rows, rows), :], sems.at[2 * s + 1])
            d1.start()
            d2.start()
            dmas.extend([d1, d2])
        for d in dmas:
            d.wait()
        o_r[0] = (sc_a[:8, :128] + sc_b[:8, :128]).astype(o_r.dtype)

    return pl.pallas_call(
        kernel, grid=(B,), in_specs=[any_spec, any_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((P_loc, HD), jnp.bfloat16),
            pltpu.VMEM((P_loc, HD), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2 * K,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ab, bb)


def measure(variant):
    ab, bb = make_banks()

    if variant == "xla_copy":
        # carry the full array: c = (c + ab + bb) * 0.5 streams 75 MB of
        # reads + 25 MB of writes per iteration, nothing DCE-able
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop_c(c, ab, bb, iters):
            def body(i, c):
                return ((c + ab + bb) * jnp.bfloat16(0.5)).astype(c.dtype)
            return jax.lax.fori_loop(0, iters, body, c)

        def run_c(iters, calls=3):
            t0 = time.perf_counter()
            for _ in range(calls):
                r = loop_c(ab, ab, bb, iters)
            np.asarray(r)
            return (time.perf_counter() - t0) / calls

        lo, hi = 50, 300
        np.asarray(loop_c(ab, ab, bb, lo))
        np.asarray(loop_c(ab, ab, bb, hi))
        t_lo = min(run_c(lo) for _ in range(3))
        t_hi = min(run_c(hi) for _ in range(3))
        return max(t_hi - t_lo, 1e-9) / (hi - lo)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(ab, bb, iters):
        def body(i, carry):
            a = ab + carry.astype(ab.dtype)
            if variant == "tare":
                # the carry-tying add alone (read ab + write a): subtract
                # this from every other variant host-side
                r = a.astype(jnp.float32)[0, 0, 0]
            elif variant == "xla_read":
                r = a.astype(jnp.float32).sum() + bb.astype(
                    jnp.float32).sum()
            elif variant == "xla_copy":
                pass  # handled by its own loop below
            elif variant == "pallas_auto":
                r = pallas_fetch(a, bb).astype(jnp.float32).sum()
            else:
                k = int(variant.rsplit("_", 1)[1])
                r = pallas_fetch(a, bb, manual_k=k).astype(
                    jnp.float32).sum()
            return carry + r * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run(iters, calls=3):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = loop(ab, bb, iters)
        np.asarray(r)
        return (time.perf_counter() - t0) / calls

    lo, hi = 50, 300
    np.asarray(loop(ab, bb, lo))
    np.asarray(loop(ab, bb, hi))
    t_lo = min(run(lo) for _ in range(3))
    t_hi = min(run(hi) for _ in range(3))
    t = max(t_hi - t_lo, 1e-9) / (hi - lo)
    return t


VARIANTS = ["tare", "xla_read", "xla_copy", "pallas_auto", "pallas_man_2",
            "pallas_man_4"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    args = ap.parse_args()
    if args.variant:
        t = measure(args.variant)
        gbs = bytes_moved(args.variant) / t / 1e9
        print(json.dumps({"variant": args.variant,
                          "us": round(t * 1e6, 1),
                          "GBps": round(gbs, 1)}))
        return
    results = {}
    for v in VARIANTS:
        p = subprocess.run(
            [sys.executable, __file__, "--variant", v],
            capture_output=True, text=True, timeout=1800)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        results[v] = (json.loads(line[-1]) if line
                      else f"FAILED: {p.stderr[-400:]}")
        print(f"{v}: {results[v]}", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
