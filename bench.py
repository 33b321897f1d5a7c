"""Driver benchmark: relation-aware graph attention throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: edges/s through one fused relation-attention encoder pass at
AMR-2.0-scale shapes (B=32 graphs, N=128 nodes incl. global, P=2048 unique
relation paths, 8 heads, d=512, bf16). An "edge" is one ordered node pair
scored and aggregated (B * N^2 per pass) — the SpMM+SDDMM unit of
BASELINE.json's north-star metric.

vs_baseline compares against the reference's computation strategy (dense
materialization of per-pair relation projections, as jcyk/gtos's
RelationMultiheadAttention does — SURVEY.md §3.4) executed by XLA on the
same chip: value / baseline (higher is better).

Measurement protocol (the tunneled-TPU backend makes naive timing lie):
  * every operand is a jit ARGUMENT — closure-captured constants are
    re-shipped to the device per dispatch (~38 ms for these 50 MB);
  * completion is forced by a device->host READBACK of the result —
    block_until_ready can return before remote execution finishes;
  * the per-pass cost is the MARGINAL slope (T(hi_iters) - T(lo_iters)) /
    (hi - lo) of an on-device fori_loop, which cancels the fixed RPC +
    readback overhead (~60 ms) out of the estimate.
"""

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gtos_tpu.ops.attention import (  # noqa: E402
    dense_relation_scores_reference, masked_softmax,
)
from gtos_tpu.ops.pallas import pallas_relation_attention  # noqa: E402
from gtos_tpu.utils.benchlib import attention_inputs  # noqa: E402

B, H, N, Dh, P = 32, 8, 128, 64, 2048


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def _loop(q, k, v, a_bank, b_bank, idx, mask, iters, mode):
    def body(i, q):
        if mode == "pallas":
            out, _ = pallas_relation_attention(
                q, k, v, a_bank, b_bank, idx, mask)
        else:
            e = dense_relation_scores_reference(q, k, a_bank, b_bank, idx)
            attn = masked_softmax(e, mask)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        return q + (1e-6 * out.sum()).astype(q.dtype)

    return jax.lax.fori_loop(0, iters, body, q)


def marginal_s_per_iter(args, mode, lo, hi, calls=3):
    """Marginal seconds per loop iteration via two-point slope."""
    q = args[0]

    def run(iters):
        # compile + complete once
        np.asarray(_loop(*args, iters=iters, mode=mode))
        t0 = time.perf_counter()
        r = q
        for _ in range(calls):
            r = _loop(r, *args[1:], iters=iters, mode=mode)
        np.asarray(r)  # readback forces completion
        return (time.perf_counter() - t0) / calls

    t_lo, t_hi = run(lo), run(hi)
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def main():
    args = attention_inputs(
        jax.random.PRNGKey(0), B, H, N, Dh, P, jnp.bfloat16)

    t_pallas = marginal_s_per_iter(args, "pallas", lo=40, hi=240)
    t_dense = marginal_s_per_iter(args, "dense", lo=10, hi=60)

    edges = B * N * N
    value = edges / t_pallas
    baseline = edges / t_dense
    print(json.dumps({
        "metric": "relation_attention_edges_per_s",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / baseline, 3),
        "detail": {
            "shapes": {"B": B, "H": H, "N": N, "Dh": Dh, "P": P,
                       "dtype": "bfloat16"},
            "pallas_ms": round(t_pallas * 1e3, 3),
            "dense_reference_ms": round(t_dense * 1e3, 3),
            "protocol": "marginal fori_loop slope, readback-fenced",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
