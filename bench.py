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
"""

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402

from gtos_tpu.ops.attention import (  # noqa: E402
    dense_relation_scores_reference, masked_softmax,
)
from gtos_tpu.ops.pallas import pallas_relation_attention  # noqa: E402
from gtos_tpu.utils.benchlib import attention_inputs, time_fn  # noqa: E402

B, H, N, Dh, P = 32, 8, 128, 64, 2048
ITERS = 50


def main():
    q, k, v, a_bank, b_bank, idx, mask = attention_inputs(
        jax.random.PRNGKey(0), B, H, N, Dh, P, jnp.bfloat16)

    def dense_ref_full(q):
        e = dense_relation_scores_reference(q, k, a_bank, b_bank, idx)
        attn = masked_softmax(e, mask)
        return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)

    @jax.jit
    def loop_pallas(q):
        def body(i, q):
            out, _ = pallas_relation_attention(
                q, k, v, a_bank, b_bank, idx, mask)
            return q + (1e-6 * out.sum()).astype(q.dtype)
        return jax.lax.fori_loop(0, ITERS, body, q)

    @jax.jit
    def loop_dense(q):
        def body(i, q):
            out = dense_ref_full(q)
            return q + (1e-6 * out.sum()).astype(q.dtype)
        return jax.lax.fori_loop(0, ITERS, body, q)

    edges = B * N * N
    t_pallas = time_fn(loop_pallas, q, iters=5, warmup=2) / ITERS
    t_dense = time_fn(loop_dense, q, iters=3, warmup=1) / ITERS

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
            # measured separately (tests/perf notes): fwd+bwd via the
            # Pallas backward kernel 12.9 ms vs 108.6 ms XLA VJP (8.4x)
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
