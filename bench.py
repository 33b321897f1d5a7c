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
from gtos_tpu.ops.pallas import (  # noqa: E402
    pallas_relation_attention, relation_attention_trainable,
)
from gtos_tpu.utils.benchlib import attention_inputs  # noqa: E402

B, H, N, Dh, P = 32, 8, 128, 64, 2048

# v5e per-chip peaks (BASELINE.md roofline constants)
PEAK_BF16_FLOPS = 394e12
PEAK_HBM_BPS = 819e9


def _dense_xla(q, k, v, a_bank, b_bank, idx, mask):
    e = dense_relation_scores_reference(q, k, a_bank, b_bank, idx)
    attn = masked_softmax(e, mask)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def _loop(q, k, v, a_bank, b_bank, idx, mask, iters, mode):
    def fwd(q):
        if mode.startswith("pallas"):
            if mode == "pallas_grad":
                out = relation_attention_trainable(
                    q, k, v, a_bank, b_bank, idx, mask)
            else:
                out, _ = pallas_relation_attention(
                    q, k, v, a_bank, b_bank, idx, mask)
        else:
            out = _dense_xla(q, k, v, a_bank, b_bank, idx, mask)
        return out

    def fwd_all(q, k, v, a_bank, b_bank):
        if mode == "pallas_grad":
            return relation_attention_trainable(
                q, k, v, a_bank, b_bank, idx, mask)
        return _dense_xla(q, k, v, a_bank, b_bank, idx, mask)

    def body(i, q):
        if mode.endswith("_grad"):
            # fwd + bwd: the training-step shape of the op (VERDICT r1
            # weak #6). Differentiate wrt ALL tensor inputs — grads wrt
            # the relation banks are where the gather transposes
            # (scatter-adds) live; wrt q alone XLA DCEs them away and the
            # comparison flatters the baseline.
            g = jax.grad(
                lambda *a: fwd_all(*a).astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3, 4))(q, k, v, a_bank, b_bank)
            upd = sum((1e-6 * x.sum()).astype(q.dtype) for x in g)
            return q + upd
        return q + (1e-6 * fwd(q).sum()).astype(q.dtype)

    return jax.lax.fori_loop(0, iters, body, q)


def _fwd_flops():
    """MXU FLOPs of one forward pass (t1 + t2/t3 tables + attn@v)."""
    t1 = 2 * B * H * N * N * Dh
    tables = 2 * (2 * B * H * N * P * Dh)
    av = 2 * B * H * N * N * Dh
    return t1 + tables + av


def _fwd_hbm_bytes(itemsize=2):
    """HBM bytes one inline-kernel forward must move (q/k/v in, out, index
    blocks incl. the transposed copy, banks once)."""
    dh_pad = 128
    qkv = 3 * B * H * N * dh_pad * itemsize
    out = B * H * N * dh_pad * itemsize
    idx = 2 * B * N * N * 4
    banks = 2 * P * H * dh_pad * itemsize
    return qkv + out + idx + banks


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
    # training-step shape: forward + backward through the custom-vjp kernel
    # vs the XLA dense reference differentiated by autodiff
    t_pallas_fb = marginal_s_per_iter(args, "pallas_grad", lo=20, hi=120)
    t_dense_fb = marginal_s_per_iter(args, "dense_grad", lo=5, hi=30)

    edges = B * N * N
    value = edges / t_pallas
    baseline = edges / t_dense

    # roofline accounting for the forward kernel (v5e): the kernel is bound
    # by the in-register gather lane-shuffles (VPU), not MXU or HBM — the
    # MXU/HBM fractions below quantify the headroom ceiling of ANY
    # implementation of this op at these shapes.
    flops = _fwd_flops()
    hbm = _fwd_hbm_bytes()
    mfu = flops / t_pallas / PEAK_BF16_FLOPS
    hbm_frac = hbm / t_pallas / PEAK_HBM_BPS
    sol_s = max(flops / PEAK_BF16_FLOPS, hbm / PEAK_HBM_BPS)

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
            "fwd_bwd_pallas_ms": round(t_pallas_fb * 1e3, 3),
            "fwd_bwd_dense_ms": round(t_dense_fb * 1e3, 3),
            "fwd_bwd_speedup": round(t_dense_fb / t_pallas_fb, 2),
            "train_edges_per_s": round(edges / t_pallas_fb, 1),
            "mfu": round(mfu, 4),
            "hbm_roofline_frac": round(hbm_frac, 4),
            "speed_of_light_ms": round(sol_s * 1e3, 4),
            "roofline_note": (
                "op is VPU-bound on the P/128 chunked gather shuffles, not "
                "MXU/HBM; mfu + hbm_roofline_frac give the compute/memory "
                "ceilings"),
            "protocol": "marginal fori_loop slope, readback-fenced",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
