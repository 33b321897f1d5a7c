"""Driver benchmark: relation-aware graph attention throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Round-3 protocol change (honest inputs): round 2 benchmarked synthetic
uniform-random relation indices into a P=2048 batch-global bank. Measured
on the real data pipeline, that shape is fictional — a 32-graph batch of
AMR-scale graphs carries a batch-global bank of ~16k unique shortest-path
strings, while each GRAPH references only ~400-700 of them. This bench now
builds its inputs THROUGH batchify (build_local_banks=True) on the
synthetic AMR corpus at the dominant production bucket (B=32 graphs,
N=32-node bucket) and measures:

  * value / vs_baseline: the localized Pallas kernel (per-graph banks,
    ops/pallas/local_relation_attention) against the reference
    computation strategy (dense per-pair table gather over the
    batch-global bank, as jcyk/gtos's RelationMultiheadAttention does —
    SURVEY.md §3.4) executed by XLA on the same chip, same honest inputs;
  * roofline fractions for BOTH forward and backward kernels (VERDICT r2
    weak #2: the backward previously had no accounting at all).

Measurement protocol (the tunneled-TPU backend makes naive timing lie):
  * every operand is a jit ARGUMENT — closure-captured constants are
    re-shipped to the device per dispatch;
  * completion is forced by a device->host READBACK of the result;
  * the per-pass cost is the MARGINAL slope (T(hi_iters) - T(lo_iters)) /
    (hi - lo) of an on-device fori_loop, which cancels the fixed RPC +
    readback overhead out of the estimate.
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
from gtos_tpu.ops.pallas.local_relation_attention import (  # noqa: E402
    local_relation_attention, local_relation_attention_trainable,
)

B, H, Dh = 32, 8, 64          # d_model=512, 8 heads — config-2 scale
MIN_NODES, MAX_NODES = 10, 31  # dominant AMR bucket: N=32 incl. global

# v5e per-chip peaks (BASELINE.md roofline constants)
PEAK_BF16_FLOPS = 394e12
PEAK_HBM_BPS = 819e9


def honest_batch():
    """Real batchify output on the synthetic corpus at the dominant
    bucket; returns the localized arrays + the batch-global rel_index."""
    from gtos_tpu.data import BucketSpec, batchify
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus

    graphs, targets = synthetic_amr_corpus(
        B, seed=0, min_nodes=MIN_NODES, max_nodes=MAX_NODES)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    spec = BucketSpec(bank=(4096, 8192, 16384, 32768, 65536))
    batch = batchify(instances, tv, cv, rv, chv, lm, batch_size_bucket=B,
                     spec=spec, build_local_banks=True)
    return batch


def build_inputs(batch, dtype=jnp.bfloat16):
    N = batch.rel_index.shape[1]
    P = batch.rel_bank.shape[0]
    P_loc = batch.bank_map.shape[1]
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, H, N, Dh), dtype)
    k = jax.random.normal(ks[1], (B, H, N, Dh), dtype)
    v = jax.random.normal(ks[2], (B, H, N, Dh), dtype)
    a_bank = jax.random.normal(ks[3], (P, H, Dh), dtype) * 0.5
    b_bank = jax.random.normal(ks[4], (P, H, Dh), dtype) * 0.5
    j = jnp.asarray
    bank_map_j = j(batch.bank_map)
    # sorted-scatter aux are device-computed in the model now; the kernel
    # bench builds them once here (outside the timed loop) via the same fn
    from gtos_tpu.ops.pallas.local_relation_attention import device_sort_bnd
    idx_loc = j(batch.rel_index_loc)
    srt, bnd = device_sort_bnd(idx_loc, P_loc)
    srtT, bndT = device_sort_bnd(jnp.swapaxes(idx_loc, 1, 2), P_loc)
    return dict(
        q=q, k=k, v=v, a_bank=a_bank, b_bank=b_bank,
        a_loc=a_bank[bank_map_j], b_loc=b_bank[bank_map_j],
        rel_index=j(batch.rel_index), mask=j(batch.concept_mask),
        bank_map=j(batch.bank_map), idx_loc=idx_loc,
        srt=srt, bnd=bnd, srtT=srtT, bndT=bndT,
        loc_perm=j(batch.loc_perm), loc_bnd=j(batch.loc_bnd),
        N=N, P=P, P_loc=P_loc,
    )


def _dense_xla(q, k, v, a_bank, b_bank, idx, mask):
    e = dense_relation_scores_reference(q, k, a_bank, b_bank, idx)
    attn = masked_softmax(e, mask)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def make_loop(inp):
    idx_loc, mask = inp["idx_loc"], inp["mask"]
    srt, bnd, srtT, bndT = inp["srt"], inp["bnd"], inp["srtT"], inp["bndT"]
    rel_index, bank_map = inp["rel_index"], inp["bank_map"]
    loc_perm, loc_bnd = inp["loc_perm"], inp["loc_bnd"]

    # Bank operands by mode: the model gathers the GRU's relation vectors
    # ONCE per step for the whole layer stack (graph_transformer.py), so
    # the kernel's contract is PRE-localized per-graph banks; the
    # localization gather + its scatter-add VJP are a once-per-step cost
    # measured separately (mode="localize_grad").
    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def loop(q, k, v, ab1, ab2, iters, mode):
        # local modes: ab1/ab2 are the LOCALIZED banks [B, P_loc, H, Dh];
        # dense/localize modes: the global banks [P, H, Dh]. Grads are
        # taken wrt ALL tensor inputs in both modes (wrt q alone XLA DCEs
        # the bank-grad scatters and the comparison flatters the dense
        # baseline — r2 bench note); for the local mode the bank grads
        # are wrt the localized banks, which is what the model's layers
        # produce before the once-per-step global scatter.
        def fwd(q, k, v, b1, b2):
            if mode.startswith("local"):
                if mode.endswith("grad"):
                    return local_relation_attention_trainable(
                        q, k, v, b1, b2, idx_loc, mask,
                        srt, bnd, srtT, bndT)
                return local_relation_attention(
                    q, k, v, b1, b2, idx_loc, mask)
            return _dense_xla(q, k, v, b1, b2, rel_index, mask)

        def localize(rv):
            # the MODEL's localize: ONE [P, D=H*Dh] rel_vecs table
            # gathered per step through ops/localize.localize_bank (r5:
            # scatter-free backward; r4 and earlier measured TWO plain
            # gathers with XLA scatter-add VJPs — not comparable)
            from gtos_tpu.ops.localize import localize_bank
            loc = localize_bank(rv, bank_map, loc_perm, loc_bnd)
            return (loc.astype(jnp.float32) ** 2).sum()

        def body(i, q):
            if mode == "localize_grad":
                # tie the gather input to the loop carry so XLA cannot
                # hoist the (loop-invariant) gather+scatter out of the
                # loop; the extra elementwise multiply is ~34 MB of
                # traffic, small against the scatter being measured
                rv = ab1.reshape(ab1.shape[0], -1)
                eps = (q.astype(jnp.float32).sum() * 1e-20).astype(
                    rv.dtype)
                g1 = jax.grad(localize)(rv + eps)
                return q + (1e-6 * g1.sum()).astype(q.dtype)
            if mode.endswith("grad"):
                g = jax.grad(
                    lambda *a: fwd(*a).astype(jnp.float32).sum(),
                    argnums=(0, 1, 2, 3, 4))(q, k, v, ab1, ab2)
                return q + sum((1e-6 * x.sum()).astype(q.dtype) for x in g)
            return q + (1e-6 * fwd(q, k, v, ab1, ab2).sum()).astype(q.dtype)

        return jax.lax.fori_loop(0, iters, body, q)

    return loop


def marginal_s_per_iter(loop, inp, mode, lo, hi, calls=3):
    q = inp["q"]
    banks = ((inp["a_loc"], inp["b_loc"]) if mode.startswith("local")
             and mode != "localize_grad" else
             (inp["a_bank"], inp["b_bank"]))
    args = (inp["q"], inp["k"], inp["v"], *banks)

    def run(iters):
        t0 = time.perf_counter()
        r = q
        for _ in range(calls):
            r = loop(r, *args[1:], iters=iters, mode=mode)
        np.asarray(r)  # readback forces completion
        return (time.perf_counter() - t0) / calls

    # warm both compilations, then take the MIN of several repeats at each
    # point: the tunneled backend's RPC latency has multi-ms spikes that
    # poison a single two-point slope
    np.asarray(loop(*args, iters=lo, mode=mode))
    np.asarray(loop(*args, iters=hi, mode=mode))
    t_lo = min(run(lo) for _ in range(3))
    t_hi = min(run(hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def rooflines(N, P_loc, itemsize=2):
    """FLOP and HBM-byte accounting for the localized kernels (in-kernel
    work; the bank_map localization gather is measured separately)."""
    Nc = Dpad = 128
    # forward
    f_tables = 2 * 2 * B * H * N * P_loc * Dh
    f_attn = 2 * 2 * B * H * N * N * Dpad          # t1 + attn@v (padded)
    fwd_flops = f_tables + f_attn
    by_banks = 2 * B * P_loc * H * Dh * itemsize
    by_t4 = B * H * P_loc * 4
    by_qkv = 3 * B * H * N * Dpad * itemsize
    by_idx = 2 * B * N * Nc * 4
    by_out = B * H * N * Dpad * itemsize
    fwd_bytes = by_banks + by_t4 + by_qkv + by_idx + by_out
    # backward: NO recompute (the forward's attention probs are a
    # residual); softmax VJP + sorted-scatter + contractions
    by_probs = B * H * N * Nc * 4
    b_attn = 2 * B * H * N * N * Dpad * 4      # g_attn, gv, ge.k, ge.q
    b_scan = 2 * 2 * B * H * N * Nc * Nc       # two prefix matmuls
    b_rel = 2 * 2 * 2 * B * H * N * P_loc * Dh  # gq/gk rel + gab/gbb
    bwd_flops = b_attn + b_scan + b_rel
    bwd_bytes = (by_banks + by_qkv + by_out + by_probs     # inputs + g_out
                 + 2 * B * N * Nc * 4 + 2 * B * N * P_loc * 4  # sort/bnd
                 + 3 * B * H * N * Dpad * 4                # gq/gk/gv f32
                 + 2 * B * P_loc * H * Dh * itemsize)      # bank grads
    # (the benched forward is the inference-mode kernel: no probs output)
    return fwd_flops, fwd_bytes, bwd_flops, bwd_bytes


def main():
    batch = honest_batch()
    inp = build_inputs(batch)
    N, P, P_loc = inp["N"], inp["P"], inp["P_loc"]
    loop = make_loop(inp)

    t_local = marginal_s_per_iter(loop, inp, "local", lo=30, hi=180)
    t_local_fb = marginal_s_per_iter(loop, inp, "local_grad", lo=10, hi=60)
    t_localize = marginal_s_per_iter(loop, inp, "localize_grad", lo=10,
                                     hi=60)
    t_dense = marginal_s_per_iter(loop, inp, "dense", lo=4, hi=16)
    t_dense_fb = marginal_s_per_iter(loop, inp, "dense_grad", lo=2, hi=8)

    edges = B * N * N
    value = edges / t_local
    baseline = edges / t_dense

    ff, fb, bf, bb = rooflines(N, P_loc)
    t_bwd = max(t_local_fb - t_local, 1e-9)
    fwd_sol = max(ff / PEAK_BF16_FLOPS, fb / PEAK_HBM_BPS)
    bwd_sol = max(bf / PEAK_BF16_FLOPS, bb / PEAK_HBM_BPS)

    print(json.dumps({
        "metric": "relation_attention_edges_per_s",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / baseline, 3),
        "detail": {
            "protocol_note": (
                "r3 protocol change: inputs now come from real batchify "
                "on the dominant AMR bucket (localized per-graph banks); "
                "r2's P=2048 uniform-random bank understated real bank "
                "pressure ~8x, so absolute edges/s are not comparable "
                "across rounds — vs_baseline (same-chip, same-inputs "
                "reference strategy) is"),
            "shapes": {"B": B, "H": H, "N": N, "Dh": Dh,
                       "P_global": P, "P_loc": P_loc, "dtype": "bfloat16"},
            "pallas_fwd_ms": round(t_local * 1e3, 3),
            "pallas_fwd_bwd_ms": round(t_local_fb * 1e3, 3),
            "dense_reference_fwd_ms": round(t_dense * 1e3, 3),
            "dense_reference_fwd_bwd_ms": round(t_dense_fb * 1e3, 3),
            "fwd_bwd_speedup": round(t_dense_fb / t_local_fb, 2),
            "train_edges_per_s": round(edges / t_local_fb, 1),
            "bank_localize_roundtrip_ms": round(t_localize * 1e3, 3),
            "bank_localize_note": (
                "gather of the GRU relation vectors into per-graph banks "
                "+ its backward; paid ONCE per train step for the whole "
                "encoder stack (graph_transformer localizes before the "
                "layer loop), so it amortizes over layers and is "
                "excluded from the per-layer kernel numbers above. r5 "
                "protocol change: measures the model's actual path — ONE "
                "[P, H*Dh] table through ops/localize.localize_bank "
                "(scatter-free sorted backward, benchmarks/"
                "localize_vjp.json); r2-r4 measured two plain-gather "
                "banks with XLA scatter-add VJPs (~2x the bytes), so the "
                "series is not comparable across that boundary"),
            "fwd": {
                "mfu": round(ff / t_local / PEAK_BF16_FLOPS, 4),
                "hbm_frac": round(fb / t_local / PEAK_HBM_BPS, 4),
                "speed_of_light_ms": round(fwd_sol * 1e3, 4),
                "sol_frac": round(fwd_sol / t_local, 4),
            },
            "bwd": {
                "mfu": round(bf / t_bwd / PEAK_BF16_FLOPS, 4),
                "hbm_frac": round(bb / t_bwd / PEAK_HBM_BPS, 4),
                "speed_of_light_ms": round(bwd_sol * 1e3, 4),
                "sol_frac": round(bwd_sol / t_bwd, 4),
            },
            "roofline_note": (
                "sol_frac = ideal-HBM speed_of_light / measured. The r4 "
                "attribution of the residual to VPU lane shuffles was "
                "overturned by compiled ablation (r5, "
                "benchmarks/kernel_decomposition.json): the kernels are "
                "data-movement-bound — the banks stream at ~720 GB/s "
                "(88% of peak) but per-operand pipeline overhead and "
                "the t4/packing prep (which XLA fuses away inside full "
                "model programs but this isolated bench pays) set the "
                "floor; the r5 packed-operand layout closed most of the "
                "operand-overhead term"),
            "protocol": "marginal fori_loop slope, readback-fenced",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
