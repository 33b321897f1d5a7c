"""Full-model training-step benchmark on the real TPU.

Times the COMPLETE jitted, donated training step (forward + backward +
clip + scheduled Adam) of the flagship AMR model at reference scale
(d=512, ff=1024, 8 heads, 4 enc + 4 dec layers, bf16 activations) on
real batchified synthetic corpora at TWO bucket regimes — the dominant
small-graph bucket (N=32) and the large path-capped bucket (N=128) —
for each encoder attention implementation, including 'auto' (per-batch
impl dispatch, VERDICT r3 next #6). The unstable dense-XLA baseline is
re-run several times and reported as its MINIMUM (VERDICT r3 next #9).

Writes benchmarks/train_step.json and prints one JSON line.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def build(attention_impl: str, small: bool = False):
    from gtos_tpu.data import BucketSpec, DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.models.generator import resolve_attention_impl
    from gtos_tpu.train.optim import make_optimizer
    from gtos_tpu.train.trainer import init_state, make_train_step
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    from gtos_tpu.graph.paths import RelationPathConfig

    if small:
        # the dominant AMR bucket: tens-of-nodes graphs, full path depth
        graphs, targets = synthetic_amr_corpus(32, seed=0, min_nodes=10,
                                               max_nodes=31)
        path_cfg = RelationPathConfig()
        spec = BucketSpec(bank=(4096, 8192, 16384, 32768))
    else:
        graphs, targets = synthetic_amr_corpus(64, seed=0, min_nodes=90,
                                               max_nodes=120)
        # synthetic random-labeled trees have near-zero path dedup (real
        # AMR's Zipfian roles dedup far better); cap paths at 3 labels so
        # a full B=32, N=128, P=4096 batch fits the bank
        path_cfg = RelationPathConfig(max_path_len=3)
        spec = BucketSpec()
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets, path_cfg)
    # through the real DataLoader: the relation-bank cap decides how many
    # graphs fit one batch (bank-overflow bisect), exactly as in
    # production training
    dl = DataLoader(instances, tv, cv, rv, chv, lm,
                    batch_size_tokens=4096, for_train=True, seed=0,
                    spec=spec,
                    build_edges=(attention_impl == "sparse"),
                    build_local_banks=attention_impl.startswith(
                        ("pallas_local", "auto")))
    batch = max(iter(dl), key=lambda b: b.batch_size)
    arrays = {k: np.asarray(v) for k, v in batch.arrays().items()}
    resolved = resolve_attention_impl(attention_impl, arrays)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.1, max_oov=64, max_target_len=128,
        compute_dtype="bfloat16", attention_impl=resolved)
    model = Generator(cfg)
    tx = make_optimizer(TrainConfig(warmup_steps=4000), cfg.d_model)
    state = init_state(model, tx, arrays, seed=0)
    step = make_train_step(model, tx)
    return step, state, arrays, batch, resolved


def time_steps(step, state, arrays, warmup=3, iters=20):
    for _ in range(warmup):
        state, metrics = step(state, arrays)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, arrays)
    loss = float(metrics["loss"])  # readback fences completion
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dt, loss


def main():
    buckets = {}
    for name, small in (("N32_dominant", True), ("N128_pathcap3", False)):
        results = {}
        for impl in ("xla", "pallas", "pallas_local", "auto"):
            step, state, arrays, batch, resolved = build(impl, small=small)
            # the dense-XLA baseline is gather-heavy and unstable across
            # sessions on the tunneled chip (1.0-13.8 s/step at N=128 in
            # r2/r3): re-run it and keep the MINIMUM as the claim
            reps = 3 if impl == "xla" else 1
            iters = 3 if (impl == "xla" and not small) else 20
            best = None
            for _ in range(reps):
                dt, loss = time_steps(step, state, arrays, warmup=1,
                                      iters=iters)
                best = dt if best is None else min(best, dt)
            n_tok = int(arrays["token_mask"].sum())
            B, N = arrays["concept"].shape
            results[impl] = {
                "ms_per_step": round(best * 1e3, 2),
                "target_tokens_per_s": round(n_tok / best, 1),
                "edges_per_s": round(B * N * N / best, 1),
                "loss": round(loss, 4),
                **({"resolved": resolved} if impl == "auto" else {}),
            }
        xla = results["xla"]["ms_per_step"]
        bestk = min(v["ms_per_step"] for k, v in results.items()
                    if k != "xla")
        buckets[name] = dict(
            results,
            kernel_speedup_min=round(xla / bestk, 2),
            auto_regret_vs_best=round(
                results["auto"]["ms_per_step"] / bestk, 3),
        )
    out = {
        "metric": "full_train_step_ms",
        "model": "d512 ff1024 h8 enc4 dec4 bf16",
        "buckets": buckets,
        "xla_baseline_note": (
            "xla rows are the MINIMUM of 3 repeated timings (the dense "
            "gather-heavy baseline swings up to 13x across sessions on "
            "the tunneled dev chip; kernel rows are stable +-3%) — "
            "kernel_speedup_min is the honest floor of the claim"),
        "impl_guidance": (
            "'auto' resolves the kernel per batch from bank shapes "
            "(P_loc*4 <= P -> localized); auto_regret_vs_best ~1.0 means "
            "the dispatch picked the winning kernel in that bucket"),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "train_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
