"""Full-model training-step benchmark on the real TPU.

Times the COMPLETE jitted, donated training step (forward + backward +
clip + scheduled Adam) of the flagship AMR model at reference scale
(d=512, ff=1024, 8 heads, 4 enc + 4 dec layers, bf16 activations) on a
real batchified synthetic corpus (~100-node graphs, N=128 bucket), for
each encoder attention implementation. This is the end-to-end number the
per-op kernels exist to move.

Writes benchmarks/train_step.json and prints one JSON line.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def build(attention_impl: str):
    from gtos_tpu.data import DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.train.optim import make_optimizer
    from gtos_tpu.train.trainer import init_state, make_train_step
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    from gtos_tpu.graph.paths import RelationPathConfig

    graphs, targets = synthetic_amr_corpus(64, seed=0, min_nodes=90,
                                           max_nodes=120)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    # synthetic random-labeled trees have near-zero path dedup (real AMR's
    # Zipfian roles dedup far better); cap paths at 3 labels so a full
    # B=32, N=128, P=4096 batch fits the bank — the bench-scale shapes
    instances = preprocess(graphs, targets,
                           RelationPathConfig(max_path_len=3))
    # through the real DataLoader: the relation-bank cap decides how many
    # ~100-node graphs fit one batch (bank-overflow bisect), exactly as in
    # production training
    dl = DataLoader(instances, tv, cv, rv, chv, lm,
                    batch_size_tokens=4096, for_train=True, seed=0,
                    build_edges=(attention_impl == "sparse"),
                    build_local_banks=attention_impl.startswith(
                        "pallas_local"))
    batch = max(iter(dl), key=lambda b: b.batch_size)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.1, max_oov=64, max_target_len=128,
        compute_dtype="bfloat16", attention_impl=attention_impl)
    model = Generator(cfg)
    tx = make_optimizer(TrainConfig(warmup_steps=4000), cfg.d_model)
    arrays = {k: np.asarray(v) for k, v in batch.arrays().items()}
    state = init_state(model, tx, arrays, seed=0)
    step = make_train_step(model, tx)
    return step, state, arrays, batch


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
    results = {}
    for impl in ("xla", "pallas", "pallas_local"):
        step, state, arrays, batch = build(impl)
        dt, loss = time_steps(step, state, arrays)
        n_tok = int(arrays["token_mask"].sum())
        B, N = arrays["concept"].shape
        results[impl] = {
            "ms_per_step": round(dt * 1e3, 2),
            "target_tokens_per_s": round(n_tok / dt, 1),
            "edges_per_s": round(B * N * N / dt, 1),
            "loss": round(loss, 4),
        }
    out = {
        "metric": "full_train_step_ms",
        "model": "d512 ff1024 h8 enc4 dec4 bf16, B=32, N=128 bucket",
        "impls": results,
        "kernel_speedup": round(results["xla"]["ms_per_step"]
                                / results["pallas"]["ms_per_step"], 2),
        "local_kernel_speedup": round(
            results["xla"]["ms_per_step"]
            / results["pallas_local"]["ms_per_step"], 2),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "train_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
