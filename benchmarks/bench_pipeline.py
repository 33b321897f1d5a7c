"""Training-LOOP throughput benchmark: synchronous vs pipelined driver.

bench_train_step.py times the jitted step in isolation; real training
throughput also pays the host work per batch (batchify, H2D transfer,
metric readback). This benchmark drives the actual Trainer.fit loop over
a real DataLoader on the flagship model and compares:

  sync      — prefetch=0, max_inflight=0 (the reference's host/device
              alternation, SURVEY.md §3.2)
  pipelined — prefetch=2, max_inflight=2 (background batchify +
              device_put, bounded in-flight dispatch window)

Writes benchmarks/pipeline.json and prints one JSON line.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def build(attention_impl: str = "pallas", n_corpus: int = 256):
    from gtos_tpu.data import DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.graph.paths import RelationPathConfig
    from gtos_tpu.utils.config import ModelConfig

    graphs, targets = synthetic_amr_corpus(n_corpus, seed=0, min_nodes=90,
                                           max_nodes=120)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets,
                           RelationPathConfig(max_path_len=3))
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.1, max_oov=64, max_target_len=128,
        compute_dtype="bfloat16", attention_impl=attention_impl)
    mk_dl = lambda: DataLoader(  # noqa: E731
        instances, tv, cv, rv, chv, lm, batch_size_tokens=4096,
        for_train=True, seed=0)
    return cfg, mk_dl


def run_loop(cfg, mk_dl, prefetch: int, inflight: int, steps: int):
    from gtos_tpu.models import Generator
    from gtos_tpu.train.trainer import Trainer
    from gtos_tpu.utils.config import TrainConfig

    dl = mk_dl()
    first = next(iter(dl))
    tcfg = TrainConfig(total_steps=steps, warmup_steps=4000,
                       eval_every=10 ** 9, checkpoint_every=10 ** 9)
    trainer = Trainer(Generator(cfg), cfg, tcfg, first.arrays(),
                      prefetch=prefetch, max_inflight=inflight)
    # warm the compile caches over the EXACT batch sequence the timer will
    # see: fit() consumes epochs epoch0+1.. whose reshuffles can produce
    # bucket signatures epoch 1 never emitted (ADVICE r2) — so replay those
    # epochs here, compile any new signature, then rewind the epoch counter
    epoch0 = dl.epoch
    seen = set()
    count = 0
    while count < steps:
        for batch in dl:
            count += 1
            arrays = trainer._put(batch.arrays())
            sig = tuple(sorted((k, v.shape) for k, v in arrays.items()))
            if sig not in seen:
                seen.add(sig)
                trainer.state, m = trainer.train_step(trainer.state, arrays)
            if count >= steps:
                break
    jax.block_until_ready(trainer.state.params)
    dl.epoch = epoch0
    trainer.state = dataclasses_replace_step(trainer.state, 0)

    t0 = time.perf_counter()
    last = trainer.fit(dl, log_every=10 ** 9)
    dt = time.perf_counter() - t0
    assert last["step"] == steps
    return dt / steps, last


def dataclasses_replace_step(state, step):
    import dataclasses

    import jax.numpy as jnp
    return dataclasses.replace(state, step=jnp.asarray(step, jnp.int32))


def main():
    steps = int(os.environ.get("BENCH_PIPELINE_STEPS", "40"))
    cfg, mk_dl = build()
    sync_ms, _ = run_loop(cfg, mk_dl, prefetch=0, inflight=0, steps=steps)
    pipe_ms, _ = run_loop(cfg, mk_dl, prefetch=2, inflight=2, steps=steps)
    out = {
        "metric": "train_loop_ms_per_step",
        "model": "d512 ff1024 h8 enc4 dec4 bf16, pallas encoder, real "
                 "DataLoader (~100-node synthetic graphs)",
        "steps_timed": steps,
        "sync_ms_per_step": round(sync_ms * 1e3, 2),
        "pipelined_ms_per_step": round(pipe_ms * 1e3, 2),
        "pipeline_speedup": round(sync_ms / pipe_ms, 3),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
