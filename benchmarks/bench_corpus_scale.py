"""Corpus-scale pipeline evidence (VERDICT r4 next #6 / missing #1).

Every prior artifact used <= 3,000 synthetic instances; AMR 2.0 is ~36k
with a long-tailed size distribution. This runs the REAL pipeline at that
scale on the v5e — synthetic_amr2_corpus (36k train / 1,368 dev,
log-normal node counts to 80, targets to 100 tokens, Zipf lemma pools)
through extract -> preprocess (C++ BFS when built) -> DataLoader ->
config-2 training — and records what a licensed AMR 2.0 run would
stress:

  * bucket/bank histogram of one epoch's batches and the number of
    DISTINCT compiled signatures (the static-shape policy's compile
    budget);
  * host batchify rate at scale (post-r5 interner + device-aux path);
  * steps/s and tokens/s of c2-scale training (d512/4+4 bf16
    pallas_local) over the first TRAIN_STEPS steps incl. all compiles,
    and the steady rate excluding them.

Writes benchmarks/corpus_scale.json and prints one JSON line.
PARITY.md holds the verbatim command sequence for a licensed host.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

N_TRAIN = 36000
TRAIN_STEPS = 200


def main():
    from gtos_tpu.data import BucketSpec, DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr2_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.train.trainer import Trainer
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    t0 = time.perf_counter()
    graphs, targets = synthetic_amr2_corpus(N_TRAIN, seed=0)
    dev_graphs, dev_targets = synthetic_amr2_corpus(1368, seed=1)
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    t_vocab = time.perf_counter() - t0

    t0 = time.perf_counter()
    instances = preprocess(graphs, targets)
    t_prep = time.perf_counter() - t0
    try:
        from gtos_tpu.native import pack_relation_paths_native  # noqa
        prep_impl = "C++ (gtos_tpu.native)"
    except ImportError:
        prep_impl = "pure Python"

    spec = BucketSpec(bank=(4096, 8192, 16384, 32768, 65536))
    dl = DataLoader(instances, tv, cv, rv, chv, lm,
                    batch_size_tokens=8192, for_train=True, seed=0,
                    spec=spec, build_local_banks=True)

    # host-only epoch walk: bucket histogram + distinct signatures
    t0 = time.perf_counter()
    sig_hist = {}
    n_batches = 0
    for batch in dl:
        a = batch.arrays()
        sig = (a["concept"].shape[1], a["token_in"].shape[1],
               a["rel_bank"].shape[0], a["bank_map"].shape[1],
               a["concept"].shape[0])
        key = f"N{sig[0]}_T{sig[1]}_P{sig[2]}_Ploc{sig[3]}_B{sig[4]}"
        sig_hist[key] = sig_hist.get(key, 0) + 1
        n_batches += 1
    t_epoch_host = time.perf_counter() - t0

    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.2, label_smoothing=0.1, max_oov=64,
        max_target_len=128, compute_dtype="bfloat16",
        attention_impl="pallas_local")
    tcfg = TrainConfig(total_steps=TRAIN_STEPS, warmup_steps=4000,
                       batch_size_tokens=8192, eval_every=10 ** 9,
                       checkpoint_every=10 ** 9)
    first = next(iter(dl))
    trainer = Trainer(Generator(cfg), cfg, tcfg, first.arrays())

    t0 = time.perf_counter()
    stamps = []

    class StampLoader:
        def __iter__(self):
            for b in dl:
                stamps.append(time.perf_counter())
                yield b
        epoch = 0

    last = trainer.fit(StampLoader(), log_every=50)
    t_train = time.perf_counter() - t0
    # steady rate: drop the first half (captures all signature compiles)
    half = len(stamps) // 2
    steady = ((stamps[-1] - stamps[half]) / max(len(stamps) - 1 - half, 1)
              if len(stamps) > half + 1 else float("nan"))

    out = {
        "metric": "corpus_scale_pipeline",
        "corpus": {
            "train_instances": len(instances),
            "dev_instances": len(dev_graphs),
            "node_dist": "lognormal mean~15, p95~34, max 80",
            "target_dist": "mean~20 tokens, max 100",
            "token_vocab": len(tv), "concept_vocab": len(cv),
            "relation_vocab": len(rv),
        },
        "preprocess": {
            "generate_s": round(t_gen, 1),
            "build_vocabs_s": round(t_vocab, 1),
            "all_pairs_paths_s": round(t_prep, 1),
            "impl": prep_impl,
        },
        "epoch_walk_host_only": {
            "n_batches": n_batches,
            "ms_per_batch": round(t_epoch_host / n_batches * 1e3, 2),
            "distinct_signatures": len(sig_hist),
            "signature_histogram": sig_hist,
        },
        "training": {
            "model": "c2 scale: d512 ff1024 h8 enc4 dec4 bf16 "
                     "pallas_local",
            "steps": TRAIN_STEPS,
            "total_s_incl_compiles": round(t_train, 1),
            "steady_s_per_step": round(steady, 4),
            "steady_steps_per_s": round(1.0 / steady, 2),
            "final_loss": last.get("loss"),
            "final_tokens_per_s": last.get("tokens_per_s"),
            "final_edges_per_s": last.get("edges_per_s"),
        },
        "device": str(jax.devices()[0]),
        "note": "synthetic stand-in at AMR 2.0 scale; PARITY.md has the "
                "verbatim licensed-host commands",
    }
    path = os.path.join(os.path.dirname(__file__), "corpus_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
