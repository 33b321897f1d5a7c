"""Host batchify scaling with DataLoader(workers=N) — VERDICT r3 next #7.

Walks one epoch of the dominant-bucket synthetic corpus (build_local_banks,
the heaviest host path) at several worker counts and reports wall time per
batch. Runs on the host only; pairs with train_step_breakdown.json's
host-vs-device comparison.

Writes benchmarks/workers_scaling.json and prints one JSON line.
"""

import json
import os
import time


def main():
    from gtos_tpu.data import BucketSpec, DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus

    graphs, targets = synthetic_amr_corpus(256, seed=0, min_nodes=10,
                                           max_nodes=31)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    spec = BucketSpec(bank=(4096, 8192, 16384, 32768))

    rows = {}
    n_batches = None
    for w in (0, 2, 4):
        dl = DataLoader(instances, tv, cv, rv, chv, lm,
                        batch_size_tokens=4096, for_train=True, seed=0,
                        spec=spec, build_local_banks=True, workers=w)
        # warm epoch (allocators, caches), then timed epoch
        sum(1 for _ in dl)
        t0 = time.perf_counter()
        n = sum(1 for _ in dl)
        dt = time.perf_counter() - t0
        n_batches = n
        rows[f"workers_{w}"] = round(dt / n * 1e3, 2)

    out = {
        "metric": "host_batchify_ms_per_batch",
        "corpus": "256 synthetic AMR graphs, dominant bucket, "
                  "build_local_banks",
        "n_batches_per_epoch": n_batches,
        "ms_per_batch": rows,
        "speedup_2_workers": round(rows["workers_0"] / rows["workers_2"],
                                   2),
        "host": f"{os.cpu_count()} vCPUs (dev box; production TPU-VM "
                "hosts have ~100 cores for the same thread pool)",
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "workers_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
