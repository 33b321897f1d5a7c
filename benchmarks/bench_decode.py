"""Inference / serving benchmark: jit-compiled batched beam search.

The reference decodes with a Python time-step loop over live Hypothesis
objects (jcyk/gtos generator/work.py — SURVEY.md §3.5), one device
round-trip per step; here the WHOLE search (encode -> lax.while_loop over
cached decoder steps -> finished-pool ranking) is one XLA program per
(batch, beam) signature. This measures the serving rates on the real
chip: graphs/s and decoded target tokens/s at several beam sizes, for the
flagship d512 model.

Writes benchmarks/decode.json and prints one JSON line.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def build(attention_impl: str = "pallas"):
    from gtos_tpu.data import DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.graph.paths import RelationPathConfig
    from gtos_tpu.models import Generator
    from gtos_tpu.train.optim import make_optimizer
    from gtos_tpu.train.trainer import init_state
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    graphs, targets = synthetic_amr_corpus(64, seed=0, min_nodes=90,
                                           max_nodes=120)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets,
                           RelationPathConfig(max_path_len=3))
    dl = DataLoader(instances, tv, cv, rv, chv, lm, batch_size_tokens=4096,
                    for_train=False, seed=0)
    batch = max(iter(dl), key=lambda b: b.batch_size)
    cfg = ModelConfig(
        token_vocab=len(tv), concept_vocab=len(cv), relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.1, max_oov=64, max_target_len=128,
        compute_dtype="bfloat16", attention_impl=attention_impl)
    model = Generator(cfg)
    arrays = {k: np.asarray(v) for k, v in batch.arrays().items()}
    params = init_state(model, make_optimizer(TrainConfig(), cfg.d_model),
                        arrays, seed=0).params
    return model, params, arrays, batch, tv


def time_decode(model, params, arrays, tv, beam_size, max_steps=64,
                iters=5):
    from gtos_tpu.infer.decode import beam_decode_arrays

    kw = dict(beam_size=beam_size, max_steps=max_steps, alpha=0.6,
              str_id=tv.str_id, end_id=tv.end_id, unk_id=tv.unk_id)
    res = beam_decode_arrays(model, params, arrays, **kw)  # compile
    jax.block_until_ready(res.seqs)
    t0 = time.perf_counter()
    for _ in range(iters):
        res = beam_decode_arrays(model, params, arrays, **kw)
    seqs = np.asarray(res.seqs)  # readback fences completion
    dt = (time.perf_counter() - t0) / iters
    # decoded length of the best hypothesis per instance (up to END)
    best = seqs[:, 0, :]
    lens = []
    for row in best:
        ends = np.nonzero(row == tv.end_id)[0]
        lens.append(int(ends[0]) + 1 if len(ends) else len(row))
    return dt, int(np.sum(lens))


def main():
    model, params, arrays, batch, tv = build()
    B = arrays["concept"].shape[0]
    results = {}
    for k in (1, 4, 8):
        dt, n_tok = time_decode(model, params, arrays, tv, beam_size=k)
        results[f"beam{k}"] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "graphs_per_s": round(B / dt, 1),
            "decoded_tokens_per_s": round(n_tok / dt, 1),
        }
    out = {
        "metric": "beam_decode_throughput",
        "model": "d512 ff1024 h8 enc4 dec4 bf16, pallas encoder",
        "batch_graphs": B,
        "max_steps": 64,
        "beams": results,
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "decode.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
