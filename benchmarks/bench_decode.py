"""Inference / serving benchmark: jit-compiled batched beam search vs
per-step dispatch (VERDICT r4 next #4 — the north star's beam-search axis).

The reference decodes with a Python time-step loop over live Hypothesis
objects (jcyk/gtos generator/work.py — SURVEY.md §3.5): one device
dispatch + host readback per decode step. BASELINE.json's north_star
mandates replacing that with a jit-compiled lax.while — this measures
both on the real chip at config-2 scale (d512/4+4 bf16, dominant AMR
bucket, pallas_local encoder prefill):

  * jit_beam: encode + the whole lax.while search in ONE XLA program;
    timed with the carry-tied marginal-slope protocol (the tunneled chip
    makes single-dispatch wall times unreliable);
  * per_step baseline: the same greedy math driven step-by-step from the
    host — one jitted decode_step dispatch + token readback per step,
    exactly the reference's loop shape. Wall-clock, min over repeats.
    Tunnel caveat: each step pays RPC latency a local-GPU reference
    would not; the no-readback variant (async dispatch pipeline, block
    at end) is reported as the baseline's lower bound.

END is disabled (end_id = -1) so every sequence runs the full horizon —
a deterministic, params-independent token workload for both sides.

Writes benchmarks/decode.json and prints one JSON line.
"""

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

MAX_STEPS = 64


def build(attention_impl: str = "pallas_local", vocab_pad: int = 0):
    """vocab_pad: inflate token_vocab to at least this size (extra rows
    are never-predicted padding). The synthetic corpus dedups to a ~100-id
    vocab; real AMR 2.0 training vocabs are ~20k, and the output
    projection + softmax + top-k over the extended vocab scale with it —
    the padded variant keeps the decode numbers honest at production
    vocab scale."""
    from gtos_tpu.data import BucketSpec, DataLoader
    from gtos_tpu.data.dataloader import preprocess
    from gtos_tpu.data.extract import build_vocabs
    from gtos_tpu.data.synthetic import synthetic_amr_corpus
    from gtos_tpu.models import Generator
    from gtos_tpu.train.optim import make_optimizer
    from gtos_tpu.train.trainer import init_state
    from gtos_tpu.utils.config import ModelConfig, TrainConfig

    graphs, targets = synthetic_amr_corpus(32, seed=0, min_nodes=10,
                                           max_nodes=31)
    tv, cv, rv, chv, lm = build_vocabs(graphs, targets)
    instances = preprocess(graphs, targets)
    dl = DataLoader(instances, tv, cv, rv, chv, lm,
                    batch_size_tokens=4096, for_train=False, seed=0,
                    spec=BucketSpec(bank=(4096, 8192, 16384, 32768,
                                          65536)),
                    build_local_banks=True)
    batch = max(iter(dl), key=lambda b: b.batch_size)
    cfg = ModelConfig(
        token_vocab=max(len(tv), vocab_pad), concept_vocab=len(cv),
        relation_vocab=len(rv),
        char_vocab=len(chv), d_model=512, d_ff=1024, heads=8, enc_layers=4,
        dec_layers=4, dropout=0.1, max_oov=64, max_target_len=128,
        compute_dtype="bfloat16", attention_impl=attention_impl)
    model = Generator(cfg)
    arrays = {k: np.asarray(v) for k, v in batch.arrays().items()}
    params = init_state(model, make_optimizer(TrainConfig(), cfg.d_model),
                        arrays, seed=0).params
    return model, params, arrays, batch, tv


def time_jit_beam(model, params, arrays, tv, beam_size, lo=2, hi=8):
    """Carry-tied marginal slope of the WHOLE jit decode program."""
    from gtos_tpu.infer.decode import beam_decode_arrays

    kw = dict(beam_size=beam_size, max_steps=MAX_STEPS, alpha=0.6,
              str_id=tv.str_id, end_id=-1, unk_id=tv.unk_id)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(params, arrays, iters):
        def body(i, eps):
            p = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype) if x.dtype in
                (jnp.float32, jnp.bfloat16) else x, params)
            res = beam_decode_arrays(model, p, arrays, **kw)
            return eps + 1e-30 * res.scores.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run(iters, calls=2):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = loop(params, arrays, iters)
        np.asarray(r)
        return (time.perf_counter() - t0) / calls

    np.asarray(loop(params, arrays, lo))
    np.asarray(loop(params, arrays, hi))
    t_lo = min(run(lo) for _ in range(3))
    t_hi = min(run(hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def time_per_step_greedy(model, params, arrays, tv, readback=True,
                         repeats=5):
    """The reference's loop shape: host-driven greedy decode, one jitted
    decode_step dispatch per step (+ optional token readback)."""
    from gtos_tpu.models.generator import Generator, batch_edges

    B = arrays["concept"].shape[0]

    @jax.jit
    def encode(params, arrays):
        mem = model.apply(
            params, arrays["concept"], arrays["concept_char"],
            arrays["concept_mask"], arrays["rel_bank"],
            arrays["rel_length"], arrays["rel_index"], True,
            edges=batch_edges(arrays), method=Generator.encode)
        caches = model.apply(params, mem, method=Generator.init_cache)
        return mem, caches

    @jax.jit
    def step(params, tokens, pos, caches, concept_mask, cp_seq, copy_mask):
        logp, caches = model.apply(
            params, tokens, pos, caches, concept_mask, cp_seq, copy_mask,
            method=Generator.decode_step)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)   # [B]
        # extended-vocab copy ids feed back as UNK (beam.py contract)
        feed = jnp.where(nxt >= model.cfg.token_vocab, tv.unk_id, nxt)
        return feed, caches

    def decode_once():
        mem, caches = encode(params, arrays)
        tokens = jnp.full((B,), tv.str_id, jnp.int32)
        for t in range(MAX_STEPS):
            tokens, caches = step(params, tokens, jnp.int32(t), caches,
                                  arrays["concept_mask"], arrays["cp_seq"],
                                  arrays["copy_mask"])
            if readback:
                np.asarray(tokens)  # the reference reads top-k every step
        jax.block_until_ready(tokens)

    decode_once()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        decode_once()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    model, params, arrays, batch, tv = build()
    B = arrays["concept"].shape[0]
    N = arrays["concept"].shape[1]

    t_step = time_per_step_greedy(model, params, arrays, tv, readback=True)
    t_step_async = time_per_step_greedy(model, params, arrays, tv,
                                        readback=False)
    beams = {}
    t_greedy = None
    for k in (1, 4, 8):
        t = time_jit_beam(model, params, arrays, tv, beam_size=k)
        if k == 1:
            t_greedy = t
        beams[f"beam{k}"] = {
            "ms_per_batch": round(t * 1e3, 2),
            "graphs_per_s": round(B / t, 1),
            "decoded_tokens_per_s": round(B * MAX_STEPS / t, 1),
            "ms_per_step": round(t * 1e3 / MAX_STEPS, 3),
        }

    # production-vocab variant: same model/search at token_vocab=20k
    # (real AMR 2.0 scale) so the logits/softmax/top-k cost is honest
    vmodel, vparams, varrays, _, vtv = build(vocab_pad=20000)
    vocab20k = {}
    for k in (1, 8):
        t = time_jit_beam(vmodel, vparams, varrays, vtv, beam_size=k)
        vocab20k[f"beam{k}"] = {
            "ms_per_batch": round(t * 1e3, 2),
            "decoded_tokens_per_s": round(B * MAX_STEPS / t, 1),
            "ms_per_step": round(t * 1e3 / MAX_STEPS, 3),
        }

    out = {
        "metric": "beam_decode_throughput",
        "model": "d512 ff1024 h8 enc4 dec4 bf16, pallas_local encoder "
                 "prefill",
        "batch_graphs": B,
        "node_bucket": N,
        "max_steps": MAX_STEPS,
        "protocol": {
            "jit_beam": "carry-tied fori marginal slope, min of 3",
            "per_step": "host loop, min of 5 wall-clock runs; "
                        "'readback' dispatches + reads tokens every "
                        "step (the reference's work.py shape), 'async' "
                        "only dispatches (lower bound — a local-GPU "
                        "host would sit between the two; the tunneled "
                        "chip inflates the readback variant's RPC cost)",
        },
        "jit_lax_while_beams": beams,
        "jit_beams_token_vocab_20k": dict(
            vocab20k,
            note="same search with token_vocab padded to 20k (AMR 2.0 "
                 "production scale; the synthetic corpus vocab is ~100 "
                 "ids, which understates the output-projection/softmax/"
                 "top-k share)"),
        "per_step_dispatch_greedy": {
            "ms_per_batch_readback": round(t_step * 1e3, 2),
            "ms_per_batch_async": round(t_step_async * 1e3, 2),
        },
        "speedup_jit_vs_per_step_greedy": {
            "vs_readback": round(t_step / t_greedy, 1),
            "vs_async_lower_bound": round(t_step_async / t_greedy, 1),
        },
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "decode.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
