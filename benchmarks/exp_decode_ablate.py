"""Beam-step cost decomposition at K=8 (why is beam8 17x greedy?).

decode.json r5: jit beam ms/step = 0.189 (K=1), 1.102 (K=4), 3.243 (K=8)
— superlinear in K. This ablation times the beam body's components
separately on the real chip (marginal fori slope) to locate the cost:

  step_only          decoder step + ext_log_probs at B*K rows, caches
                     carried, no search bookkeeping
  step_topk          + the candidate top-k / seq bookkeeping / finished
                     pool merge, no cache reorder
  full               + the per-step cache reorder (the actual body)
  reorder_all        the cache reorder alone (all 16 leaves, incl. the
                     beam-invariant mem_k/mem_v)
  reorder_self       the reorder restricted to self_k/self_v
  step_only_h64      step_only with self-KV buffers sized to the 64-step
                     search horizon instead of max_target_len=128

Writes benchmarks/decode_ablate.json.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_decode import build  # noqa: E402

K = 8
HORIZON = 64


def main():
    from gtos_tpu.models.generator import Generator, batch_edges

    model, params, arrays, batch, tv = build()
    cfg = model.cfg
    B = arrays["concept"].shape[0]
    V = cfg.ext_vocab

    @jax.jit
    def encode(params, arrays):
        mem = model.apply(
            params, arrays["concept"], arrays["concept_char"],
            arrays["concept_mask"], arrays["rel_bank"],
            arrays["rel_length"], arrays["rel_index"], True,
            edges=batch_edges(arrays), method=Generator.encode)
        return mem

    mem = encode(params, arrays)
    rep = lambda x: jnp.repeat(x, K, axis=0)  # noqa: E731
    mem_t = rep(mem)
    concept_mask = rep(jnp.asarray(arrays["concept_mask"]))
    cp_seq = rep(jnp.asarray(arrays["cp_seq"]))
    copy_mask = rep(jnp.asarray(arrays["copy_mask"]))
    caches0 = jax.jit(lambda p, m: model.apply(
        p, m, method=Generator.init_cache))(params, mem_t)
    sizes = {"self_kv_leaf": list(caches0[0]["self_k"].shape),
             "mem_kv_leaf": list(caches0[0]["mem_k"].shape),
             "ext_vocab": V, "token_vocab": cfg.token_vocab}

    # horizon-64 variant of the self buffers
    caches_h64 = [
        dict(c, self_k=c["self_k"][:, :, :HORIZON],
             self_v=c["self_v"][:, :, :HORIZON]) for c in caches0]

    parent = np.random.default_rng(0).integers(0, K, size=(B, K))
    flat_parent = jnp.asarray(
        (np.arange(B)[:, None] * K + parent).reshape(-1), jnp.int32)

    def step_fn(tokens, pos, caches):
        return model.apply(
            params, tokens, pos, caches, concept_mask, cp_seq, copy_mask,
            method=Generator.decode_step)

    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def loop(caches, iters, mode):
        tok0 = jnp.full((B * K,), tv.str_id, jnp.int32)
        alive_logp = jnp.tile(
            jnp.array([0.0] + [-1e9] * (K - 1), jnp.float32)[None], (B, 1))
        Tm = caches[0]["self_k"].shape[2]
        alive_seq = jnp.zeros((B, K, Tm + 1), jnp.int32)
        fin_scores = jnp.full((B, K), -1e9, jnp.float32)
        fin_seq = jnp.zeros((B, K, Tm + 1), jnp.int32)
        fin_len = jnp.zeros((B, K), jnp.int32)

        def body(i, st):
            caches, alive_logp, alive_seq, fin_scores, fin_seq, fin_len = st
            t = (i % HORIZON).astype(jnp.int32)
            if mode == "full_pre_bk":
                # pre-reorder via take_along_axis over a [B, K, ...] view
                # (different XLA lowering than the flat axis-0 gather)
                chosen = jnp.clip(alive_seq[:, :, 0], 0, K - 1)

                def tak(v):
                    sh = v.shape
                    v5 = v.reshape(B, K, -1)
                    idx = chosen[:, :, None]
                    return jnp.take_along_axis(v5, idx, axis=1).reshape(sh)

                caches = [
                    {k: (tak(v) if k in ("self_k", "self_v") else v)
                     for k, v in c.items()} for c in caches]
            if mode == "full_pre":
                # reorder at body START with the parents chosen at the end
                # of the previous iteration (carried in alive_seq[:, :, 0]
                # as a stand-in slot) — gather feeds straight into the
                # step's dynamic_update_slice, which can then be in-place
                chosen = jnp.clip(alive_seq[:, :, 0], 0, K - 1)
                fp0 = (jnp.arange(B)[:, None] * K + chosen).reshape(-1)
                caches = [
                    {k: (v[fp0] if k in ("self_k", "self_v") else v)
                     for k, v in c.items()} for c in caches]
            if mode.startswith("reorder"):
                keys = (("self_k", "self_v") if mode == "reorder_self"
                        else ("self_k", "self_v", "mem_k", "mem_v"))
                caches = [
                    {k: (v[flat_parent] if k in keys else v)
                     for k, v in c.items()} for c in caches]
                alive_logp = alive_logp + caches[0]["self_k"][
                    0, 0, 0, 0].astype(jnp.float32) * 1e-30
                return (caches, alive_logp, alive_seq, fin_scores,
                        fin_seq, fin_len)
            tok = tok0 + (alive_logp.astype(jnp.int32).sum() * 0)
            logp, caches = step_fn(tok, t, caches)
            if mode == "step_only":
                alive_logp = alive_logp + 1e-30 * logp.reshape(
                    B, K, V)[:, :, 0]
                return (caches, alive_logp, alive_seq, fin_scores,
                        fin_seq, fin_len)
            # search bookkeeping (mirrors infer/beam.py body)
            logp = logp.reshape(B, K, V).astype(jnp.float32)
            cand = alive_logp[:, :, None] + logp
            flat = cand.reshape(B, K * V)
            topv, topi = jax.lax.top_k(flat, 2 * K)
            par = topi // V
            tok_n = (topi % V).astype(jnp.int32)
            is_end = tok_n == 0
            seqs = jnp.take_along_axis(alive_seq, par[:, :, None], axis=1)
            seqs = seqs.at[:, :, t + 1].set(tok_n)
            norm = topv / ((5.0 + t.astype(jnp.float32) + 1) / 6.0) ** 0.6
            fin_cand = jnp.where(is_end, norm, -1e9)
            afs = jnp.concatenate([fin_scores, fin_cand], axis=1)
            afq = jnp.concatenate([fin_seq, seqs], axis=1)
            afl = jnp.concatenate(
                [fin_len, jnp.full((B, 2 * K), t + 1, jnp.int32)], axis=1)
            fs, fi = jax.lax.top_k(afs, K)
            fin_seq = jnp.take_along_axis(afq, fi[:, :, None], axis=1)
            fin_len = jnp.take_along_axis(afl, fi, axis=1)
            alive_cand = jnp.where(is_end, -1e9, topv)
            av, ai = jax.lax.top_k(alive_cand, K)
            alive_logp = av * 1e-30 + alive_logp  # keep logp bounded
            alive_seq = jnp.take_along_axis(seqs, ai[:, :, None], axis=1)
            if mode.startswith("full"):
                chosen = jnp.take_along_axis(par, ai, axis=1)
                fp = (jnp.arange(B)[:, None] * K + chosen).reshape(-1)
                if mode == "full_matmul":
                    # reorder as a one-hot MXU matmul over [B, K, F]
                    P = (chosen[:, :, None]
                         == jnp.arange(K)[None, None, :]).astype(
                        caches[0]["self_k"].dtype)

                    def mm(v):
                        sh = v.shape
                        v3 = v.reshape(B, K, -1)
                        return jnp.einsum("bkj,bjf->bkf", P, v3).reshape(sh)

                    caches = [
                        {k: (mm(v) if k in ("self_k", "self_v") else v)
                         for k, v in c.items()} for c in caches]
                elif mode == "full_pre_bk":
                    chosen = jnp.take_along_axis(par, ai, axis=1)
                    alive_seq = alive_seq.at[:, :, 0].set(chosen)
                elif mode == "full_pre":
                    # stash the chosen parents for next iteration's
                    # pre-reorder; no cache touch here
                    chosen = jnp.take_along_axis(par, ai, axis=1)
                    alive_seq = alive_seq.at[:, :, 0].set(chosen)
                elif mode == "full_selfonly":
                    caches = [
                        {k: (v[fp] if k in ("self_k", "self_v") else v)
                         for k, v in c.items()} for c in caches]
                else:
                    caches = jax.tree_util.tree_map(
                        lambda c: c[fp], caches)
            return (caches, alive_logp, alive_seq, fs, fin_seq, fin_len)

        st = jax.lax.fori_loop(
            0, iters, body,
            (caches, alive_logp, alive_seq, fin_scores, fin_seq, fin_len))
        # consume the final caches so reorder-only modes aren't DCE'd
        tail = sum(c["self_k"][0, 0, 0, 0].astype(jnp.float32)
                   for c in st[0])
        return st[1] + tail * 1e-30

    def marginal(caches, mode, lo=64, hi=192):
        np.asarray(loop(caches, iters=lo, mode=mode))
        np.asarray(loop(caches, iters=hi, mode=mode))

        def run(iters):
            t0 = time.perf_counter()
            for _ in range(2):
                r = loop(caches, iters=iters, mode=mode)
            np.asarray(r)
            return (time.perf_counter() - t0) / 2

        t_lo = min(run(lo) for _ in range(3))
        t_hi = min(run(hi) for _ in range(3))
        return max(t_hi - t_lo, 1e-9) / (hi - lo)

    out = {"K": K, "B": B, "sizes": sizes, "ms_per_step": {}}
    for mode, caches in [("step_only", caches0), ("step_topk", caches0),
                         ("full", caches0), ("reorder_all", caches0),
                         ("reorder_self", caches0),
                         ("step_only_h64", caches_h64),
                         ("full_h64", caches_h64),
                         ("full_selfonly_h64", caches_h64),
                         ("full_matmul_h64", caches_h64),
                         ("full_pre_h64", caches_h64),
                         ("full_pre_bk_h64", caches_h64),
                         ("reorder_self_h64", caches_h64)]:
        m = mode[:-4] if mode.endswith("_h64") else mode
        out["ms_per_step"][mode] = round(marginal(caches, m) * 1e3, 3)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))
    with open("/root/repo/benchmarks/decode_ablate.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
