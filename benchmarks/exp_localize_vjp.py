"""Localize-VJP ablation: can the bank-localization scatter-add be beaten?

The pallas_local flagship gathers the GRU's relation vectors into per-graph
banks once per step (`rel_vecs[bank_map]`, graph_transformer.py) and pays
the gather's transpose — a [B*P_loc, D] -> [P, D] scatter-add — in the
backward. train_step_breakdown.json attributes ~1.3 ms/step to this round
trip at the dominant bucket (B=32, P_loc=768, P=16384, D=512), against an
HBM roofline of ~0.1 ms.

Variants measured (marginal fori_loop slope, readback-fenced, min of 3):
  gather_vjp      jax.grad of the plain gather (current model path: XLA
                  scatter-add with unsorted indices)
  scatter_sorted  flat ids argsorted once outside the loop; .at[].add with
                  indices_are_sorted=True
  segsum_sorted   jax.ops.segment_sum over the sorted ids
  prefix_matmul   scatter-free: permute grads into id order, blocked
                  inclusive prefix sum (128-row lower-triangular MXU
                  matmul + tiny block-carry cumsum), then g_bank[p] =
                  cum[end_p] - cum[start_p] — two gathers, no scatter
                  (the same sort-order trick as the local kernel's
                  in-kernel sorted-scatter, lifted to the XLA level)
  aux_device      cost of computing (perm, starts, ends) on device (paid
                  once per step if not reused from device_sort_bnd)

Writes benchmarks/localize_vjp.json.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B, D = 32, 512
MIN_NODES, MAX_NODES = 10, 31


def honest_bank_map():
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
    return np.asarray(batch.bank_map), batch.rel_bank.shape[0]


def blocked_prefix(gs):
    """Inclusive prefix sum along axis 0 of [M, D] via 128-row blocks:
    within-block lower-triangular matmul (MXU) + exclusive block carry."""
    M, D_ = gs.shape
    nb = M // 128
    g3 = gs.reshape(nb, 128, D_)
    tri = jnp.tril(jnp.ones((128, 128), gs.dtype))
    within = jnp.einsum("rc,bcd->brd", tri, g3)
    block_tot = within[:, -1, :]                      # [nb, D]
    carry = jnp.cumsum(block_tot, axis=0) - block_tot  # exclusive
    return (within + carry[:, None, :]).reshape(M, D_)


def main():
    bank_map, P = honest_bank_map()
    M = bank_map.size
    flat = jnp.asarray(bank_map.reshape(-1))
    key = jax.random.PRNGKey(0)
    rel_vecs = jax.random.normal(key, (P, D), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (B, bank_map.shape[1], D),
                          jnp.bfloat16)

    # device aux (measured separately below)
    perm = jnp.argsort(flat)
    sorted_ids = flat[perm]
    starts = jnp.searchsorted(sorted_ids, jnp.arange(P), side="left")
    ends = jnp.searchsorted(sorted_ids, jnp.arange(P), side="right")

    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def loop(g, rel_vecs, iters, mode):
        g_flat = g.reshape(-1, D)

        def body(i, carry):
            eps = (carry.astype(jnp.float32).sum() * 1e-20).astype(g.dtype)
            gf = g_flat + eps  # tie to carry so nothing hoists
            if mode == "gather_vjp":
                f = lambda rv: (rv[flat].astype(jnp.float32)
                                * gf.astype(jnp.float32)).sum()
                gb = jax.grad(f)(rel_vecs)
            elif mode == "scatter_sorted":
                gs = gf[perm].astype(jnp.float32)
                gb = jnp.zeros((P, D), jnp.float32).at[sorted_ids].add(
                    gs, indices_are_sorted=True)
            elif mode == "segsum_sorted":
                gs = gf[perm].astype(jnp.float32)
                gb = jax.ops.segment_sum(gs, sorted_ids, num_segments=P,
                                         indices_are_sorted=True)
            elif mode == "prefix_matmul":
                gs = gf[perm].astype(jnp.float32)
                cum = blocked_prefix(gs)
                cumz = jnp.concatenate(
                    [jnp.zeros((1, D), jnp.float32), cum], axis=0)
                gb = cumz[ends] - cumz[starts]
            elif mode == "aux_device":
                f2 = flat + (carry.astype(jnp.int32).sum() * 0)
                p = jnp.argsort(f2)
                s = f2[p]
                st = jnp.searchsorted(s, jnp.arange(P), side="left")
                en = jnp.searchsorted(s, jnp.arange(P), side="right")
                return carry + (p.sum() + st.sum() + en.sum()).astype(
                    carry.dtype) * 0 + 1
            return carry + (1e-6 * gb.sum()).astype(carry.dtype)

        return jax.lax.fori_loop(
            0, iters, body, jnp.zeros((), jnp.float32))

    def marginal(mode, lo, hi):
        np.asarray(loop(g, rel_vecs, iters=lo, mode=mode))
        np.asarray(loop(g, rel_vecs, iters=hi, mode=mode))

        def run(iters):
            t0 = time.perf_counter()
            for _ in range(3):
                r = loop(g, rel_vecs, iters=iters, mode=mode)
            np.asarray(r)
            return (time.perf_counter() - t0) / 3

        t_lo = min(run(lo) for _ in range(3))
        t_hi = min(run(hi) for _ in range(3))
        return max(t_hi - t_lo, 1e-9) / (hi - lo)

    # numeric agreement first
    ref = jax.grad(lambda rv: (rv[flat].astype(jnp.float32)
                               * g.reshape(-1, D).astype(jnp.float32)
                               ).sum())(rel_vecs)
    gs = g.reshape(-1, D)[perm].astype(jnp.float32)
    cum = blocked_prefix(gs)
    cumz = jnp.concatenate([jnp.zeros((1, D), jnp.float32), cum], axis=0)
    alt = (cumz[ends] - cumz[starts]).astype(ref.dtype)
    err = float(jnp.abs(alt.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())

    out = {"shapes": {"B": B, "P": P, "P_loc": int(bank_map.shape[1]),
                      "D": D, "M_updates": int(M)},
           "prefix_matmul_vs_gather_vjp_max_abs_err": err,
           "ms": {}}
    for mode, lo, hi in [("gather_vjp", 10, 60), ("scatter_sorted", 10, 60),
                         ("segsum_sorted", 10, 60),
                         ("prefix_matmul", 10, 60), ("aux_device", 10, 60)]:
        out["ms"][mode] = round(marginal(mode, lo, hi) * 1e3, 4)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))
    with open("/root/repo/benchmarks/localize_vjp.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
