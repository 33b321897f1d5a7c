"""Scaling-efficiency harness (BASELINE config 5).

Measures edges/s of the ring context-parallel sparse relation attention
(gtos_tpu.parallel.ring_attention — node blocks + edge cells sharded over
the 'graph' axis, ppermute boundary exchange) at 1 device vs the full mesh
and reports efficiency = rate_N / (N * rate_1) — the north-star ">= 80%
edges/s scaling efficiency" check (BASELINE.json). On CI this runs on the
virtual CPU mesh (validating the harness and the sharding); on a pod the
same entry measures real ICI scaling.

Run as a script to write the JSON artifact:
    python -m gtos_tpu.parallel.scaling --out scaling_report.json
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtos_tpu.ops.sparse_relation import (
    flatten_edge_cells, sparse_relation_attention,
)
from gtos_tpu.parallel.mesh import make_mesh
from gtos_tpu.parallel.ring_attention import ring_sparse_relation_attention


def _bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _random_cells(rng, B, N, S, edges_per_node, P):
    """Random sparse edge cells [B, S, S, Ec] with ~edges_per_node incoming
    edges per node, evenly spread over source blocks."""
    nl = N // S
    Ec = max(1, (nl * edges_per_node) // S)
    esrc = rng.integers(0, nl, (B, S, S, Ec)).astype(np.int32)
    edst = np.sort(rng.integers(0, nl, (B, S, S, Ec)), axis=-1).astype(np.int32)
    erel = rng.integers(0, P, (B, S, S, Ec)).astype(np.int32)
    emask = np.ones((B, S, S, Ec), bool)
    return tuple(jnp.asarray(x) for x in (esrc, edst, erel, emask))


def scaling_report(num_nodes: int = 2048, edges_per_node: int = 64,
                   batch: int = 1, heads: int = 8, dim: int = 64,
                   bank: int = 512, seed: int = 0,
                   devices=None) -> dict:
    """-> scaling dict incl. edges/s at 1 device and at the full mesh."""
    devices = list(devices if devices is not None else jax.devices())
    S = len(devices)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    q, k, v = (jax.random.normal(kk, (batch, heads, num_nodes, dim),
                                 jnp.float32) for kk in ks[:3])
    a_bank = jax.random.normal(ks[3], (bank, heads, dim)) * 0.5
    b_bank = jax.random.normal(ks[4], (bank, heads, dim)) * 0.5

    # single device: flat COO through the O(E) op
    cells1 = _random_cells(rng, batch, num_nodes, 1, edges_per_node, bank)
    E = int(cells1[3].sum())
    flat = flatten_edge_cells(*cells1, num_nodes=num_nodes)
    single = jax.jit(lambda q, k, v: sparse_relation_attention(
        q, k, v, a_bank, b_bank, *flat))
    t1 = _bench(single, q, k, v)

    # full mesh: same edge budget in the [B, S, S, Ec] cell layout
    cellsN = _random_cells(rng, batch, num_nodes, S, edges_per_node, bank)
    E_n = int(cellsN[3].sum())
    mesh = make_mesh(dp=1, mp=1, graph=S, devices=devices)
    multi = jax.jit(lambda q, k, v: ring_sparse_relation_attention(
        mesh, q, k, v, a_bank, b_bank, *cellsN))
    tn = _bench(multi, q, k, v)

    r1, rn = E / t1, E_n / tn
    return {
        "op": "ring_sparse_relation_attention",
        "n_devices": S,
        "num_nodes": num_nodes,
        "edges_1dev": E,
        "edges_mesh": E_n,
        "edges_per_s_1dev": r1,
        "edges_per_s_mesh": rn,
        "speedup": rn / r1,
        "efficiency": rn / (S * r1),
        "per_device_nodes": num_nodes // S,
        "device": str(devices[0]),
    }


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="scaling_report.json")
    p.add_argument("--num_nodes", type=int, default=2048)
    p.add_argument("--edges_per_node", type=int, default=64)
    args = p.parse_args(argv)
    rep = scaling_report(num_nodes=args.num_nodes,
                         edges_per_node=args.edges_per_node)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
