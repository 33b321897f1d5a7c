"""Scaling-efficiency harness (BASELINE config 5).

Measures edges/s of the edge-partitioned context-parallel attention at
1 device vs the full mesh and reports efficiency = rate_N / (N * rate_1)
— the north-star ">= 80% edges/s scaling efficiency" check. On CI this
runs on the virtual CPU mesh (validating the harness and the sharding);
on a pod the same entry measures real ICI scaling.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtos_tpu.ops.segment import sparse_graph_attention
from gtos_tpu.parallel.edge_partition import edge_parallel_attention
from gtos_tpu.parallel.mesh import make_mesh


def _bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def scaling_report(num_nodes: int = 4096, num_edges: int = 1 << 18,
                   dim: int = 128, seed: int = 0,
                   devices=None) -> dict:
    """-> {edges_per_s_1dev, edges_per_s_mesh, n_devices, efficiency}."""
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    E = (num_edges // n_dev) * n_dev
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    q, k, v = (jax.random.normal(kk, (num_nodes, dim))
               for kk in jax.random.split(key, 3))
    src = jnp.asarray(rng.integers(0, num_nodes, E), jnp.int32)
    dst = jnp.asarray(np.sort(rng.integers(0, num_nodes, E)), jnp.int32)
    mask = jnp.ones((E,), bool)

    single = jax.jit(
        lambda q, k, v: sparse_graph_attention(q, k, v, src, dst, mask,
                                               num_nodes))
    t1 = _bench(single, q, k, v)

    mesh = make_mesh(dp=1, mp=1, graph=n_dev, devices=devices)
    multi = jax.jit(
        lambda q, k, v: edge_parallel_attention(mesh, q, k, v, src, dst,
                                                mask))
    tn = _bench(multi, q, k, v)

    r1, rn = E / t1, E / tn
    return {
        "n_devices": n_dev,
        "edges_per_s_1dev": r1,
        "edges_per_s_mesh": rn,
        "speedup": rn / r1,
        "efficiency": rn / (n_dev * r1),
    }


if __name__ == "__main__":
    print(scaling_report())
