"""Benchmark helpers: timing with block_until_ready fencing, shape builders.

Used by bench.py (driver-facing) and ad-hoc profiling scripts. The north
star metric is edges/s/chip for the relation-aware encoder hot path
(BASELINE.json "metric"); an 'edge' is one ordered node pair scored +
aggregated by attention (B * N^2 per layer pass).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median wall-clock seconds per call, fenced with block_until_ready."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def attention_inputs(key, B, H, N, Dh, P, dtype):
    import jax.numpy as jnp
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, N, Dh), dtype)
    k = jax.random.normal(ks[1], (B, H, N, Dh), dtype)
    v = jax.random.normal(ks[2], (B, H, N, Dh), dtype)
    a_bank = jax.random.normal(ks[3], (P, H, Dh), dtype)
    b_bank = jax.random.normal(ks[4], (P, H, Dh), dtype)
    rel_index = jax.random.randint(ks[5], (B, N, N), 0, P)
    mask = jnp.ones((B, N), bool)
    return q, k, v, a_bank, b_bank, rel_index, mask
