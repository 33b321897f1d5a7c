"""Device mesh and sharding rules.

Reference counterpart: the reference's only parallelism is data-parallel
NCCL all-reduce spawned per process (SURVEY.md §2.3). Here a named
jax.sharding.Mesh carries up to three axes:

  data  — batch sharding (DP); gradient psum inserted by the compiler
  model — reserved for tensor-parallel sharding of MLP/attention heads
  graph — edge partitioning for context-parallel graph attention

Single-chip and multi-host runs use the same code: the mesh is built from
whatever jax.devices() offers (multi-host entry goes through
jax.distributed.initialize in the train CLI).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1, graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (mp * graph)
    assert dp * mp * graph == n, (
        f"mesh {dp}x{mp}x{graph} != {n} devices")
    arr = np.array(devices).reshape(dp, mp, graph)
    return Mesh(arr, axis_names=("data", "model", "graph"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# GraphBatch arrays whose leading dim is the batch; everything else (the
# relation bank) is batch-global and replicated.
_BATCH_LEADING = (
    "concept", "concept_char", "concept_mask", "rel_index", "token_in",
    "token_out", "token_mask", "cp_seq", "copy_mask",
)


def arrays_shardings(mesh: Mesh, arrays: Dict[str, np.ndarray]) -> Dict:
    out = {}
    for k, v in arrays.items():
        if k in _BATCH_LEADING:
            out[k] = batch_sharding(mesh, v.ndim)
        else:
            out[k] = replicate(mesh)
    return out


def shard_arrays(mesh: Mesh, arrays: Dict[str, np.ndarray]) -> Dict:
    """Host -> device transfer with the DP layout applied."""
    sh = arrays_shardings(mesh, arrays)
    return {k: jax.device_put(v, sh[k]) for k, v in arrays.items()}
