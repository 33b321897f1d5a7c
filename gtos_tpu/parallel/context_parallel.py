"""Context parallelism for the relation-aware graph attention.

SURVEY.md §2.3 calls graph context-parallelism "the framework's flagship":
the reference's dense O(N^2) relation tensor caps graph size on one device;
here the N^2 pair-score computation of the *actual model op* (the 4-term
bank decomposition, gtos_tpu.ops.attention) is partitioned across the
mesh's 'graph' axis by QUERY-NODE BLOCK:

  device s holds q rows [B, H, N/s, D] and rel_index rows [B, N/s, N];
  k, v, the relation banks, and the key mask are replicated (O(N*D) and
  O(P*D) — small next to the O(N^2) score block).

Each device's score rows are COMPLETE (it sees all keys), so the softmax
needs no cross-device reduction — the only collective is the implicit
all-gather of the [B, H, N/s, D] outputs when the layer's out-projection
consumes them, which XLA overlaps with the next block's compute. This is
the graph analog of sequence parallelism for self-attention: memory per
device drops from O(N^2) to O(N^2 / s), so maximum graph size grows with
the mesh.

Composable with DP (batch axis) and TP (head axis) — specs below shard
only the node dim; jit propagates the rest.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from gtos_tpu.ops.attention import bank_relation_attention


def _local_block(q, k, v, a_bank, b_bank, rel_index, key_mask):
    # q: [B, H, n_local, D]; rel_index: [B, n_local, N]; rows are complete,
    # so the plain single-device op runs unchanged on the rectangular block.
    out, _ = bank_relation_attention(q, k, v, a_bank, b_bank, rel_index,
                                     key_mask)
    return out


def node_parallel_relation_attention(
    mesh: Mesh, q, k, v, a_bank, b_bank, rel_index, key_mask,
    axis_name: str = "graph",
):
    """Relation-aware attention with query nodes sharded over `axis_name`.

    q, k, v: [B, H, N, D]; a_bank/b_bank: [P, H, D]; rel_index: [B, N, N];
    key_mask: [B, N]. N must divide the axis size (pad nodes to the bucket
    ladder as usual). Returns out [B, H, N, D] sharded on the node dim.
    """
    n_shards = mesh.shape[axis_name]
    N = q.shape[2]
    assert N % n_shards == 0, (
        f"node dim {N} not divisible by '{axis_name}' axis {n_shards}")
    rep = P()
    return jax.shard_map(
        _local_block,
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None), rep, rep, rep, rep,
                  P(None, axis_name, None), rep),
        out_specs=P(None, None, axis_name, None),
    )(q, k, v, a_bank, b_bank, rel_index, key_mask)
