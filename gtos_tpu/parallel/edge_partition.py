"""Edge-partitioned (context-parallel) graph attention.

The framework's scaling flagship (SURVEY.md §2.3 CP row, §5 "Long-context"):
the reference's dense O(N^2) relation tensor caps graph size; here edges of
a large sparse graph are partitioned across the mesh's 'graph' axis, each
device runs SDDMM + partial segment reductions on its local edge shard, and
the three cross-device combines (per-node max, normalizer, weighted sum)
ride XLA collectives over ICI (BASELINE.json north_star: boundary exchange
overlapped with local aggregation — XLA's async collectives overlap the
psum of one layer with compute of the next).

Node features are replicated across the 'graph' axis (cheap: O(N*D) while
edges are O(E) >> N for dense-enough graphs); only per-node scalars and the
[N, D] output cross devices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtos_tpu.ops.segment import NEG_INF


def _local_attention_shard(q, k, v, src, dst, edge_mask, *, num_nodes,
                           axis_name):
    """Body run per device under shard_map: local edges, replicated nodes."""
    scale = q.shape[-1] ** -0.5
    e = jnp.sum(q[dst].astype(jnp.float32) * k[src].astype(jnp.float32),
                axis=-1) * scale
    e = jnp.where(edge_mask, e, NEG_INF)

    # global per-node max: local segment max, then cross-shard pmax
    seg_max_local = jax.ops.segment_max(e, dst, num_segments=num_nodes)
    seg_max = jax.lax.pmax(seg_max_local, axis_name)

    expd = jnp.exp(e - seg_max[dst])
    expd = jnp.where(edge_mask, expd, 0.0)

    # global normalizer
    seg_sum = jax.lax.psum(
        jax.ops.segment_sum(expd, dst, num_segments=num_nodes), axis_name)
    w = expd / (seg_sum[dst] + 1e-20)

    # local weighted aggregation, then cross-shard sum
    contrib = w[:, None] * v[src].astype(jnp.float32)
    out_local = jax.ops.segment_sum(contrib, dst, num_segments=num_nodes)
    return jax.lax.psum(out_local, axis_name)


def edge_parallel_attention(
    mesh: Mesh, q, k, v, src, dst, edge_mask, axis_name: str = "graph",
):
    """Sparse graph attention with edges sharded over `axis_name`.

    q, k, v: [N, D] replicated; src/dst/edge_mask: [E] with E divisible by
    the axis size (pad with masked edges). Returns [N, D] f32 replicated."""
    num_nodes = q.shape[0]
    fn = functools.partial(
        _local_attention_shard, num_nodes=num_nodes, axis_name=axis_name)
    rep = P()
    edge_spec = P(axis_name)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep, rep, rep, edge_spec, edge_spec, edge_spec),
        out_specs=rep,
    )(q, k, v, src, dst, edge_mask)
