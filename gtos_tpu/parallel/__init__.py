from gtos_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate, shard_arrays,
)
from gtos_tpu.parallel.ring_attention import ring_sparse_relation_attention
from gtos_tpu.parallel.a2a_attention import a2a_sparse_relation_attention
from gtos_tpu.parallel.ring_block_sparse import (
    ring_block_sparse_relation_attention,
)
from gtos_tpu.parallel.tensor_parallel import (
    param_spec, shard_state, state_shardings,
)
from gtos_tpu.parallel.train import make_sharded_train_step

__all__ = [
    "make_mesh", "batch_sharding", "replicate", "shard_arrays",
    "ring_sparse_relation_attention", "a2a_sparse_relation_attention",
    "ring_block_sparse_relation_attention",
    "make_sharded_train_step", "param_spec", "shard_state",
    "state_shardings",
]
