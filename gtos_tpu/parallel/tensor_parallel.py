"""Tensor-parallel parameter sharding over the mesh's 'model' axis.

The reference has no tensor parallelism (SURVEY.md §2.3 TP row: "no");
the TPU-native framework adds it the GSPMD way: parameters get
NamedShardings by *rule*, activations inherit layouts and the compiler
inserts the collectives. Megatron-style column/row pairing keeps each
attention + FFN block to one psum on its output:

  q/k/v projections   kernel [D, D]     -> shard OUTPUT dim  (column)
  attention out_proj  kernel [D, D]     -> shard INPUT dim   (row, psum)
  ffn fc1             kernel [D, d_ff]  -> shard OUTPUT dim  (column)
  ffn fc2             kernel [d_ff, D]  -> shard INPUT dim   (row, psum)

Column-sharded layers also shard their bias; row-sharded layers keep the
bias replicated (it is added after the psum). Everything else (embeddings,
LayerNorms, the relation GRU, char CNN, the relation bank projection —
all small) stays replicated. A dimension that does not divide the axis
size falls back to replicated, so any model config is valid on any mesh.

The same rules are applied to the optimizer state: optax's Adam moments
mirror the params tree, so the path-suffix match puts mu/nu on the same
devices as their parameter.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense module names whose kernel is column-sharded (output dim on 'model').
_COLUMN = frozenset({"q_proj", "k_proj", "v_proj", "fc1"})
# Dense module names whose kernel is row-sharded (input dim on 'model').
# "out_proj" qualifies only inside an attention module — the relation
# encoder also names its final projection out_proj and stays replicated.
_ROW = frozenset({"fc2"})


def _path_names(path: Sequence[Any]) -> List[str]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return names


def param_spec(names: Sequence[str], shape: Sequence[int],
               axis_size: int) -> P:
    """PartitionSpec for one leaf, by its tree path and shape."""
    if axis_size <= 1 or len(names) < 2 or len(shape) == 0:
        return P()
    leaf, module = names[-1], names[-2]
    in_attention = any("attn" in n for n in names[:-1])

    if module in _COLUMN and leaf == "kernel" and len(shape) == 2:
        if shape[1] % axis_size == 0:
            return P(None, "model")
    elif module in _COLUMN and leaf == "bias" and len(shape) == 1:
        if shape[0] % axis_size == 0:
            return P("model")
    elif (module in _ROW or (module == "out_proj" and in_attention)):
        if leaf == "kernel" and len(shape) == 2 and shape[0] % axis_size == 0:
            return P("model", None)
        # row-layer bias: replicated (added after the output psum)
    return P()


def state_shardings(mesh: Mesh, state) -> Any:
    """NamedShardings for a full TrainState (params + optimizer moments).

    Works on any pytree: each leaf is matched by the trailing names of its
    path, so optax moment trees (which embed the params tree) land on the
    same shards as their parameters; scalars and unmatched leaves
    replicate."""
    axis_size = mesh.shape.get("model", 1)

    def leaf_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(
            mesh, param_spec(_path_names(path), shape, axis_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(mesh: Mesh, state):
    """Place a (host or replicated) TrainState per state_shardings."""
    return jax.device_put(state, state_shardings(mesh, state))
