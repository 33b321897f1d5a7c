from gtos_tpu.ops.pallas.relation_attention import (
    fused_relation_attention,
    pallas_relation_attention,
    relation_attention_trainable,
)
from gtos_tpu.ops.pallas.local_relation_attention import (
    local_relation_attention,
    local_relation_attention_trainable,
)

__all__ = [
    "fused_relation_attention",
    "pallas_relation_attention",
    "relation_attention_trainable",
    "local_relation_attention",
    "local_relation_attention_trainable",
]
