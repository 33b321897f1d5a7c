from gtos_tpu.ops.attention import (
    bank_relation_attention,
    bank_relation_scores,
    dense_relation_scores_reference,
)
from gtos_tpu.ops.segment import (
    segment_softmax,
    sparse_sddmm,
    sparse_spmm,
)

__all__ = [
    "bank_relation_attention",
    "bank_relation_scores",
    "dense_relation_scores_reference",
    "segment_softmax",
    "sparse_sddmm",
    "sparse_spmm",
]
