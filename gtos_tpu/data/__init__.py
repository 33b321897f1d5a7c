from gtos_tpu.data.vocab import Vocab, LexicalMap, PAD, UNK, STR, END, CLS
from gtos_tpu.data.batching import (
    BatchCapacityError, GraphBatch, batchify, BucketSpec,
)
from gtos_tpu.data.dataloader import DataLoader

__all__ = [
    "Vocab", "LexicalMap", "PAD", "UNK", "STR", "END", "CLS",
    "BatchCapacityError", "GraphBatch", "batchify", "BucketSpec",
    "DataLoader",
]
