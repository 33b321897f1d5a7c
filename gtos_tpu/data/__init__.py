from gtos_tpu.data.vocab import Vocab, LexicalMap, PAD, UNK, STR, END, CLS
from gtos_tpu.data.batching import GraphBatch, batchify, BucketSpec
from gtos_tpu.data.dataloader import DataLoader

__all__ = [
    "Vocab", "LexicalMap", "PAD", "UNK", "STR", "END", "CLS",
    "GraphBatch", "batchify", "BucketSpec", "DataLoader",
]
