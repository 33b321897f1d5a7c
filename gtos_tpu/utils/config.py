"""Typed, JSON-serializable configs.

The reference's only config system is the argparse Namespace persisted inside
checkpoints (SURVEY.md §5 "Config / flag system"). Here configs are frozen
dataclasses serialized to JSON, stored in checkpoints so inference rebuilds
the exact model, with CLI overrides layered on top by the entry scripts.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # vocab sizes (filled from the extracted vocabs)
    token_vocab: int = 0
    concept_vocab: int = 0
    relation_vocab: int = 0
    char_vocab: int = 0
    # architecture (defaults follow the reference's scale: d=512, ff=1024,
    # 8 heads — SURVEY.md §2.2 model components)
    d_model: int = 512
    d_ff: int = 1024
    heads: int = 8
    enc_layers: int = 4
    dec_layers: int = 4
    # char CNN token encoder
    char_dim: int = 32
    char_filters: int = 128
    char_widths: Tuple[int, ...] = (3,)
    # relation path GRU encoder
    rel_emb_dim: int = 64
    rel_hidden: int = 128
    # regularization / output
    dropout: float = 0.2
    label_smoothing: float = 0.0
    tie_embeddings: bool = True
    # copy mechanism: extended vocab = token_vocab + max_oov
    max_oov: int = 64
    use_copy: bool = True
    # how the copy mass lands on the extended vocab:
    #   "onehot"  (default) one-hot MXU matmul — the scatter-add and its
    #             serialized VJP measured 1.5 ms/step at the dominant
    #             bucket (train_step_breakdown.json r5); the matmul's
    #             backward is just another matmul
    #   "scatter" XLA scatter-add (the reference's torch scatter_add_
    #             contract, SURVEY.md §3.4; parity-tested vs torch)
    copy_impl: str = "onehot"
    # translator path: nodes are source words in order -> add positions
    use_node_positions: bool = False
    # numerics: params stay f32; activations in compute_dtype
    compute_dtype: str = "float32"
    max_target_len: int = 128
    # encoder attention implementation:
    #   "xla"          pure-JAX bank decomposition (portable baseline)
    #   "pallas"       fused global-bank TPU kernel
    #   "pallas_local" fused LOCALIZED per-graph-bank kernel (fastest
    #                  measured at every bucket so far)
    #   "auto"         resolve pallas vs pallas_local PER BATCH from the
    #                  bank shapes (models/generator.resolve_attention_impl)
    #   "sparse"       O(E) edge-list attention; context-parallel over the
    #                  mesh 'graph' axis when one is wired in
    #   "block_sparse" Pallas 128x128-tile kernel; composes with the ring
    #                  CP schedule (the composed flagship)
    #   *_interpret    same kernels under the Pallas interpreter (CPU tests)
    attention_impl: str = "xla"
    # sparse mode: keep node pairs whose shortest path has <= k labels
    # (0 = all pairs, exact dense parity). Stored in the model config so
    # inference rebuilds the identical edge pipeline from the checkpoint.
    sparse_khop: int = 0
    # context-parallel boundary-exchange schedule for the sparse encoder:
    # "ring" (ppermute k/v rotation, overlap per step — best at large S) or
    # "a2a" (one all_gather + one all_to_all of partial softmax stats —
    # latency-lean at small S). See gtos_tpu/parallel/a2a_attention.py.
    cp_schedule: str = "ring"

    @property
    def ext_vocab(self) -> int:
        return self.token_vocab + self.max_oov

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.heads == 0
        return self.d_model // self.heads

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        if "char_widths" in d:
            d["char_widths"] = tuple(d["char_widths"])
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # optimizer: Adam + inverse-sqrt warmup (the transformer schedule the
    # reference uses — SURVEY.md §2.2 "Training driver")
    lr_scale: float = 1.0
    warmup_steps: int = 4000
    adam_b1: float = 0.9
    adam_b2: float = 0.98
    adam_eps: float = 1e-9
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    accum_steps: int = 1
    # loop
    total_steps: int = 10000
    eval_every: int = 500
    checkpoint_every: int = 1000
    batch_size_tokens: int = 4096
    seed: int = 19940117
    # mesh
    dp_size: int = 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        return cls(**json.loads(s))
