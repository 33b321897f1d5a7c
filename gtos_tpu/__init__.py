"""gtos_tpu — a TPU-native graph-to-sequence framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of jcyk/gtos
(Cai & Lam, "Graph Transformer for Graph-to-Sequence Learning", AAAI 2020):
relation-aware graph-transformer encoders over AMR / dependency graphs with a
shortest-path GRU relation encoder, a transformer decoder with copy attention,
batched jit-compiled beam search, and SPMD scaling over TPU meshes.

Layout (mirrors SURVEY.md §1's layer map, made explicit):
  graph/     — graph IR: PENMAN AMR reader, dependency reader, shortest-path
               relation extraction, relation-bank dedup        (ref L3)
  data/      — vocabularies, LexicalMap, bucketed static-shape batching (L3)
  ops/       — pure-JAX reference ops + Pallas TPU kernels      (new L1)
  models/    — flax model family: encoders, graph transformer, copy decoder (L4)
  parallel/  — mesh axes, shardings, edge-partitioned graph parallelism (new L2)
  train/     — training driver, optimizer schedules, checkpointing     (L5)
  infer/     — jit beam search + inference driver                      (L5/L0)
  utils/     — typed configs, metrics, profiling                       (aux)
  native/    — C++ preprocessing runtime (shortest paths, packing)
"""

__version__ = "0.1.0"
