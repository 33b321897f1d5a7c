"""Host-side data pipeline: preprocessing, bucketing, token-based batching.

Reference counterpart: generator/data.py `DataLoader` in jcyk/gtos
(SURVEY.md §2.2 "Batching / data pipeline"): sort/bucket instances by size,
token-count-based batch sizing, shuffle each epoch. TPU departure: batches
are grouped so every batch pads to ONE bucket signature (N, T bucket pair),
keeping the set of compiled XLA programs small.
"""

from __future__ import annotations

import random
from typing import Iterator, List, Optional, Sequence, Union

from gtos_tpu.data.batching import (
    BatchCapacityError, BucketSpec, GraphBatch, Instance, batchify,
)
from gtos_tpu.data.vocab import LexicalMap, Vocab
from gtos_tpu.graph.ir import Graph
from gtos_tpu.graph.paths import RelationPathConfig, relation_paths


def preprocess(
    graphs: Sequence[Graph],
    targets: Sequence[List[str]],
    path_cfg: RelationPathConfig = RelationPathConfig(),
    max_nodes: Optional[int] = None,
    interner=None,
) -> List[Instance]:
    """Graph + target -> Instance with precomputed shortest-path relations.

    The all-pairs BFS runs here, on the host, once per instance (SURVEY.md
    §3.1: path extraction happens in preprocessing, not at train time).
    Paths are kept in the deduplicated PackedPaths form (batchify consumes
    it with a vectorized bank mapping); the C++ extractor
    (gtos_tpu.native) is used when available, pure Python otherwise.

    Every instance's unique paths are interned into one corpus-level
    PathInterner (pass `interner` to share a table across calls, e.g.
    train + dev): instances then carry int path ids, and batchify's bank
    dedup + rel_bank encode run vectorized instead of per-path Python."""
    try:
        from gtos_tpu.native import pack_relation_paths_native as _pack
    except ImportError:
        from gtos_tpu.graph.paths import pack_relation_paths as _pack
    from gtos_tpu.graph.paths import PathInterner

    if interner is None:
        interner = PathInterner()
    out: List[Instance] = []
    for i, (g, tgt) in enumerate(zip(graphs, targets)):
        if max_nodes is not None and g.num_nodes + 1 > max_nodes:
            continue
        pp = _pack(g, path_cfg)
        pp.uniq_gid = interner.intern_many(pp.uniq)
        pp.interner = interner
        pp.uniq = None  # strings live once, in the interner
        out.append(Instance(concepts=list(g.nodes), pair_paths=pp,
                            target=list(tgt), meta=g.meta, orig_index=i))
    return out


# spawn-context process-pool plumbing: each worker deserializes the
# loader config ONCE (initializer), then packs whole instance groups with
# the ordinary _emit path — identical code, identical arrays
_POOL_LOADER = None


def _pool_init(loader_bytes):
    global _POOL_LOADER
    import pickle
    _POOL_LOADER = pickle.loads(loader_bytes)


def _pool_emit(idxs):
    """Pack one group, addressed by instance INDICES: the corpus (and its
    shared PathInterner) is inherited copy-on-write at fork (or shipped
    once by the spawn initializer), so the per-task message is a few ints
    out and the packed arrays back."""
    ld = _POOL_LOADER
    return list(ld._emit([ld.instances[i] for i in idxs]))


class DataLoader:
    """Iterates GraphBatches with token-count batch sizing.

    batch_size is measured in target tokens + nodes per batch (the
    reference sizes batches in tokens — SURVEY.md §2.2); for_train shuffles
    instance order and batch order each epoch.
    """

    def __init__(
        self,
        instances: Sequence[Instance],
        token_vocab: Vocab,
        concept_vocab: Vocab,
        relation_vocab: Vocab,
        char_vocab: Vocab,
        lexical_map: LexicalMap,
        batch_size_tokens: int = 4096,
        max_batch_instances: Optional[int] = None,
        spec: BucketSpec = BucketSpec(),
        for_train: bool = True,
        seed: int = 19940117,
        batch_multiple: int = 1,
        build_edges: bool = False,
        cp_shards: int = 1,
        sparse_khop: int = 0,
        build_block_tiles: Union[bool, str] = False,
        build_local_banks: Union[bool, str] = False,
        host_rank: int = 0,
        host_count: int = 1,
        workers: int = 0,
        worker_mode: str = "process",
    ):
        self.instances = list(instances)
        self.vocabs = dict(
            token=token_vocab, concept=concept_vocab,
            relation=relation_vocab, char=char_vocab,
        )
        self.lexical_map = lexical_map
        self.batch_size_tokens = batch_size_tokens
        self.max_batch_instances = max_batch_instances
        self.spec = spec
        self.for_train = for_train
        self.seed = seed
        self.epoch = 0
        # batch dim padded to a multiple of this (e.g. the mesh's dp size)
        self.batch_multiple = batch_multiple
        # sparse / context-parallel edge emission (see batchify)
        self.build_edges = build_edges
        self.cp_shards = cp_shards
        self.sparse_khop = sparse_khop
        self.build_block_tiles = build_block_tiles
        self.build_local_banks = build_local_banks
        # multi-host input sharding: the batch PLAN is host-invariant
        # (same seed/epoch); batchify builds row arrays only for the
        # contiguous row slice this host's devices own (batchify
        # host_shard docstring). batch_multiple must be a multiple of
        # host_count so every bucketed batch divides evenly.
        self.host_rank = host_rank
        self.host_count = host_count
        if host_count > 1:
            assert batch_multiple % host_count == 0, (
                f"batch_multiple {batch_multiple} must be a multiple of "
                f"host_count {host_count}")
        # parallel row packing WITHIN a host (VERDICT r3 next #7): batchify
        # groups are built by a worker pool, yielded strictly in plan
        # order so results are bit-identical to workers=0.
        # worker_mode='process' (default) forks spawn-context PROCESS
        # workers — the packing hot path holds the GIL in small-array
        # numpy/Python glue, so the r4 thread pool stopped scaling at 2
        # and was SLOWER at 4 (workers_scaling.json, VERDICT r4 weak #3);
        # processes shard the work for real. The data layer is numpy-only
        # (no jax import), so spawn workers are lightweight and safe next
        # to the TPU client. worker_mode='thread' keeps the old pool.
        self.workers = workers
        self.worker_mode = worker_mode
        self._pool = None  # lazy, reused across epochs

    def _cost(self, inst: Instance) -> int:
        return max(len(inst.target) + 1, len(inst.concepts) + 1)

    def _plan_batches(self) -> List[List[Instance]]:
        rng = random.Random(self.seed * 1000003 + self.epoch)
        insts = list(self.instances)
        if self.for_train:
            rng.shuffle(insts)
        # Bucket by padded signature so each batch has one static shape.
        insts.sort(key=lambda i: (
            BucketSpec.fit(self.spec.nodes, len(i.concepts) + 1),
            BucketSpec.fit(self.spec.target, len(i.target) + 1),
        ))
        batches: List[List[Instance]] = []
        cur: List[Instance] = []
        cur_cost = 0
        cur_sig = None
        for inst in insts:
            sig = (BucketSpec.fit(self.spec.nodes, len(inst.concepts) + 1),
                   BucketSpec.fit(self.spec.target, len(inst.target) + 1))
            c = self._cost(inst)
            over = (
                cur and (
                    sig != cur_sig
                    or cur_cost + c > self.batch_size_tokens
                    or (self.max_batch_instances and len(cur) >= self.max_batch_instances)
                )
            )
            if over:
                batches.append(cur)
                cur, cur_cost = [], 0
            cur.append(inst)
            cur_cost += c
            cur_sig = sig
        if cur:
            batches.append(cur)
        if self.for_train:
            rng.shuffle(batches)
        return batches

    def _emit(self, group) -> Iterator:
        """Batchify a group as (GraphBatch, instances); if its relation bank
        overflows the bucket cap (possible for batches of many large,
        path-diverse graphs), bisect until it fits."""
        # Pad batch dim to a power of two (shape stability), then to the
        # mesh multiple (DP divisibility).
        bsz = 1
        while bsz < len(group):
            bsz *= 2
        m = self.batch_multiple
        bsz = ((bsz + m - 1) // m) * m
        try:
            yield batchify(
                group,
                self.vocabs["token"], self.vocabs["concept"],
                self.vocabs["relation"], self.vocabs["char"],
                self.lexical_map, spec=self.spec,
                batch_size_bucket=bsz, for_train=self.for_train,
                build_edges=self.build_edges, cp_shards=self.cp_shards,
                sparse_khop=self.sparse_khop,
                build_block_tiles=self.build_block_tiles,
                build_local_banks=self.build_local_banks,
                host_shard=((self.host_rank, self.host_count)
                            if self.host_count > 1 else None),
            ), group
        except BatchCapacityError:
            if len(group) == 1:
                raise  # a single instance exceeding the bank cap is a
                # data/config problem, not a batching problem
            mid = len(group) // 2
            yield from self._emit(group[:mid])
            yield from self._emit(group[mid:])

    def _get_pool(self):
        if self._pool is None:
            if self.worker_mode == "thread":
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    self.workers, thread_name_prefix="gtos-batchify")
            else:
                import multiprocessing
                from concurrent.futures import ProcessPoolExecutor

                clone = DataLoader.__new__(DataLoader)
                clone.__dict__.update(self.__dict__)
                clone.workers = 0
                clone._pool = None
                methods = multiprocessing.get_all_start_methods()
                if "fork" in methods:
                    # fork (Linux): workers inherit the corpus + interner
                    # copy-on-write through the module global below — no
                    # per-worker pickling, and no re-import of __main__
                    # (spawn/forkserver both re-run user scripts that
                    # lack an `if __name__ == "__main__"` guard). The
                    # workers run pure-numpy packing and never touch the
                    # parent's jax runtime.
                    global _POOL_LOADER
                    _POOL_LOADER = clone
                    self._pool = ProcessPoolExecutor(
                        self.workers,
                        mp_context=multiprocessing.get_context("fork"))
                else:
                    # non-Linux fallback: spawn + one-time pickled config
                    import pickle
                    self._pool = ProcessPoolExecutor(
                        self.workers,
                        mp_context=multiprocessing.get_context("spawn"),
                        initializer=_pool_init,
                        initargs=(pickle.dumps(clone),))
        return self._pool

    def close(self):
        """Shut down the worker pool (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _iter_emitted(self) -> Iterator:
        """(batch, group) pairs in plan order, optionally built by a
        worker pool `self.workers` wide with a bounded in-flight window."""
        groups = self._plan_batches()
        if self.workers <= 1 or len(groups) < 2:
            for group in groups:
                yield from self._emit(group)
            return
        from collections import deque

        ex = self._get_pool()
        if self.worker_mode == "thread":
            task = lambda gg: list(self._emit(gg))  # noqa: E731
            items = groups
        else:
            task = _pool_emit
            pos = {id(inst): i for i, inst in enumerate(self.instances)}
            items = [[pos[id(g)] for g in group] for group in groups]
        gi = iter(items)
        futs: deque = deque()

        def submit():
            g = next(gi, None)
            if g is not None:
                futs.append(ex.submit(task, g))

        for _ in range(self.workers * 2):
            submit()
        while futs:
            for item in futs.popleft().result():
                yield item
            submit()

    def iter_with_instances(self) -> Iterator:
        """Yield (GraphBatch, instances-in-batch-order) pairs.

        The inference driver uses this to map hypotheses back to source
        instances while still going through the bank-overflow bisect that
        training batches get (VERDICT r1 weak #2)."""
        self.epoch += 1
        yield from self._iter_emitted()

    def __iter__(self) -> Iterator[GraphBatch]:
        self.epoch += 1
        for batch, _ in self._iter_emitted():
            yield batch

    def __len__(self) -> int:
        return len(self._plan_batches())
