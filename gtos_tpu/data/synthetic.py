"""Synthetic AMR-like and dependency-like corpora.

The LDC corpora the reference trains on (AMR 2.0 / 1.0, News Commentary) are
licensed and not present in this image, so tests, end-to-end smoke training,
and benchmarks run on synthetic corpora with the same structural statistics:
tree-ish graphs with re-entrancies, AMR-style role labels, targets generated
from the concepts so the copy mechanism is learnable.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from gtos_tpu.graph.ir import Graph

_ROLES = ["ARG0", "ARG1", "ARG2", "mod", "time", "location", "manner", "poss"]
_VERBS = ["want", "go", "see", "eat", "make", "find", "tell", "give", "take", "know"]
_NOUNS = ["boy", "girl", "dog", "city", "house", "tree", "book", "car", "river", "friend"]


def random_amr_graph(rng: random.Random, min_nodes: int = 3, max_nodes: int = 12) -> Graph:
    n = rng.randint(min_nodes, max_nodes)
    nodes: List[str] = []
    for i in range(n):
        if rng.random() < 0.4:
            nodes.append(f"{rng.choice(_VERBS)}-{rng.randint(1, 3):02d}")
        else:
            nodes.append(rng.choice(_NOUNS))
    edges = []
    for i in range(1, n):
        parent = rng.randrange(i)  # random tree
        edges.append((parent, rng.choice(_ROLES), i))
    # occasional re-entrancy
    if n > 3 and rng.random() < 0.5:
        s, t = rng.randrange(n), rng.randrange(n)
        if s != t:
            edges.append((s, rng.choice(_ROLES), t))
    return Graph(nodes=nodes, edges=edges)


def target_for(graph: Graph, rng: random.Random) -> List[str]:
    """A deterministic-ish surface realization: concept surface forms in a
    graph-driven order with function words — copy-dominated, so a correct
    copy mechanism drives BLEU on this corpus."""
    words: List[str] = []
    order = sorted(range(graph.num_nodes), key=lambda i: (len(graph.nodes[i]), i))
    for i in order:
        c = graph.nodes[i]
        surf = c.rsplit("-", 1)[0] if c[-1].isdigit() and "-" in c else c
        if rng.random() < 0.3:
            words.append(rng.choice(["the", "a", "and", "to", "of"]))
        words.append(surf)
    return words


def synthetic_amr_corpus(
    n: int, seed: int = 0, min_nodes: int = 3, max_nodes: int = 12
) -> Tuple[List[Graph], List[List[str]]]:
    rng = random.Random(seed)
    graphs, targets = [], []
    for _ in range(n):
        g = random_amr_graph(rng, min_nodes, max_nodes)
        graphs.append(g)
        targets.append(target_for(g, rng))
    return graphs, targets


def synthetic_amr2_corpus(
    n: int = 36000, seed: int = 0, max_nodes: int = 80,
    max_target: int = 100,
) -> Tuple[List[Graph], List[List[str]]]:
    """An AMR-2.0-SCALE synthetic corpus (VERDICT r4 next #6): ~36k
    instances with a realistic size/length distribution (log-normal node
    counts, mean ~14, tail to `max_nodes`; targets to ~`max_target`
    tokens), Zipf-sampled lemma pools (~8k lemmas -> a real frequency-
    cutoff vocab) and ~40 Zipf-weighted roles (AMR 2.0's role inventory
    scale). Exercises the bucket ladder, bank-capacity bisecting and
    vocab cutoffs the tiny test corpus never touches; the content is
    still synthetic — LDC BLEU parity needs the licensed corpus
    (PARITY.md)."""
    rng = random.Random(seed)
    verbs = [f"verb{i:04d}" for i in range(2500)]
    nouns = [f"noun{i:04d}" for i in range(5500)]
    roles = (["ARG0", "ARG1", "ARG2", "ARG3", "ARG4", "mod", "time",
              "location", "manner", "poss", "domain", "topic", "purpose",
              "name", "quant", "unit", "degree", "condition", "part",
              "source", "destination", "beneficiary", "instrument",
              "accompanier", "duration", "frequency", "extent", "medium",
              "example", "concession", "direction", "ord", "value",
              "polarity", "mode", "age", "path", "subevent", "li", "wiki"])

    def zipf(pool):
        # rank-weighted choice: w_r ~ 1/(r+2)
        r = int(len(pool) * (rng.random() ** 3))
        return pool[min(r, len(pool) - 1)]

    graphs, targets = [], []
    for _ in range(n):
        nn = max(1, min(int(rng.lognormvariate(2.6, 0.55)), max_nodes))
        nodes = []
        for i in range(nn):
            if rng.random() < 0.45:
                nodes.append(f"{zipf(verbs)}-{rng.randint(1, 3):02d}")
            else:
                nodes.append(zipf(nouns))
        edges = []
        for i in range(1, nn):
            # mostly-local attachment: AMR graphs are tree-ish and
            # shallow-reentrant
            parent = rng.randrange(max(0, i - 8), i)
            edges.append((parent, zipf(roles), i))
        for _ in range(int(nn * 0.08)):  # re-entrancies
            s, t = rng.randrange(nn), rng.randrange(nn)
            if s != t:
                edges.append((s, zipf(roles), t))
        g = Graph(nodes=nodes, edges=edges)
        tgt = target_for(g, rng)[:max_target]
        graphs.append(g)
        targets.append(tgt)
    return graphs, targets


def synthetic_dependency_corpus(
    n: int, seed: int = 0, min_len: int = 4, max_len: int = 15
) -> Tuple[List[Graph], List[List[str]]]:
    """Source dependency trees + 'translated' targets (reversed source with a
    learned-vocabulary twist) for the translator path."""
    rng = random.Random(seed)
    deprels = ["nsubj", "dobj", "amod", "det", "prep", "pobj", "advmod"]
    graphs, targets = [], []
    for _ in range(n):
        ln = rng.randint(min_len, max_len)
        toks = [rng.choice(_NOUNS + _VERBS) for _ in range(ln)]
        edges = []
        for i in range(1, ln):
            edges.append((rng.randrange(i), rng.choice(deprels), i))
        graphs.append(Graph(nodes=toks, edges=edges))
        targets.append([f"{w}_x" for w in reversed(toks)])
    return graphs, targets
