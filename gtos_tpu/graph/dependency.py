"""Dependency-tree front-end for the translator (syntax-NMT) path.

Mirrors the reference's translator/ data side (SURVEY.md §2.2 "translator/
mirror"): nodes are the source-sentence tokens in order, edges are labelled
dependency arcs head -> dependent. Accepts either explicit (head, label,
dep) triples or CoNLL-style parallel lists of heads (1-based, 0 = root) and
labels.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from gtos_tpu.graph.ir import Graph


def dependency_graph(
    tokens: Sequence[str],
    heads: Sequence[int],
    labels: Sequence[str],
    meta: dict | None = None,
) -> Graph:
    """Build a Graph from CoNLL-style heads/labels.

    heads[i] is the 1-based head of token i (0 means root: no edge emitted —
    the graph stays connected for path extraction through the reverse arcs
    added in Graph.adjacency, plus sequential fallback is NOT added, matching
    a pure dependency tree).
    """
    if not (len(tokens) == len(heads) == len(labels)):
        raise ValueError("tokens/heads/labels length mismatch")
    edges: List[Tuple[int, str, int]] = []
    for i, (h, lbl) in enumerate(zip(heads, labels)):
        if h == 0:
            continue
        if not (1 <= h <= len(tokens)):
            raise ValueError(f"head {h} out of range for {len(tokens)} tokens")
        edges.append((h - 1, lbl, i))
    return Graph(nodes=list(tokens), edges=edges, meta=meta)


def read_conll_file(path: str) -> List[Graph]:
    """Read a minimal CoNLL-X-ish file: per line `idx token head deprel`
    (extra columns ignored), blank line between sentences."""
    graphs: List[Graph] = []
    toks: List[str] = []
    heads: List[int] = []
    labels: List[str] = []

    def flush():
        nonlocal toks, heads, labels
        if toks:
            graphs.append(dependency_graph(toks, heads, labels))
        toks, heads, labels = [], [], []

    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                flush()
                continue
            cols = line.split("\t") if "\t" in line else line.split()
            if len(cols) < 4:
                raise ValueError(f"bad CoNLL line: {line!r}")
            toks.append(cols[1])
            heads.append(int(cols[2]))
            labels.append(cols[3])
    flush()
    return graphs
