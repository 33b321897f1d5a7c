"""Graph IR shared by the AMR (generator) and dependency (translator) paths.

The reference keeps two parallel graph readers (generator/AMRGraph.py and the
translator/ mirror — SURVEY.md §2.2); here both front-ends lower to one IR that
the rest of the framework consumes: a list of node labels plus directed,
labelled edges. Everything downstream (shortest-path relation extraction,
batching, the model) is front-end agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class Graph:
    """A directed labelled graph.

    nodes: node labels (AMR concepts, or source-sentence tokens for the
        dependency path). Index into this list is the node id.
    edges: (src, label, tgt) triples with src/tgt being node indices.
    meta:  optional instance-level payload (e.g. the target sentence tokens,
        or the original PENMAN variable names), carried through untouched.
    """

    nodes: List[str]
    edges: List[Tuple[int, str, int]]
    meta: Optional[dict] = None

    def __post_init__(self):
        n = len(self.nodes)
        for (s, lbl, t) in self.edges:
            if not (0 <= s < n and 0 <= t < n):
                raise ValueError(
                    f"edge ({s}, {lbl!r}, {t}) out of range for {n} nodes"
                )

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    def adjacency(self, reverse_suffix: str = "_r"):
        """Adjacency with reverse arcs added, labelled `label + reverse_suffix`.

        The reference treats graphs as connected by adding direction-marked
        reverse edges before computing shortest paths (SURVEY.md §2.2 "AMR
        graph reader"). Returns adj[src] -> list of (tgt, label).
        """
        adj: List[List[Tuple[int, str]]] = [[] for _ in range(self.num_nodes)]
        for (s, lbl, t) in self.edges:
            adj[s].append((t, lbl))
            adj[t].append((s, lbl + reverse_suffix))
        return adj
