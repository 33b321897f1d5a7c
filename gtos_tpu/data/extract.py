"""Vocabulary extraction from a training corpus.

Reference counterpart: generator/extract.py in jcyk/gtos (SURVEY.md §2.2
"Vocab / extraction"): frequency-cutoff token/concept/relation/char vocabs
plus the LexicalMap. One function builds them all from (Graph, target) pairs.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import List, Sequence, Tuple

from gtos_tpu.data.vocab import LexicalMap, Vocab
from gtos_tpu.graph.ir import Graph
from gtos_tpu.graph.paths import RelationPathConfig, collect_relation_labels


def build_vocabs(
    graphs: Sequence[Graph],
    targets: Sequence[List[str]],
    min_freq_token: int = 1,
    min_freq_concept: int = 1,
    max_token_vocab: int | None = None,
    path_cfg: RelationPathConfig = RelationPathConfig(),
) -> Tuple[Vocab, Vocab, Vocab, Vocab, LexicalMap]:
    """-> (token_vocab, concept_vocab, relation_vocab, char_vocab, lexical_map)."""
    tok_ctr: Counter = Counter()
    con_ctr: Counter = Counter()
    char_ctr: Counter = Counter()
    for tgt in targets:
        tok_ctr.update(tgt)
    for g in graphs:
        con_ctr.update(g.nodes)
        for c in g.nodes:
            char_ctr.update(c)

    token_vocab = Vocab.from_counter(tok_ctr, min_freq=min_freq_token, max_size=max_token_vocab)
    concept_vocab = Vocab.from_counter(con_ctr, min_freq=min_freq_concept)
    relation_vocab = Vocab(collect_relation_labels(graphs, path_cfg))
    char_vocab = Vocab.from_counter(char_ctr)
    lexical_map = LexicalMap.build((g.nodes, t) for g, t in zip(graphs, targets))
    return token_vocab, concept_vocab, relation_vocab, char_vocab, lexical_map


def save_vocabs(outdir: str, token_vocab, concept_vocab, relation_vocab, char_vocab, lexical_map):
    os.makedirs(outdir, exist_ok=True)
    token_vocab.save(os.path.join(outdir, "token_vocab.json"))
    concept_vocab.save(os.path.join(outdir, "concept_vocab.json"))
    relation_vocab.save(os.path.join(outdir, "relation_vocab.json"))
    char_vocab.save(os.path.join(outdir, "char_vocab.json"))
    lexical_map.save(os.path.join(outdir, "lexical_map.json"))


def load_vocabs(outdir: str):
    return (
        Vocab.load(os.path.join(outdir, "token_vocab.json")),
        Vocab.load(os.path.join(outdir, "concept_vocab.json")),
        Vocab.load(os.path.join(outdir, "relation_vocab.json")),
        Vocab.load(os.path.join(outdir, "char_vocab.json")),
        LexicalMap.load(os.path.join(outdir, "lexical_map.json")),
    )
