"""Vocabularies and the concept->surface-token copy map.

Re-creates the reference's vocab layer (generator/extract.py + data.py in
jcyk/gtos — SURVEY.md §2.2 "Vocab / extraction"): frequency-cutoff vocabs
with special symbols <PAD> <UNK> <STR> <END> (+ <CLS> for the global graph
node), and a LexicalMap from each concept to the surface tokens it may copy
to, which powers the extended-vocabulary copy mechanism.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence

PAD, UNK, STR, END, CLS = "<PAD>", "<UNK>", "<STR>", "<END>", "<CLS>"
_DEFAULT_SPECIALS = (PAD, UNK, STR, END, CLS)


class Vocab:
    """String<->id table. Index 0 is always <PAD>, 1 is always <UNK>."""

    def __init__(self, items: Sequence[str], specials: Sequence[str] = _DEFAULT_SPECIALS):
        self.itos: List[str] = list(specials)
        seen = set(self.itos)
        for it in items:
            if it not in seen:
                seen.add(it)
                self.itos.append(it)
        self.stoi: Dict[str, int] = {s: i for i, s in enumerate(self.itos)}
        self.pad_id = self.stoi[PAD]
        self.unk_id = self.stoi[UNK]
        self.str_id = self.stoi.get(STR, self.unk_id)
        self.end_id = self.stoi.get(END, self.unk_id)
        self.cls_id = self.stoi.get(CLS, self.unk_id)

    def __len__(self) -> int:
        return len(self.itos)

    def __contains__(self, tok: str) -> bool:
        return tok in self.stoi

    def encode(self, tok: str) -> int:
        return self.stoi.get(tok, self.unk_id)

    def encode_seq(self, toks: Iterable[str]) -> List[int]:
        return [self.encode(t) for t in toks]

    def decode(self, idx: int) -> str:
        return self.itos[idx]

    @classmethod
    def from_counter(
        cls,
        counter: Counter,
        min_freq: int = 1,
        max_size: int | None = None,
        specials: Sequence[str] = _DEFAULT_SPECIALS,
    ) -> "Vocab":
        # Sort by (-freq, token) for determinism across runs.
        items = [t for t, c in sorted(counter.items(), key=lambda kv: (-kv[1], kv[0])) if c >= min_freq]
        if max_size is not None:
            items = items[:max_size]
        return cls(items, specials=specials)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.itos, f, ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path) as f:
            itos = json.load(f)
        v = cls.__new__(cls)
        v.itos = itos
        v.stoi = {s: i for i, s in enumerate(itos)}
        v.pad_id = v.stoi[PAD]
        v.unk_id = v.stoi[UNK]
        v.str_id = v.stoi.get(STR, v.unk_id)
        v.end_id = v.stoi.get(END, v.unk_id)
        v.cls_id = v.stoi.get(CLS, v.unk_id)
        return v


_SENSE_RE = re.compile(r"-\d\d$")


def concept_surface_forms(concept: str) -> List[str]:
    """Surface tokens a concept may be copied to.

    AMR predicate concepts drop the sense suffix (want-01 -> want); other
    concepts copy verbatim. Mirrors the reference's LexicalMap semantics
    (SURVEY.md §2.2: "maps each concept to the surface tokens it may copy
    to")."""
    stripped = _SENSE_RE.sub("", concept)
    forms = [concept] if stripped == concept else [stripped, concept]
    return forms


class LexicalMap:
    """concept -> ranked candidate surface tokens for the copy mechanism."""

    def __init__(self, mapping: Dict[str, List[str]] | None = None):
        self.mapping: Dict[str, List[str]] = mapping or {}

    def get(self, concept: str) -> List[str]:
        if concept in self.mapping:
            return self.mapping[concept]
        return concept_surface_forms(concept)

    def copy_target(self, concept: str) -> str:
        """The single surface token this concept copies to (rank-0)."""
        return self.get(concept)[0]

    @classmethod
    def build(cls, concept_token_pairs: Iterable[tuple]) -> "LexicalMap":
        """Learn concept->token preferences from aligned (concepts, tokens)
        training pairs: for each concept, tokens it co-occurs with that match
        one of its surface forms, ranked by frequency."""
        counts: Dict[str, Counter] = {}
        for concepts, tokens in concept_token_pairs:
            tokset = set(tokens)
            for c in concepts:
                for form in concept_surface_forms(c):
                    if form in tokset:
                        counts.setdefault(c, Counter())[form] += 1
        mapping = {
            c: [t for t, _ in ctr.most_common()] for c, ctr in counts.items()
        }
        return cls(mapping)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.mapping, f, ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "LexicalMap":
        with open(path) as f:
            return cls(json.load(f))
