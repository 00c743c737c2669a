"""LenMa — token-length-vector clustering miner (SURVEY.md A4).

Clean-room from public knowledge (Shima, "Length Matters: Clustering
System Log Messages using Length of Words", 2016; structural anchor
† ``logparser/LenMa/LenMa.py`` + vendored ``templateminer``). Semantics:
a new message joins the cluster (same token count) whose word-length
vector has cosine similarity ≥ ``threshold``; the cluster template
wildcards positions where tokens differ.
"""

from __future__ import annotations

import math
import re

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


class _Cluster:
    __slots__ = ("template", "lens", "size", "order")

    def __init__(self, tokens: list[str], order: int):
        self.template = list(tokens)
        self.lens = [len(t) for t in tokens]
        self.size = 1
        self.order = order


def _cosine(a: list[int], b: list[int]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0 or nb == 0:
        return 1.0 if na == nb else 0.0
    return dot / (na * nb)


class LenMa:
    def __init__(self, threshold: float = 0.9, rex: tuple[str, ...] = ()):
        self.threshold = threshold
        self.rex = [re.compile(r) for r in rex]
        self.by_len: dict[int, list[_Cluster]] = {}
        self.clusters: list[_Cluster] = []

    def tokenize(self, line: str) -> list[str]:
        for rx in self.rex:
            line = rx.sub(WILDCARD, line)
        return line.strip().split()

    def add_sequence(self, tokens: list[str]) -> _Cluster:
        if not tokens:
            tokens = [""]
        lens = [len(t) for t in tokens]
        best, best_sim = None, -1.0
        for c in self.by_len.get(len(tokens), []):
            sim = _cosine(c.lens, lens)
            if sim > best_sim:
                best, best_sim = c, sim
        if best is not None and best_sim >= self.threshold:
            best.template = [
                t if t == s else WILDCARD for t, s in zip(best.template, tokens)
            ]
            # wildcard positions track the new lengths (cluster centroid drift)
            best.lens = [
                length if t != WILDCARD else new
                for t, length, new in zip(best.template, best.lens, lens)
            ]
            best.size += 1
            return best
        c = _Cluster(tokens, order=len(self.clusters))
        self.clusters.append(c)
        self.by_len.setdefault(len(tokens), []).append(c)
        return c

    def fit_texts(self, texts) -> None:
        for line in texts:
            if line is None:
                continue
            self.add_sequence(self.tokenize(line))

    def bank(self) -> PatternBank:
        return PatternBank(
            [
                Template.from_string(" ".join(c.template), priority=c.order)
                for c in self.clusters
            ]
        ).dedup()

    def merge_bank(self, bank: PatternBank) -> None:
        for t in sorted(bank, key=lambda t: (t.n_tokens, t.template)):
            self.add_sequence(list(t.tokens))
