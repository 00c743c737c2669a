"""LogMine — one-pass max-distance clustering miner (SURVEY.md A10).

Clean-room implementation from public knowledge (Hamooni et al., "LogMine:
Fast Pattern Recognition for Log Analytics", CIKM 2016; structural anchor
† ``logparser/LogMine/LogMine.py``). The reference checkout is empty in
this sandbox.

Semantics reproduced (single level of the paper's level-wise hierarchy —
the level that yields the template bank):

- One pass: each log is compared with existing cluster representatives of
  the SAME token count; distance = 1 − matches/len (the paper's unit-weight
  token distance; cross-length pairs are distance 1 here, i.e. the
  alignment step is restricted to equal lengths — a documented
  simplification; the paper's Smith-Waterman alignment merges across
  lengths at higher levels).
- Joins the nearest cluster iff distance ≤ ``max_dist``; the cluster's
  pattern widens position-wise (differing positions → ``<*>``); else the
  log founds a new cluster.

Pure Python, no Ray; distributed fit via ``stages/mine.py`` (fit_texts /
bank / merge_bank protocol).
"""

from __future__ import annotations

import re

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


class _Cluster:
    __slots__ = ("pattern", "size", "order")

    def __init__(self, pattern: list[str], order: int):
        self.pattern = pattern
        self.size = 0
        self.order = order


def pattern_distance(pattern: list[str], tokens: list[str]) -> float:
    """1 − fraction of positions where pattern token equals log token
    (wildcards count as matches — they already absorbed variability)."""
    if len(pattern) != len(tokens) or not tokens:
        return 1.0
    same = sum(1 for p, t in zip(pattern, tokens) if p == t or p == WILDCARD)
    return 1.0 - same / len(tokens)


class LogMine:
    def __init__(self, max_dist: float = 0.3, rex: tuple[str, ...] = ()):
        self.max_dist = max_dist
        self.rex = [re.compile(r) for r in rex]
        self.by_len: dict[int, list[_Cluster]] = {}
        self.clusters: list[_Cluster] = []

    def preprocess(self, line: str) -> str:
        for rx in self.rex:
            line = rx.sub(WILDCARD, line)
        return line

    def add_sequence(self, tokens: list[str]) -> _Cluster:
        if not tokens:
            tokens = [""]
        group = self.by_len.setdefault(len(tokens), [])
        best, best_d = None, 2.0
        for c in group:
            d = pattern_distance(c.pattern, tokens)
            if d < best_d:
                best, best_d = c, d
        if best is not None and best_d <= self.max_dist:
            best.pattern = [
                p if (p == t or p == WILDCARD) else WILDCARD
                for p, t in zip(best.pattern, tokens)
            ]
            best.size += 1
            return best
        c = _Cluster(list(tokens), order=len(self.clusters))
        c.size = 1
        group.append(c)
        self.clusters.append(c)
        return c

    def fit_texts(self, texts) -> None:
        for line in texts:
            if line is None:
                continue
            self.add_sequence(self.preprocess(line).strip().split())

    def bank(self) -> PatternBank:
        return PatternBank(
            [
                Template.from_string(" ".join(c.pattern), priority=c.order)
                for c in self.clusters
            ]
        ).dedup()

    def merge_bank(self, bank: PatternBank) -> None:
        for t in sorted(bank, key=lambda t: (t.n_tokens, t.template)):
            self.add_sequence(list(t.tokens))
