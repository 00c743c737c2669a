"""SHISO — incremental tree-based online miner (SURVEY.md T3).

Clean-room implementation from public knowledge (Mizutani, "Incremental
Mining of System Log Format", IEEE SCC 2013; structural anchor
† ``logparser/SHISO/SHISO.py``: ``Node``, ``Seq``, ``GetFormat``). The
reference checkout is empty in this sandbox, so parameter names follow the
paper: ``max_children`` (maxChildNum) bounds the branching factor and
``merge_threshold`` (mergeThreshold) is the sequence-distance acceptance
bound.

Semantics reproduced:

- A tree of format nodes; a new log descends from the root, at each level
  comparing against the children's formats.
- Token similarity uses 4-bucket character-class vectors (lower / upper /
  digit / other), normalized by token length; sequence distance is the mean
  squared vector distance over aligned positions (1.0 when token counts
  differ — SHISO never merges across lengths).
- If the best child's distance ≤ ``merge_threshold`` the log joins it and
  the format widens position-wise (differing tokens → ``<*>``); otherwise
  it descends into that child, or becomes a new child while the branching
  factor allows.

Pure Python, no Ray. Distributed fit/merge via ``stages/mine.py`` (same
fit/merge protocol as Drain: ``fit_texts`` / ``bank`` / ``merge_bank``).
"""

from __future__ import annotations

import re

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


def _class_vector(token: str) -> tuple[float, float, float, float]:
    lo = up = dig = other = 0
    for ch in token:
        if ch.islower():
            lo += 1
        elif ch.isupper():
            up += 1
        elif ch.isdigit():
            dig += 1
        else:
            other += 1
    n = max(len(token), 1)
    return (lo / n, up / n, dig / n, other / n)


def token_distance(a: str, b: str) -> float:
    """0 for identical tokens; for unequal tokens, 0.5 plus half the squared
    distance between the normalized character-class vectors (∈ [0.5, 1]).

    The 0.5 inequality floor is a documented deviation: with pure class
    vectors, lexically different constants of the same shape ("Session" vs
    "Heartbeat") collapse to distance ≈ 0 and every same-length message
    merges; the paper compensates with a phase-2 format refinement that is
    out of scope here, so the floor keeps distinct constants apart while
    still ranking same-class variables as nearer than cross-class ones."""
    if a == b:
        return 0.0
    if a == WILDCARD or b == WILDCARD:
        return 0.0
    va, vb = _class_vector(a), _class_vector(b)
    return 0.5 + sum((x - y) ** 2 for x, y in zip(va, vb)) / 4.0


def seq_distance(fmt: list[str], tokens: list[str]) -> float:
    if len(fmt) != len(tokens) or not tokens:
        return 1.0
    return sum(token_distance(f, t) for f, t in zip(fmt, tokens)) / len(tokens)


class _Node:
    __slots__ = ("format", "children", "size", "order")

    def __init__(self, fmt: list[str], order: int):
        self.format = fmt
        self.children: list[_Node] = []
        self.size = 0
        self.order = order


class Shiso:
    """Incremental format-tree miner."""

    def __init__(
        self,
        max_children: int = 4,
        merge_threshold: float = 0.15,
        rex: tuple[str, ...] = (),
    ):
        self.max_children = max_children
        self.merge_threshold = merge_threshold
        self.rex = [re.compile(r) for r in rex]
        self.root = _Node([], order=-1)  # sentinel; real formats live below
        self.nodes: list[_Node] = []

    def preprocess(self, line: str) -> str:
        for rx in self.rex:
            line = rx.sub(WILDCARD, line)
        return line

    def add_sequence(self, tokens: list[str]) -> _Node:
        if not tokens:
            tokens = [""]
        node = self.root
        while True:
            best, best_d = None, 2.0
            for child in node.children:
                d = seq_distance(child.format, tokens)
                if d < best_d:
                    best, best_d = child, d
            if best is not None and best_d <= self.merge_threshold:
                best.format = [
                    f if f == t else WILDCARD for f, t in zip(best.format, tokens)
                ]
                best.size += 1
                return best
            if len(node.children) < self.max_children:
                child = _Node(list(tokens), order=len(self.nodes))
                child.size = 1
                node.children.append(child)
                self.nodes.append(child)
                return child
            # full: descend into the nearest child and retry one level down
            node = best

    def fit_texts(self, texts) -> None:
        for line in texts:
            if line is None:
                continue
            self.add_sequence(self.preprocess(line).strip().split())

    def bank(self) -> PatternBank:
        return PatternBank(
            [
                Template.from_string(" ".join(n.format), priority=n.order)
                for n in self.nodes
            ]
        ).dedup()

    def merge_bank(self, bank: PatternBank) -> None:
        for t in sorted(bank, key=lambda t: (t.n_tokens, t.template)):
            self.add_sequence(list(t.tokens))
