"""Drain — fixed-depth parse-tree online template miner (SURVEY.md T1).

Clean-room implementation of the Drain algorithm from public knowledge
(He et al., "Drain: An Online Log Parsing Approach with Fixed Depth Tree",
ICWS 2017; structural anchors † ``logparser/Drain/Drain.py``: ``Node``,
``Logcluster``, ``treeSearch``, ``fastMatch``/``seqDist``,
``addSeqToPrefixTree``, ``getTemplate``). Semantics reproduced:

- tree levels: root → token-count node → first ``depth-2`` tokens → leaf
  with a cluster list; tokens containing digits route to the ``<*>`` child;
  a full child map (``max_children``) also routes to ``<*>``.
- ``seq_dist`` = (#positions with identical tokens) / len, wildcards in the
  template counting as parameters (not similarity); best cluster wins ties
  by parameter count; accepted iff sim ≥ ``st``.
- merging a sequence into a cluster widens the template position-wise
  (differing positions → ``<*>``).

Pure Python, no Ray. The distributed fit wrapper lives in
``stages/mine.py``; partial banks merge by replaying templates through a
fresh tree in deterministic order (SURVEY.md §7.4 #1–2).
"""

from __future__ import annotations

import re

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


def _has_digit(token: str) -> bool:
    return any(ch.isdigit() for ch in token)


class _Cluster:
    __slots__ = ("template", "size", "order")

    def __init__(self, template: list[str], order: int):
        self.template = template
        self.size = 0
        self.order = order


class Drain:
    """Online fixed-depth-tree miner with logparser parameterization."""

    def __init__(
        self,
        depth: int = 4,
        st: float = 0.4,
        max_children: int = 100,
        rex: tuple[str, ...] = (),
    ):
        if depth < 3:
            raise ValueError("depth must be ≥ 3 (root + count + ≥1 token level)")
        self.inner_depth = depth - 2
        self.st = st
        self.max_children = max_children
        self.rex = [re.compile(r) for r in rex]
        self.root: dict[int, dict] = {}  # token count → nested token dict
        self.clusters: list[_Cluster] = []

    # -- preprocessing ------------------------------------------------------

    def preprocess(self, line: str) -> str:
        """Ordered regex substitution to ``<*>`` († ``preprocess(self, line)``)."""
        for rx in self.rex:
            line = rx.sub(WILDCARD, line)
        return line

    def tokenize(self, line: str) -> list[str]:
        return self.preprocess(line).strip().split()

    # -- tree ---------------------------------------------------------------

    def _leaf_search(self, tokens: list[str]) -> list[_Cluster] | None:
        node = self.root.get(len(tokens))
        if node is None:
            return None
        for d in range(min(self.inner_depth, len(tokens))):
            tok = tokens[d]
            nxt = node.get(tok)
            if nxt is None:
                nxt = node.get(WILDCARD)
            if nxt is None:
                return None
            node = nxt
        return node.get("$")

    def _leaf_insert(self, tokens: list[str], cluster: _Cluster) -> None:
        node = self.root.setdefault(len(tokens), {})
        for d in range(min(self.inner_depth, len(tokens))):
            tok = tokens[d]
            if _has_digit(tok):
                tok = WILDCARD
            nxt = node.get(tok)
            if nxt is None:
                if tok != WILDCARD and len(node) >= self.max_children:
                    tok = WILDCARD
                    nxt = node.get(WILDCARD)
                if nxt is None:
                    nxt = {}
                    node[tok] = nxt
            node = nxt
        node.setdefault("$", []).append(cluster)

    # -- matching -----------------------------------------------------------

    @staticmethod
    def seq_dist(template: list[str], tokens: list[str]) -> tuple[float, int]:
        sim, n_par = 0, 0
        for t, s in zip(template, tokens):
            if t == WILDCARD:
                n_par += 1
            elif t == s:
                sim += 1
        return sim / len(tokens), n_par

    def _fast_match(self, leaf: list[_Cluster], tokens: list[str]) -> _Cluster | None:
        best, best_sim, best_par = None, -1.0, -1
        for c in leaf:
            sim, n_par = self.seq_dist(c.template, tokens)
            if sim > best_sim or (sim == best_sim and n_par > best_par):
                best, best_sim, best_par = c, sim, n_par
        if best is not None and best_sim >= self.st:
            return best
        return None

    @staticmethod
    def merge_template(template: list[str], tokens: list[str]) -> list[str]:
        return [t if t == s else WILDCARD for t, s in zip(template, tokens)]

    # -- public API ---------------------------------------------------------

    def add_sequence(self, tokens: list[str]) -> _Cluster:
        if not tokens:
            tokens = [""]
        leaf = self._leaf_search(tokens)
        match = self._fast_match(leaf, tokens) if leaf else None
        if match is None:
            cluster = _Cluster(list(tokens), order=len(self.clusters))
            cluster.size = 1
            self.clusters.append(cluster)
            self._leaf_insert(tokens, cluster)
            return cluster
        new_t = self.merge_template(match.template, tokens)
        if new_t != match.template:
            match.template = new_t
        match.size += 1
        return match

    def fit_texts(self, texts) -> None:
        for line in texts:
            if line is None:
                continue
            self.add_sequence(self.tokenize(line))

    def bank(self) -> PatternBank:
        """Mined templates as a priority-ordered bank (creation order —
        reproducing the reference's first-come cluster identity)."""
        return PatternBank(
            [
                Template.from_string(" ".join(c.template), priority=c.order)
                for c in self.clusters
            ]
        ).dedup()

    def merge_bank(self, bank: PatternBank) -> None:
        """Replay another bank's templates through this tree (partial-fit
        merge); deterministic given the caller feeds banks in sorted order."""
        for t in sorted(bank, key=lambda t: (t.n_tokens, t.template)):
            self.add_sequence(list(t.tokens))
