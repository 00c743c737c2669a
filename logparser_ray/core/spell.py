"""Spell — LCS-based online template miner (SURVEY.md T2).

Clean-room implementation from public knowledge (Du & Li, "Spell:
Streaming Parsing of System Event Logs", ICDM 2016; structural anchors
† ``logparser/Spell/Spell.py``: ``LCS``, ``SimpleLoopMatch``,
``LCSMatch``, ``getTemplate``). Semantics:

- a new sequence first tries an exact/subset loop match against existing
  templates; otherwise the cluster with the longest LCS wins if
  ``|LCS| ≥ tau * len(seq)``; the merged template is the LCS with ``<*>``
  where either side deviates.
- wildcards in templates match anything during loop match.

Pure Python, no Ray; distributed fit/merge via ``stages/mine.py``.
"""

from __future__ import annotations

import re

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


def lcs_seq(a: list[str], b: list[str]) -> list[str]:
    """Longest common subsequence of two token lists (classic DP)."""
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la - 1, -1, -1):
        for j in range(lb - 1, -1, -1):
            if a[i] == b[j]:
                dp[i][j] = dp[i + 1][j + 1] + 1
            else:
                dp[i][j] = max(dp[i + 1][j], dp[i][j + 1])
    out: list[str] = []
    i = j = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            out.append(a[i])
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            i += 1
        else:
            j += 1
    return out


def template_from_lcs(lcs: list[str], seq: list[str]) -> list[str]:
    """Rebuild a template: walk ``seq``, keeping LCS tokens, gaps → ``<*>``
    (collapsing consecutive gaps — Spell's template shape)."""
    out: list[str] = []
    i = 0
    for tok in seq:
        if i < len(lcs) and tok == lcs[i]:
            out.append(tok)
            i += 1
        elif not out or out[-1] != WILDCARD:
            out.append(WILDCARD)
    return out


class _Cluster:
    __slots__ = ("template", "size", "order")

    def __init__(self, template: list[str], order: int):
        self.template = template
        self.size = 0
        self.order = order


class Spell:
    def __init__(self, tau: float = 0.5, rex: tuple[str, ...] = ()):
        self.tau = tau
        self.rex = [re.compile(r) for r in rex]
        self.clusters: list[_Cluster] = []

    def preprocess(self, line: str) -> str:
        for rx in self.rex:
            line = rx.sub(WILDCARD, line)
        return line

    def tokenize(self, line: str) -> list[str]:
        return self.preprocess(line).strip().split()

    @staticmethod
    def _loop_match(template: list[str], seq: list[str]) -> bool:
        """Template (with wildcards) matches seq token-wise (subset walk)."""
        if len(template) != len(seq):
            return False
        return all(t == WILDCARD or t == s for t, s in zip(template, seq))

    def add_sequence(self, seq: list[str]) -> _Cluster:
        if not seq:
            seq = [""]
        # 1. cheap loop match
        for c in self.clusters:
            if self._loop_match(c.template, seq):
                c.size += 1
                return c
        # 2. LCS match
        best, best_lcs = None, []
        const_len = lambda t: sum(1 for x in t if x != WILDCARD)  # noqa: E731
        for c in self.clusters:
            consts = [x for x in c.template if x != WILDCARD]
            if len(consts) < self.tau * len(seq):
                continue
            cur = lcs_seq(consts, seq)
            if len(cur) > len(best_lcs) or (
                len(cur) == len(best_lcs) and best is not None
                and const_len(c.template) < const_len(best.template)
            ):
                best, best_lcs = c, cur
        if best is not None and len(best_lcs) >= self.tau * len(seq):
            new_t = template_from_lcs(best_lcs, seq)
            if new_t != best.template:
                best.template = new_t
            best.size += 1
            return best
        cluster = _Cluster(list(seq), order=len(self.clusters))
        cluster.size = 1
        self.clusters.append(cluster)
        return cluster

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
