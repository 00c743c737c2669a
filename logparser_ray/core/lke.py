"""LKE — weighted-edit-distance hierarchical clustering (SURVEY.md A7).

Clean-room implementation from public knowledge (Fu, Lou, Wang, Li,
"Execution Anomaly Detection in Distributed Systems through Unstructured
Log Analysis", ICDM 2009; structural anchor † ``logparser/LKE/LKE.py``).
The reference checkout is empty in this sandbox.

Semantics reproduced:

- Pairwise token-level edit distance with position weights that decay with
  token index (``1 / (1 + e^(i - v))`` in the paper; here ``1/(1+i)`` — the
  same "early tokens matter more" shape without the free parameter v).
- Single-linkage clustering: connect pairs whose distance ≤ ``threshold``
  (union-find), each component is a raw cluster — the paper's hierarchical
  cut at the largest gap is replaced by the explicit threshold, which the
  upstream benchmark also exposes.
- Template per (cluster, token count): position-wise merge, differing
  positions → ``<*>``.

O(n²) pairwise — the upstream algorithm's real complexity — so the
distributed wrapper (``stages/mine.py:lke_fit``) fits on a deterministic
sample and matches the full corpus through the compiled bank (SURVEY.md A7
"sample-based fit only").
"""

from __future__ import annotations

from collections import Counter, defaultdict

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


def weighted_edit_distance(a: list[str], b: list[str]) -> float:
    """Token-level Levenshtein with 1/(1+index) operation weights,
    normalized to [0, 1] by the maximum achievable cost."""
    la, lb = len(a), len(b)
    if not la and not lb:
        return 0.0
    w = [1.0 / (1 + i) for i in range(max(la, lb) + 1)]
    prev = [sum(w[:j]) for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [prev[0] + w[i - 1]]
        for j in range(1, lb + 1):
            cost = 0.0 if a[i - 1] == b[j - 1] else w[min(i, j) - 1]
            cur.append(
                min(prev[j] + w[i - 1], cur[j - 1] + w[j - 1], prev[j - 1] + cost)
            )
        prev = cur
    max_cost = sum(w[: max(la, lb)])
    return prev[lb] / max_cost if max_cost else 0.0


class _UnionFind:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def lke_cluster(seqs: list[list[str]], threshold: float = 0.3) -> list[int]:
    """Single-linkage component labels under the weighted edit distance.

    The O(n²) loop is pruned by a *threshold-derived* length bound: aligning
    an ``la``-token sequence to a longer ``lb``-token one needs ≥ lb−la
    insertions at distinct columns, whose minimum total weight is the
    cheapest (last) columns — ``sum(w[la:lb])``. With ``w[i] = 1/(1+i)``
    that gives ``min_dist = 1 − H(la)/H(lb)`` (harmonic prefix sums), so a
    length pair is skipped only when NO members can fall under
    ``threshold`` (the earlier fixed 2× ratio silently dropped reachable
    pairs for thresholds above ~0.34 — ADVICE r01). The bound is monotone
    in lb, so ``break`` is safe."""
    n = len(seqs)
    uf = _UnionFind(n)
    by_len: dict[int, list[int]] = defaultdict(list)
    for i, s in enumerate(seqs):
        by_len[len(s)].append(i)
    lens = sorted(by_len)
    maxlen = lens[-1] if lens else 0
    H = [0.0] * (maxlen + 1)  # H[i] = sum(w[:i]) with w[k] = 1/(1+k)
    for i in range(1, maxlen + 1):
        H[i] = H[i - 1] + 1.0 / i
    for li, la in enumerate(lens):
        for lb in lens[li:]:
            if lb > la and H[lb] > 0 and (1.0 - H[la] / H[lb]) > threshold:
                break
            same = la == lb
            for i in by_len[la]:
                for j in by_len[lb]:
                    # dedup guard applies ONLY within a length group; for
                    # la < lb the index sets are disjoint and skipping
                    # j <= i dropped pairs where the longer sequence had
                    # the smaller index (latent bug caught by the
                    # brute-force property test)
                    if same and j <= i:
                        continue
                    if weighted_edit_distance(seqs[i], seqs[j]) <= threshold:
                        uf.union(i, j)
    return [uf.find(i) for i in range(n)]


def lke_fit_seqs(seqs: list[list[str]], threshold: float = 0.3) -> PatternBank:
    labels = lke_cluster(seqs, threshold=threshold)
    groups: dict[tuple[int, int], list[list[str]]] = defaultdict(list)
    for s, lab in zip(seqs, labels):
        groups[(lab, len(s))].append(s)
    out = []
    for (_lab, n), members in sorted(groups.items()):
        tmpl = list(members[0])
        for m in members[1:]:
            tmpl = [t if t == x else WILDCARD for t, x in zip(tmpl, m)]
        out.append((tmpl, len(members)))
    # specificity-first priority (see logsig_fit_seqs)
    out.sort(
        key=lambda tn: (sum(1 for x in tn[0] if x == WILDCARD), -tn[1], " ".join(tn[0]))
    )
    return PatternBank(
        [Template.from_string(" ".join(t), prio) for prio, (t, _) in enumerate(out)]
    ).dedup()


def largest_gap_threshold(seqs: list[list[str]], sample: int = 200) -> float:
    """The paper's automatic threshold: sort sampled pairwise distances and
    cut at the largest gap. Exposed for parity; callers may pass a fixed
    threshold instead."""
    import itertools

    ds = sorted(
        weighted_edit_distance(a, b)
        for a, b in itertools.combinations(seqs[:sample], 2)
    )
    if len(ds) < 2:
        return 0.3
    gaps = [(ds[i + 1] - ds[i], i) for i in range(len(ds) - 1)]
    _, idx = max(gaps)
    return (ds[idx] + ds[idx + 1]) / 2.0
