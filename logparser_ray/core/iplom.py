"""IPLoM — iterative partitioning log mining (SURVEY.md A2).

Clean-room implementation from public knowledge (Makanju et al.,
"Clustering Event Logs Using Iterative Partitioning", KDD 2009; structural
anchor † ``logparser/IPLoM/IPLoM.py``). Steps:

1. partition by token count (done OUTSIDE this module — it is the Ray
   ``groupby(n_tokens)`` shuffle key; SURVEY.md §7.3);
2. split by the token position with the lowest cardinality of distinct
   values;
3. split by the mapping relation (1-1 / 1-M / M-1 / M-M) between the two
   most frequent token-frequency values, governed by ``ct`` /
   ``lower_bound``;
4. leaf partitions → templates: positions with a single distinct value
   keep the token, others become ``<*>``.

``mine_group`` is pure Python over one token-count group — each group is
independent, so Ray parallelizes across groups via ``map_groups``.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from logparser_ray.core.bank import WILDCARD


def _template_of(seqs: list[list[str]]) -> list[str]:
    """Step 4: per-position constant or wildcard."""
    if not seqs:
        return []
    n = len(seqs[0])
    out = []
    for i in range(n):
        vals = {s[i] for s in seqs}
        out.append(next(iter(vals)) if len(vals) == 1 else WILDCARD)
    return out


def _split_lowest_cardinality(seqs: list[list[str]]) -> list[list[list[str]]]:
    """Step 2: split on the position with fewest distinct tokens (>1 value
    positions preferred; if every position is constant, no split)."""
    if not seqs or not seqs[0]:
        return [seqs]
    n = len(seqs[0])
    cards = [len({s[i] for s in seqs}) for i in range(n)]
    # choose the non-constant position with minimal cardinality
    candidates = [(c, i) for i, c in enumerate(cards) if c > 1]
    if not candidates:
        return [seqs]
    _, pos = min(candidates)
    parts: dict[str, list[list[str]]] = defaultdict(list)
    for s in seqs:
        parts[s[pos]].append(s)
    return list(parts.values())


def _split_bijection(
    seqs: list[list[str]], ct: float = 0.35, lower_bound: float = 0.25
) -> list[list[list[str]]]:
    """Step 3: pick the two positions whose token-frequency structure is most
    informative and split by the mapping between them.

    Faithful-in-spirit: if the partition already 'looks like' one template
    (goodness ≥ ct — fraction of positions that are constant), keep it;
    otherwise split on the relation between the two lowest-cardinality
    non-constant positions (1-1 → split by pair, 1-M/M-1 → split by the
    '1' side, M-M → no further split).
    """
    if not seqs or not seqs[0]:
        return [seqs]
    n = len(seqs[0])
    cards = [len({s[i] for s in seqs}) for i in range(n)]
    n_const = sum(1 for c in cards if c == 1)
    if n and n_const / n >= ct:
        return [seqs]
    nc = sorted((c, i) for i, c in enumerate(cards) if c > 1)
    if len(nc) < 2:
        return [seqs]
    (_, p1), (_, p2) = nc[0], nc[1]
    fwd: dict[str, set[str]] = defaultdict(set)
    bwd: dict[str, set[str]] = defaultdict(set)
    for s in seqs:
        fwd[s[p1]].add(s[p2])
        bwd[s[p2]].add(s[p1])
    one_to_one = all(len(v) == 1 for v in fwd.values()) and all(
        len(v) == 1 for v in bwd.values()
    )
    one_to_m = all(len(v) == 1 for v in bwd.values())
    m_to_one = all(len(v) == 1 for v in fwd.values())
    parts: dict[str, list[list[str]]] = defaultdict(list)
    if one_to_one:
        for s in seqs:
            parts[s[p1]].append(s)
    elif one_to_m:
        for s in seqs:
            parts[s[p1]].append(s)
    elif m_to_one:
        for s in seqs:
            parts[s[p2]].append(s)
    else:
        return [seqs]
    # avoid shattering into singletons below the support lower bound
    out, rest = [], []
    threshold = max(1, int(lower_bound * len(seqs) / max(len(parts), 1)))
    for p in parts.values():
        (out if len(p) >= threshold else rest).append(p)
    if rest:
        out.append([s for p in rest for s in p])
    return out or [seqs]


def mine_group(
    seqs: list[list[str]], ct: float = 0.35, lower_bound: float = 0.25
) -> list[tuple[list[str], int]]:
    """Mine one token-count group → list of ``(template_tokens, size)``."""
    templates: list[tuple[list[str], int]] = []
    for p2 in _split_lowest_cardinality(seqs):
        for p3 in _split_bijection(p2, ct=ct, lower_bound=lower_bound):
            templates.append((_template_of(p3), len(p3)))
    # collapse identical templates produced by different leaves
    agg: Counter = Counter()
    order: dict[tuple, int] = {}
    for t, n in templates:
        key = tuple(t)
        agg[key] += n
        order.setdefault(key, len(order))
    return [(list(k), agg[k]) for k in sorted(agg, key=lambda k: order[k])]
