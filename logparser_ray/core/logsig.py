"""LogSig — word-pair signature clustering (SURVEY.md A6).

Clean-room implementation from public knowledge (Tang, Li, Perng, "LogSig:
Generating System Events from Raw Textual Logs", CIKM 2011; structural
anchor † ``logparser/LogSig/LogSig.py``). The reference checkout is empty
in this sandbox.

Semantics reproduced:

- Messages are described by their word-pair feature set (ordered token
  pairs ``(t_i, t_j), i < j``).
- ``k`` groups; iterative reassignment: a message moves to the group where
  its pairs are most frequent (the paper's potential-maximization step;
  this greedy frequency form is its documented first-order approximation).
- After convergence / ``max_iters``, each group emits a signature. Upstream
  signatures are variable-length common-token subsequences; our pattern
  bank matches token-count-anchored templates, so the signature here is
  positional — per token count inside the group, tokens stable in ≥ half
  the group's messages stay, others become ``<*>`` (documented deviation).

Determinism: initial assignment is a stable content hash mod k — no RNG
(upstream seeds ``random``; BASELINE.json requires reproducible runs).
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from logparser_ray.core.bank import WILDCARD, PatternBank, Template


def word_pairs(tokens: list[str]) -> list[tuple[str, str]]:
    return [
        (tokens[i], tokens[j])
        for i in range(len(tokens))
        for j in range(i + 1, len(tokens))
    ]


def _stable_hash(tokens: list[str]) -> int:
    h = hashlib.md5(" ".join(tokens).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big")


def logsig_cluster(
    seqs: list[list[str]], k: int = 16, max_iters: int = 10
) -> list[int]:
    """Assign each token sequence to one of ``k`` groups; returns labels."""
    labels = [_stable_hash(s) % k for s in seqs]
    pairs = [word_pairs(s) for s in seqs]
    for _ in range(max_iters):
        pair_counts: list[Counter] = [Counter() for _ in range(k)]
        sizes = [0] * k
        for lab, ps in zip(labels, pairs):
            pair_counts[lab].update(ps)
            sizes[lab] += 1
        moved = 0
        for i, ps in enumerate(pairs):
            best_lab, best_score = labels[i], -1.0
            for g in range(k):
                if not sizes[g] and g != labels[i]:
                    continue
                denom = max(sizes[g], 1)
                score = sum(pair_counts[g][p] for p in ps) / denom
                if score > best_score:
                    best_lab, best_score = g, score
            if best_lab != labels[i]:
                labels[i] = best_lab
                moved += 1
        if not moved:
            break
    return labels


def signatures(seqs: list[list[str]], labels: list[int]) -> list[tuple[list[str], int]]:
    """Positional signature per (group, token count): a position stays
    constant only when its token is UNANIMOUS across the group; any
    variation → ``<*>``. (A majority rule locks dominant variants as
    constants and the signature then misses most of its own family — the
    signature must cover every member, matching upstream's common-word-pair
    construction.) Returns (template, size) pairs."""
    groups: dict[tuple[int, int], list[list[str]]] = defaultdict(list)
    for s, lab in zip(seqs, labels):
        groups[(lab, len(s))].append(s)
    out = []
    for (_lab, n), members in sorted(groups.items()):
        tmpl = []
        for pos in range(n):
            c = Counter(m[pos] for m in members)
            tok, cnt = c.most_common(1)[0]
            tmpl.append(tok if cnt == len(members) else WILDCARD)
        out.append((tmpl, len(members)))
    return out


def logsig_fit_seqs(
    seqs: list[list[str]], k: int = 16, max_iters: int = 10
) -> PatternBank:
    labels = logsig_cluster(seqs, k=k, max_iters=max_iters)
    sigs = signatures(seqs, labels)
    # first-match-wins priority: most SPECIFIC template first (fewest
    # wildcards), then support — a wildcard-heavy signature placed early
    # would swallow rows that belong to more specific groups
    sigs.sort(
        key=lambda tn: (sum(1 for x in tn[0] if x == WILDCARD), -tn[1], " ".join(tn[0]))
    )
    return PatternBank(
        [Template.from_string(" ".join(t), prio) for prio, (t, _) in enumerate(sigs)]
    ).dedup()
