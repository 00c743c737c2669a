"""AEL — Abstracting Execution Logs bin-and-merge miner (SURVEY.md A3).

Clean-room from public knowledge (Jiang et al., "An Automated Approach for
Abstracting Execution Logs to Execution Events", 2008; structural anchor
† ``logparser/AEL/AEL.py``). Semantics:

1. *Categorize*: bin events by ``(n_tokens, n_dynamic_tokens)`` where
   dynamic tokens are detected heuristically (contain digits or ``=``-value
   shapes) — the bin key is the Ray ``groupby`` shuffle key.
2. *Abstract*: within a bin, events sharing the identical constant-token
   skeleton collapse to one template (dynamic positions → ``<*>``).
3. *Reconcile*: within each bin, merge templates whose token sequences
   differ in at most ``max(1, floor(merge_pct * n_tokens))`` positions
   (at least one position may always differ, so short templates still
   merge) — including
   differing CONSTANT positions: the paper's reconcile exists precisely to
   catch parameters the dynamic-token heuristic missed (e.g. alphabetic
   slot values). Differing positions widen to ``<*>`` (driver-side over
   the small template set).
"""

from __future__ import annotations

from collections import Counter

from logparser_ray.core.bank import WILDCARD


def is_dynamic(token: str) -> bool:
    # ASCII digits only — matches the vectorized Arrow regex [0-9=] in
    # stages/mine.py:ael_fit exactly (str.isdigit would also hit Unicode
    # digits and silently diverge from the distributed path)
    return any("0" <= ch <= "9" for ch in token) or "=" in token


def bin_key(tokens: list[str]) -> tuple[int, int]:
    return len(tokens), sum(1 for t in tokens if is_dynamic(t))


def abstract_bin(seqs: list[list[str]]) -> list[tuple[list[str], int]]:
    """Step 2 over one bin: skeleton = tokens with dynamics wildcarded."""
    agg: Counter = Counter()
    order: dict[tuple, int] = {}
    for s in seqs:
        skel = tuple(WILDCARD if is_dynamic(t) else t for t in s)
        agg[skel] += 1
        order.setdefault(skel, len(order))
    return [(list(k), agg[k]) for k in sorted(agg, key=lambda k: order[k])]


def reconcile(
    templates: list[tuple[list[str], int]], merge_pct: float = 0.1
) -> list[tuple[list[str], int]]:
    """Step 3 over ONE bin: greedy merge of same-length templates differing
    in at most ``max(1, floor(merge_pct * n_tokens))`` positions
    (differences → ``<*>``). A differing position counts whether it is constant-vs-constant
    or constant-vs-wildcard — the reconcile step's whole purpose is to
    widen constant positions the dynamic heuristic missed (an earlier
    revision required zero constant diffs, which made ``merge_pct`` a no-op
    and left sibling skeletons like ``User asked about arrow`` /
    ``... about ray`` unmerged). Callers feed one ``(n_tokens, n_dyn)``
    bin at a time; cross-bin merging is NOT paper behavior and over-merges
    e.g. an all-constant sibling into a one-slot template."""
    out: list[tuple[list[str], int]] = []
    for tokens, n in templates:
        merged = False
        budget = max(1, int(merge_pct * len(tokens)))
        for i, (etoks, en) in enumerate(out):
            if len(etoks) != len(tokens):
                continue
            ndiff = sum(1 for a, b in zip(etoks, tokens) if a != b)
            if ndiff <= budget:
                new = [
                    a if a == b else WILDCARD for a, b in zip(etoks, tokens)
                ]
                out[i] = (new, en + n)
                merged = True
                break
        if not merged:
            out.append((list(tokens), n))
    return out
