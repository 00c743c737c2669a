"""Distributed miner fit (SURVEY.md T1–T3, A2–A5, A9, A11).

Two families:

- **Online miners** (Drain, Spell, LenMa): order-dependent cluster state.
  * ``mode="conformance"``: single sequential pass over rows sorted by
    ``(conv_id, turn_idx)`` — reproduces the reference's order-dependent
    clustering deterministically (SURVEY.md §7.4 #1).
  * ``mode="scale"``: each *block* fits a partial miner inside
    ``map_batches`` and emits its (tiny) bank; the driver merges partial
    banks deterministically (sorted replay through a fresh miner). Different
    from the sequential bank but valid and run-invariant.

- **Count/group miners** (SLCT, Logram, LFA, IPLoM, AEL): expressed
  directly as Ray Data shuffles — token/n-gram ``groupby.count`` with
  per-batch partial counting, or ``groupby(bin).map_groups`` — the
  shuffle-natural designs from SURVEY.md §7.3.

All fits return a ``PatternBank``; matching is always the vectorized
``stages.parse`` path over the compiled bank (fit/match split).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from logparser_ray.core.ael import reconcile
from logparser_ray.core.bank import WILDCARD, PatternBank, Template
from logparser_ray.core.drain import Drain
from logparser_ray.core.iplom import mine_group
from logparser_ray.core.lenma import LenMa
from logparser_ray.core.logmine import LogMine
from logparser_ray.core.shiso import Shiso
from logparser_ray.core.spell import Spell

MINERS = {
    "drain": Drain,
    "spell": Spell,
    "lenma": LenMa,
    "shiso": Shiso,
    "logmine": LogMine,
}


def _new_miner(miner: str, params: dict | None):
    return MINERS[miner](**(params or {}))


def fit_bank(
    ds,
    miner: str = "drain",
    *,
    text_col: str = "text",
    mode: str = "scale",
    params: dict | None = None,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> PatternBank:
    """Fit an online miner over a Dataset → merged PatternBank."""
    if mode == "conformance":
        m = _new_miner(miner, params)
        ordered = ds.sort(list(order_cols))
        for batch in ordered.iter_batches(
            batch_size=65_536, batch_format="pyarrow", prefetch_batches=2
        ):
            m.fit_texts(batch[text_col].to_pylist())
        return m.bank()
    if mode != "scale":
        raise ValueError(mode)

    def fit_block(batch: pa.Table) -> pa.Table:
        local = _new_miner(miner, params)
        local.fit_texts(batch[text_col].to_pylist())
        return local.bank().to_arrow()

    partials = ds.select_columns([text_col]).map_batches(
        fit_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # partial banks are tiny (templates only) — safe to collect
    tables = [ray.get(r) for r in partials.to_arrow_refs()]
    banks = sorted(
        (PatternBank.from_arrow(tb) for tb in tables if tb.num_rows),
        key=lambda b: tuple(t.template for t in b),
    )
    if len(banks) > 64:
        # log-depth distributed reduce: a single sequential driver merge is
        # linear in block count (fine at 10³ blocks, a serial bottleneck at
        # the 10⁶ blocks a 100 TB corpus produces). Pairing is positional
        # over the sorted leaves → deterministic.
        return _tree_merge_banks(miner, params, banks)
    merged = _new_miner(miner, params)
    for t in banks:
        merged.merge_bank(t)
    return merged.bank()


def _tree_merge_banks(miner: str, params: dict | None, banks) -> PatternBank:
    """Deterministic pairwise reduce of partial banks in Ray tasks."""

    @ray.remote(num_cpus=1)
    def merge_pair(ta: pa.Table, tb: pa.Table | None) -> pa.Table:
        m = _new_miner(miner, params)
        parts = [PatternBank.from_arrow(ta)]
        if tb is not None:
            parts.append(PatternBank.from_arrow(tb))
        for b in sorted(parts, key=lambda b: tuple(t.template for t in b)):
            m.merge_bank(b)
        return m.bank().to_arrow()

    refs = [ray.put(b.to_arrow()) for b in banks]
    while len(refs) > 1:
        nxt = []
        for i in range(0, len(refs) - 1, 2):
            nxt.append(merge_pair.remote(refs[i], refs[i + 1]))
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return PatternBank.from_arrow(ray.get(refs[0]))


# ---------------------------------------------------------------------------
# SLCT — (position, word) support counting (SURVEY.md A9)
# ---------------------------------------------------------------------------

_SEP = "\x00"


def _bank_from_counts(tcounts: pd.DataFrame, support: int | None = None) -> PatternBank:
    """(template, n) frame → priority-ordered bank; robust to the EMPTY
    frame a filtered-to-nothing Dataset produces (schema-less — no columns)."""
    if "template" not in tcounts.columns or not len(tcounts):
        return PatternBank([])
    if support is not None:
        tcounts = tcounts[tcounts["n"] >= support]
    tcounts = tcounts.sort_values(["n", "template"], ascending=[False, True])
    return PatternBank(
        [Template.from_string(t, prio) for prio, t in enumerate(tcounts["template"])]
    )


def _token_lists(batch: pa.Table, text_col: str) -> pa.ListArray:
    return pc.split_pattern(batch[text_col].combine_chunks(), " ")


def _pos_keys(toks: pa.ListArray) -> pa.Array:
    """Flat ``"{n_tokens}\\x00{pos}\\x00{token}"`` key array (vectorized)."""
    offsets = np.asarray(toks.offsets)
    lengths = offsets[1:] - offsets[:-1]
    flat = toks.flatten()
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    ntok = np.repeat(lengths, lengths)
    return pc.binary_join_element_wise(
        pa.array(ntok.astype("U"), pa.string()),
        pa.array(pos.astype("U"), pa.string()),
        flat,
        _SEP,
    )


def slct_fit(ds, *, text_col: str = "text", support: int = 10) -> PatternBank:
    """Frequent (position, word) mining → templates; the most shuffle-natural
    miner: two vectorized passes + two small groupbys."""

    def count_keys(batch: pa.Table) -> pa.Table:
        keys = _pos_keys(_token_lists(batch, text_col))
        t = pa.table({"key": keys})
        return t.group_by(["key"]).aggregate([([], "count_all")]).rename_columns(
            ["key", "n"]
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(count_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    )
    freq_tbl = counts.filter(expr=f"n >= {support}").to_pandas()
    # an empty filter result yields a schema-less frame (no 'key' column);
    # empty frequent set is legitimate — every token wildcards
    frequent = ray.put(
        pa.array(freq_tbl["key"] if "key" in freq_tbl.columns else [], pa.string())
    )

    def templatize(batch: pa.Table) -> pa.Table:
        fset = ray.get(frequent)
        toks = _token_lists(batch, text_col)
        keys = _pos_keys(toks)
        keep = pc.is_in(keys, value_set=fset)
        out_flat = pc.if_else(keep, toks.flatten(), WILDCARD)
        lists = pa.ListArray.from_arrays(toks.offsets, out_flat)
        tmpl = pc.binary_join(lists, " ")
        t = pa.table({"template": tmpl})
        return t.group_by(["template"]).aggregate([([], "count_all")]).rename_columns(
            ["template", "n"]
        )

    tcounts = (
        ds.select_columns([text_col])
        .map_batches(templatize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _bank_from_counts(tcounts, support=support)


# ---------------------------------------------------------------------------
# Logram — n-gram dictionary mining (SURVEY.md A11)
# ---------------------------------------------------------------------------


def _bigram_keys(toks: pa.ListArray) -> pa.Array:
    offsets = np.asarray(toks.offsets)
    lengths = offsets[1:] - offsets[:-1]
    flat = toks.flatten()
    n = len(flat)
    # previous token = flat shifted one right; row starts get the "^" anchor
    prev = flat.take(pa.array(np.maximum(np.arange(n, dtype=np.int64) - 1, 0)))
    starts = np.zeros(n, dtype=bool)
    starts[offsets[:-1][lengths > 0]] = True
    prev = pc.if_else(pa.array(starts), "^", prev)
    return pc.binary_join_element_wise(prev, flat, _SEP)


def logram_fit(ds, *, text_col: str = "text", threshold: int = 10) -> PatternBank:
    """Bigram-dictionary mining: a token is dynamic iff its (prev, tok)
    bigram is rare (< threshold); templates = distinct wildcarded rows."""

    def count_bigrams(batch: pa.Table) -> pa.Table:
        keys = _bigram_keys(_token_lists(batch, text_col))
        t = pa.table({"key": keys})
        return t.group_by(["key"]).aggregate([([], "count_all")]).rename_columns(
            ["key", "n"]
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(count_bigrams, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    )
    freq_tbl = counts.filter(expr=f"n >= {threshold}").to_pandas()
    freq = ray.put(
        pa.array(freq_tbl["key"] if "key" in freq_tbl.columns else [], pa.string())
    )

    def templatize(batch: pa.Table) -> pa.Table:
        fset = ray.get(freq)
        toks = _token_lists(batch, text_col)
        keys = _bigram_keys(toks)
        keep = pc.is_in(keys, value_set=fset)
        out_flat = pc.if_else(keep, toks.flatten(), WILDCARD)
        lists = pa.ListArray.from_arrays(toks.offsets, out_flat)
        t = pa.table({"template": pc.binary_join(lists, " ")})
        return t.group_by(["template"]).aggregate([([], "count_all")]).rename_columns(
            ["template", "n"]
        )

    tcounts = (
        ds.select_columns([text_col])
        .map_batches(templatize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _bank_from_counts(tcounts)


# ---------------------------------------------------------------------------
# LFA — token-frequency miner (SURVEY.md A5)
# ---------------------------------------------------------------------------


def lfa_fit(ds, *, text_col: str = "text", min_ratio: float = 2.0) -> PatternBank:
    """LFA — word-position frequency split (Nagappan & Vouk, MSR 2010;
    SURVEY.md A5). Frequencies are keyed ``(n_tokens, position, token)``
    (the paper's word-position table); per message the sorted frequency
    profile is cut at the sharpest RELATIVE drop — the split between
    consecutive sorted values with the largest ratio, the paper's
    "parameters occur far less often than the constant skeleton" intuition.
    Tokens at or below the cut become ``<*>``. Two guards keep the cut
    honest: the best ratio must be ≥ ``min_ratio`` (a flat profile means an
    all-constant line) and parameters may cover at most half the tokens (a
    line that is mostly "parameters" is really a rare constant line). An
    absolute-gap cut instead picks the jump into globally shared tokens
    ('with', '<*>') and wildcards the true skeleton — measured 0.42 vs 0.89
    grouping accuracy on the transcripts fixture.

    The frequency map is broadcast once (vocab-scale; at 100 TB prune keys
    below a minimum count — dropped keys sit under any cut that fires).
    DuckDB re-derivation: queries.py ORACLE['docs_freq_templates'] lfa_*
    CTEs — both sides order ties by (frequency, position) and break
    equal-ratio ties toward the smallest split value."""

    def count_keys(batch: pa.Table) -> pa.Table:
        keys = _pos_keys(_token_lists(batch, text_col))
        t = pa.table({"key": keys})
        return t.group_by(["key"]).aggregate([([], "count_all")]).rename_columns(
            ["key", "n"]
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(count_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if "key" not in counts.columns or not len(counts):
        return PatternBank([])
    freq = ray.put(
        pa.table(
            {
                "key": pa.array(counts["key"], pa.string()),
                "n": pa.array(counts["n"], pa.int64()),
            }
        )
    )

    def templatize(batch: pa.Table) -> pa.Table:
        fmap = ray.get(freq)
        toks = _token_lists(batch, text_col)
        offsets = np.asarray(toks.offsets)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        nrows = len(lengths)
        flat = toks.flatten()
        keys = _pos_keys(toks)
        idx = pc.index_in(keys, value_set=fmap["key"].combine_chunks())
        # every (ntok, pos, tok) of this corpus is in the map by construction
        f = np.asarray(
            pc.fill_null(pc.take(fmap["n"].combine_chunks(), idx), 1),
            dtype=np.int64,
        )
        row_id = np.repeat(np.arange(nrows), lengths)
        starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
        # sort frequencies ascending within each row (stable → ties keep
        # position order, matching the oracle's ORDER BY n, pos)
        order = np.lexsort((f, row_id))
        sf = f[order].astype(np.float64)
        ratio = np.ones(len(sf))
        if len(sf) > 1:
            ratio[1:] = sf[1:] / sf[:-1]
        ratio[starts] = 1.0  # no cross-row ratios
        if nrows:
            best = np.maximum.reduceat(ratio, starts)
            # first sorted index achieving the best ratio → smallest split
            pos_idx = np.arange(len(sf))
            cand = np.where(ratio == np.repeat(best, lengths), pos_idx, len(sf))
            first = np.minimum.reduceat(cand, starts)
            gated = best >= min_ratio  # first > start whenever this fires
            split = np.where(gated, sf[np.maximum(first, 1) - 1], -1.0)
            n_params = np.where(gated, first - starts, 0)
            gate = gated & (2 * n_params <= lengths)
            wild = (f <= np.repeat(split, lengths)) & np.repeat(gate, lengths)
        else:
            wild = np.zeros(0, dtype=bool)
        out_flat = pc.if_else(
            pa.array(wild), pa.scalar(WILDCARD, pa.string()), flat
        )
        lists = pa.ListArray.from_arrays(toks.offsets, out_flat)
        t = pa.table({"template": pc.binary_join(lists, " ")})
        return t.group_by(["template"]).aggregate([([], "count_all")]).rename_columns(
            ["template", "n"]
        )

    tcounts = (
        ds.select_columns([text_col])
        .map_batches(templatize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _bank_from_counts(tcounts)


# ---------------------------------------------------------------------------
# IPLoM / AEL — group-then-label via groupby(n_tokens/bin).map_groups
# ---------------------------------------------------------------------------


def _with_ntok(ds, text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        return batch.append_column(
            "n_tokens", pc.cast(pc.list_value_length(toks), pa.int32())
        )

    return ds.select_columns([text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _iplom_split_pos(ds, text_col: str) -> dict[int, int]:
    """Steps 1–2 key choice, distributed: per token count, the position
    with the fewest distinct tokens among positions with >1 (ties → lowest
    position); -1 when every position is constant. Only the tiny
    (n_tokens, pos, cardinality) summary reaches the driver."""
    from ray.data.aggregate import Count

    def pos_token_counts(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        offsets = np.asarray(toks.offsets)
        lengths = offsets[1:] - offsets[:-1]
        flat = toks.flatten()
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        ntok = np.repeat(lengths, lengths)
        t = pa.table(
            {
                "ntok": pa.array(ntok.astype(np.int32)),
                "pos": pa.array(pos.astype(np.int32)),
                "tok": flat,
            }
        )
        return (
            t.group_by(["ntok", "pos", "tok"])
            .aggregate([([], "count_all")])
            .rename_columns(["ntok", "pos", "tok", "_c"])
        )

    uniq = (
        ds.select_columns([text_col])
        .map_batches(pos_token_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["ntok", "pos", "tok"])
        .aggregate(Count(alias_name="_dup"))
    )
    cards = (
        uniq.drop_columns(["_dup"])  # groupby already dropped the _c payload
        .groupby(["ntok", "pos"])
        .aggregate(Count(alias_name="card"))
        .to_pandas()  # ≤ token-lengths × positions rows — tiny
    )
    split_pos: dict[int, int] = {}
    for ntok_val, grp in cards.groupby("ntok"):
        cand = grp[grp["card"] > 1]
        if len(cand):
            best = cand.sort_values(["card", "pos"]).iloc[0]
            split_pos[int(ntok_val)] = int(best["pos"])
        else:
            split_pos[int(ntok_val)] = -1  # all-constant group: no split
    return split_pos


def _iplom_add_keys(split_pos: dict[int, int], text_col: str):
    """Batch fn appending the step-2 partition key ``(n_tokens, skey)``."""

    def add_keys(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        offsets = np.asarray(toks.offsets)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        posarr = (
            pd.Series(lengths).map(split_pos).fillna(-1).to_numpy(dtype=np.int64)
        )
        key = np.where(
            posarr >= 0, flat[offsets[:-1] + np.clip(posarr, 0, None)], ""
        )
        return pa.table(
            {
                text_col: batch[text_col],
                "n_tokens": pa.array(lengths.astype(np.int32)),
                "skey": pa.array(key.astype(object), pa.string()),
            }
        )

    return add_keys


def iplom_fit(
    ds, *, text_col: str = "text", ct: float = 0.35, lower_bound: float = 0.25
) -> PatternBank:
    """Fully distributed IPLoM: step 1 (token count) AND step 2 (lowest-
    cardinality position split) are both shuffle keys.

    The split position per token count is chosen by a distributed
    cardinality pass (distinct (ntok, pos, tok) → count per (ntok, pos) —
    the tiny result drives the key choice on the driver, identical to the
    in-memory ``_split_lowest_cardinality`` choice). The main shuffle then
    groups by ``(n_tokens, token@split_pos)`` — each group is one STEP-2
    PARTITION, so no whole token-count group ever materializes on a single
    worker (r1 skew bound); steps 3–4 run per partition, and identical
    templates from different partitions collapse in a final tiny groupby.
    Remaining bound: one (n_tokens, split-token) partition per worker.
    """
    from logparser_ray.core.iplom import _split_bijection, _template_of

    split_pos = _iplom_split_pos(ds, text_col)
    add_keys = _iplom_add_keys(split_pos, text_col)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        seqs = [t.split(" ") for t in g[text_col]]
        templates = []
        for p3 in _split_bijection(seqs, ct=ct, lower_bound=lower_bound):
            templates.append((_template_of(p3), len(p3)))
        return pd.DataFrame(
            {
                "template": [" ".join(t) for t, _ in templates],
                "n": [n for _, n in templates],
            }
        )

    leaves = (
        ds.select_columns([text_col])
        .map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["n_tokens", "skey"])
        .map_groups(per_part, batch_format="pandas")
    )
    out = (
        leaves.groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _bank_from_counts(out)


def iplom_leaves(ds, *, text_col: str = "text") -> "pd.DataFrame":
    """SQL-oracle-able projection of the IPLoM pipeline: steps 1–2 exactly
    as ``iplom_fit`` (distributed lowest-cardinality split-position choice,
    same tie-breaking), then the step-4 leaf templatize — a position is
    constant iff it carries exactly ONE distinct token in the partition —
    applied directly to each ``(n_tokens, split-token)`` partition. Step-3
    bijection is deliberately OFF: every remaining stage is deterministic
    groupby + string logic DuckDB reproduces over the raw table, which is
    what lets the driver hash-pin SURVEY A2 semantics independently (the
    bijection path stays pinned by pytest and the miner-conformance
    harness — it is order-insensitive but not SQL-expressible).

    Fully distributed until the per-(leaf, position) summary, which is
    template-space-scale (leaves × positions, NOT corpus-scale) and is the
    only thing the driver assembles. Returns a pandas DataFrame
    ``(n_tokens, skey, template, n)`` — one row per step-2 partition.
    """
    from ray.data.aggregate import Count, Min

    split_pos = _iplom_split_pos(ds, text_col)

    keyed = ds.select_columns([text_col]).map_batches(
        _iplom_add_keys(split_pos, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def explode_positions(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        offsets = np.asarray(toks.offsets)
        lengths = offsets[1:] - offsets[:-1]
        flat = toks.flatten()
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        t = pa.table(
            {
                "n_tokens": pa.array(
                    np.repeat(lengths.astype(np.int64), lengths)
                ),
                "skey": pa.array(
                    np.repeat(
                        batch["skey"].to_numpy(zero_copy_only=False), lengths
                    ),
                    pa.string(),
                ),
                "pos": pa.array(pos),
                "tok": flat,
            }
        )
        # per-batch distinct shrinks the exchange to near-vocab scale
        return t.group_by(["n_tokens", "skey", "pos", "tok"]).aggregate([])

    distinct = (
        keyed.map_batches(
            explode_positions, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["n_tokens", "skey", "pos", "tok"])
        .aggregate(Count(alias_name="_dup"))
        .drop_columns(["_dup"])
    )
    per_pos = (
        distinct.groupby(["n_tokens", "skey", "pos"])
        .aggregate(Count(alias_name="card"), Min("tok", alias_name="tok_min"))
        .to_pandas()  # leaves × positions — template-space, tiny
        .sort_values(["n_tokens", "skey", "pos"])
    )
    per_pos["ptok"] = np.where(per_pos["card"] == 1, per_pos["tok_min"], WILDCARD)
    tpl = (
        per_pos.groupby(["n_tokens", "skey"], sort=True)["ptok"]
        .agg(" ".join)
        .rename("template")
        .reset_index()
    )
    leaf_n = (
        keyed.map_batches(
            lambda b: b.group_by(["n_tokens", "skey"])
            .aggregate([([], "count_all")])
            .rename_columns(["n_tokens", "skey", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["n_tokens", "skey"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    leaf_n["n_tokens"] = leaf_n["n_tokens"].astype(np.int64)
    tpl["n_tokens"] = tpl["n_tokens"].astype(np.int64)
    out = tpl.merge(leaf_n, on=["n_tokens", "skey"])
    return out.sort_values(["n_tokens", "skey"]).reset_index(drop=True)


def ael_abstract_counts(ds, *, text_col: str = "text") -> pd.DataFrame:
    """AEL steps 1–2 (categorize + abstract), distributed and deterministic:
    one vectorized skeleton pass + ``groupby(n_tokens, n_dyn, skeleton)``
    count. This is the SQL-oracle-able projection of AEL (the driver
    hash-pins it against a DuckDB reproduction over the raw table); the
    order-dependent greedy reconcile (step 3) consumes this output in
    ``ael_fit`` and stays pinned by pytest + the conformance harness.
    Returns a template-space pandas DataFrame sorted the way reconcile
    consumes it: ``(n_tokens, n_dyn, -n, skeleton)``."""

    def skeletons(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        offsets = np.asarray(toks.offsets)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int32)
        flat = toks.flatten()
        dyn = pc.match_substring_regex(flat, r"[0-9=]")
        skel_flat = pc.if_else(dyn, WILDCARD, flat)
        skel = pc.binary_join(pa.ListArray.from_arrays(toks.offsets, skel_flat), " ")
        ndyn = np.add.reduceat(
            np.asarray(dyn, dtype=np.int64), offsets[:-1]
        ).astype(np.int32) if len(lengths) else np.zeros(0, np.int32)
        t = pa.table(
            {
                "n_tokens": pa.array(lengths),
                "n_dyn": pa.array(ndyn),
                "skeleton": skel,
            }
        )
        agg = t.group_by(["n_tokens", "n_dyn", "skeleton"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["n_tokens", "n_dyn", "skeleton", "n"])

    return (
        ds.select_columns([text_col])
        .map_batches(skeletons, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["n_tokens", "n_dyn", "skeleton"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(
            ["n_tokens", "n_dyn", "n", "skeleton"],
            ascending=[True, True, False, True],
        )
    )


def ael_fit(ds, *, text_col: str = "text", merge_pct: float = 0.1) -> PatternBank:
    """Bin by (n_tokens, n_dynamic) → abstract → reconcile per bin.

    Categorize + abstract are ONE vectorized pass: dynamic tokens
    (digit/``=`` heuristic, ``core.ael.is_dynamic``) wildcard via a single
    ``match_substring_regex`` over the flat token stream, skeletons rebuild
    with ``binary_join``, and the bin structure collapses into a
    ``groupby(n_tokens, n_dyn, skeleton).count`` — no per-row Python and no
    per-bin pandas materialization (the r1 version looped ``bin_key`` over
    every row and held each bin in one worker's frame). Reconcile (step 3)
    stays driver-side over the tiny template set, applied PER BIN (paper
    semantics — cross-bin merging collapsed sibling templates of unequal
    n_dyn) and fed in a deterministic (n_tokens, n_dyn, −count, skeleton)
    order.
    """

    counts = ael_abstract_counts(ds, text_col=text_col)
    merged: list[tuple[list[str], int]] = []
    for _bin, grp in counts.groupby(["n_tokens", "n_dyn"], sort=False):
        merged.extend(
            reconcile(
                [
                    (s.split(" "), int(n))
                    for s, n in zip(grp["skeleton"], grp["n"])
                ],
                merge_pct=merge_pct,
            )
        )
    # Cross-bin dedup: widening a low-n_dyn bin's template can make it equal
    # a sibling bin's (same string, same md5 id) — keep one entry per
    # template string with summed support so bank priorities and benchmark
    # occurrence totals aren't split across duplicates.
    by_tmpl: dict[str, int] = {}
    for toks, n in merged:
        s = " ".join(toks)
        by_tmpl[s] = by_tmpl.get(s, 0) + n
    uniq = sorted(by_tmpl.items(), key=lambda tn: (-tn[1], tn[0]))
    return PatternBank(
        [Template.from_string(t, prio) for prio, (t, _) in enumerate(uniq)]
    )


# ---------------------------------------------------------------------------
# LogCluster — position-independent frequent-word mining (SURVEY.md A8)
# ---------------------------------------------------------------------------


def logcluster_fit(ds, *, text_col: str = "text", support: int = 10) -> PatternBank:
    """Frequent-WORD mining (Vaarandi & Pihelgas, CNSM 2015; upstream runs
    the Perl ``logcluster.pl`` via subprocess — † ``logparser/LogCluster/``).

    A word is frequent iff its total occurrence count ≥ ``support``
    (position-independent, unlike SLCT's (position, word) keys); each line
    keeps its frequent words and wildcards the rest; line patterns with
    support ≥ ``support`` become templates. Upstream emits variable-length
    ``*{m,n}`` gaps; our bank is token-count-anchored so runs of wildcards
    stay positional (documented deviation)."""

    def count_words(batch: pa.Table) -> pa.Table:
        flat = _token_lists(batch, text_col).flatten()
        t = pa.table({"tok": flat})
        return t.group_by(["tok"]).aggregate([([], "count_all")]).rename_columns(
            ["tok", "n"]
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(count_words, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )
    freq_tbl = counts.filter(expr=f"n >= {support}").to_pandas()
    freq = ray.put(
        pa.array(freq_tbl["tok"] if "tok" in freq_tbl.columns else [], pa.string())
    )

    def templatize(batch: pa.Table) -> pa.Table:
        fset = ray.get(freq)
        toks = _token_lists(batch, text_col)
        keep = pc.is_in(toks.flatten(), value_set=fset)
        out_flat = pc.if_else(keep, toks.flatten(), WILDCARD)
        lists = pa.ListArray.from_arrays(toks.offsets, out_flat)
        t = pa.table({"template": pc.binary_join(lists, " ")})
        return t.group_by(["template"]).aggregate([([], "count_all")]).rename_columns(
            ["template", "n"]
        )

    tcounts = (
        ds.select_columns([text_col])
        .map_batches(templatize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tcounts = tcounts[tcounts["n"] >= support].sort_values(
        ["n", "template"], ascending=[False, True]
    )
    return PatternBank(
        [Template.from_string(t, prio) for prio, t in enumerate(tcounts["template"])]
    )


# ---------------------------------------------------------------------------
# LogSig / LKE — sample-based fits (SURVEY.md A6, A7)
# ---------------------------------------------------------------------------


def _sample_texts(ds, text_col: str, n_sample: int, seed: int) -> list[str]:
    """Deterministic sample for the O(n·k)/O(n²) miners: the ``n_sample``
    DISTINCT texts with the smallest keyed hash (stable across block
    structure, unlike ``random_sample`` whose draw depends on
    partitioning). Computed as a per-batch k-smallest combiner + tiny
    driver merge — NO global sort (a corpus-wide all-to-all to draw 5k
    rows was the round-2 scale-killer). Distinct-shape sampling is what a
    clustering fit needs: a ROW sample of a duplicate-heavy corpus admits
    whole duplicate groups per hash and covered only 24/42 shapes of the
    2k-turn fixture at n=1000 (losing e.g. every ``Session started`` row,
    so LKE/LogSig could never emit that template)."""
    from logparser_ray.stages.sample import sample_min_k_by_hash

    sampled = sample_min_k_by_hash(
        ds, cols=[text_col], key_col=text_col, n=n_sample, seed=seed, distinct=True
    )
    return list(sampled[text_col])


def logsig_fit(
    ds,
    *,
    text_col: str = "text",
    k: int = 16,
    max_iters: int = 10,
    n_sample: int = 5_000,
    seed: int = 42,
) -> PatternBank:
    """LogSig word-pair clustering on a deterministic sample (the iterative
    reassignment is inherently global — SURVEY.md A6 'low priority,
    iterative'); the full corpus is then matched through the compiled bank."""
    from logparser_ray.core.logsig import logsig_fit_seqs

    texts = _sample_texts(ds, text_col, n_sample, seed)
    seqs = [t.split() for t in texts if t]
    return logsig_fit_seqs(seqs, k=k, max_iters=max_iters)


def lke_fit(
    ds,
    *,
    text_col: str = "text",
    threshold: float = 0.3,
    n_sample: int = 1_000,
    seed: int = 42,
) -> PatternBank:
    """LKE weighted-edit-distance clustering on a deterministic sample
    (upstream is O(n²) and fails beyond tens of MBs — SURVEY.md §6;
    sample-fit + vectorized match is the scale path, SURVEY.md A7)."""
    from logparser_ray.core.lke import lke_fit_seqs

    texts = _sample_texts(ds, text_col, n_sample, seed)
    seqs = [t.split() for t in texts if t]
    return lke_fit_seqs(seqs, threshold=threshold)
