"""Aggregations (SURVEY.md A1, A14, S5): partial-aggregate then tiny groupby.

The scale-critical pattern: a bare ``groupby(keys).count()`` shuffles every
row. ``sink_counts`` instead pre-aggregates inside ``map_batches`` (one row
per distinct key per batch — the combiner) and only the partials enter the
all-to-all ``groupby().sum()``. At 10^12 turns with a few hundred sinks the
shuffle moves KBs instead of TBs; hot-key skew (one template dominating)
is absorbed by the combiner for the same reason.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum

SINK_KEYS = ["role", "tool", "template_id"]


def partial_count(keys: list[str], alias: str = "n_turns"):
    """A map_batches fn computing per-batch grouped counts (the combiner)."""

    def fn(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys).aggregate([([], "count_all")])
        return agg.rename_columns(keys + [alias])

    return fn


def grouped_count(ds, keys: list[str], alias: str = "n_turns", batch_size=None):
    """Exact grouped row count via partial-agg → groupby-sum. Returns Dataset.

    ``batch_size=None`` (whole blocks) on purpose: a fixed batch size that
    doesn't divide the upstream block size makes Ray rebatch ACROSS block
    boundaries — concat-copying every wide block — which measured 4-7×
    slower than per-block batches on this stage (blocks are already bounded
    by the source's block sizing, so memory stays bounded without it)."""
    partials = ds.map_batches(
        partial_count(keys, alias),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    out = partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))
    return out


def sink_counts(ds, alias: str = "n_turns"):
    """Per-sink aggregate counts keyed ``(role, tool, template_id)`` (A14)."""
    return grouped_count(ds, SINK_KEYS, alias)


def template_occurrences(ds, alias: str = "occurrences"):
    """The reference's ``_templates.csv`` aggregate: count per template,
    sorted by occurrences desc then template_id asc (S5, O2)."""
    counts = grouped_count(ds, ["template_id", "template"], alias)
    return counts.sort([alias, "template_id"], descending=[True, False])


def _require_string_keys(b: pa.Table, keys: list[str], op: str) -> None:
    """Rollup-family keys must be strings: coarser levels pad them with a
    string fill, and a silent int key would union mismatched schemas."""
    for k in keys:
        t = b.schema.field(k).type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise TypeError(
                f"{op} requires string key columns (pad levels carry the "
                f"fill marker); column {k!r} is {t} — cast it upstream"
            )


def rollup_counts(ds, keys: list[str], *, sum_col: str | None = None,
                  alias: str = "n", fill: str = "*", batch_size=None):
    """Hierarchical ROLLUP aggregate (public shape: ANSI SQL
    ``GROUP BY ROLLUP``, Gray et al. "Data Cube" ICDE 1996):
    grouped counts (+ one optional int64 sum) at EVERY prefix level of
    ``keys`` — (k1,k2), (k1,'*'), ('*','*') for two keys — in one scan of
    the fact table.

    Scale shape: the fact table feeds only the finest level, via the same
    combiner → tiny-groupby exchange as ``grouped_count``; every coarser
    level re-aggregates the PREVIOUS level's already-summary-sized result
    (cardinality ≤ distinct(keys)), so rolling up adds no second scan and
    no second all-to-all over rows. Key columns must be strings (the
    rolled-out levels pad them with ``fill``); counts/sums are int64.
    """
    aggs = [([], "count_all")] if sum_col is None else [
        (sum_col, "sum"), ([], "count_all")
    ]
    out_cols = [alias] if sum_col is None else [sum_col, alias]

    def partial(b: pa.Table) -> pa.Table:
        _require_string_keys(b, keys, "rollup_counts")
        cols = keys + ([sum_col] if sum_col else [])
        agg = b.select(cols).group_by(keys).aggregate(aggs)
        return agg.rename_columns(keys + out_cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    sums = [Sum(alias, alias_name=alias)] + (
        [Sum(sum_col, alias_name=sum_col)] if sum_col else []
    )
    finest = partials.groupby(keys).aggregate(*sums)
    order = keys + out_cols

    def pad(dropped: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            for c in dropped:
                b = b.append_column(c, pa.array([fill] * len(b), pa.string()))
            return b.select(order)
        return fn

    levels = [finest.map_batches(pad([]), batch_format="pyarrow")]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        if kept:
            cur = cur.groupby(kept).aggregate(*sums)
        else:
            # grand total: constant-key groupby (still one exchange over a
            # handful of summary rows — no driver-side fold)
            cur = (
                cur.map_batches(
                    lambda b: b.append_column(
                        "_g", pa.array([0] * len(b), pa.int8())
                    ),
                    batch_format="pyarrow",
                )
                .groupby("_g")
                .aggregate(*sums)
                # _g is dropped by pad()'s select(order)
            )
        levels.append(cur.map_batches(pad(keys[i:]), batch_format="pyarrow"))
    u = levels[0]
    for lvl in levels[1:]:
        u = u.union(lvl)
    return u


def aligned_counts(left_ds, right_ds, key: str, *, batch_size=None):
    """FULL OUTER alignment of two grouped counts on ``key`` — the
    "align two series on a shared axis" operator (SQL:
    ``agg FULL OUTER JOIN agg USING (key)``).

    Scale shape: no row-level join at all. Each side emits per-batch count
    partials tagged with side flags (n_l/n_r + in_l/in_r presence
    markers), the tagged partials union, and ONE ``groupby(key).sum``
    produces the aligned result — a single exchange over summary-sized
    partials even when both inputs are fact-scale. Sides absent for a key
    report ``-1`` (not 0: "no rows on that side" vs "zero count" stays
    distinguishable while the columns remain plain int64).
    """
    import numpy as np

    def partial(is_left: bool):
        def fn(b: pa.Table) -> pa.Table:
            agg = b.select([key]).group_by([key]).aggregate([([], "count_all")])
            agg = agg.rename_columns([key, "c"])
            c = agg["c"].to_numpy(zero_copy_only=False).astype("int64")
            z = np.zeros(len(agg), dtype="int64")
            one = np.ones(len(agg), dtype="int64")
            return pa.table(
                {
                    key: agg[key],
                    "n_l": pa.array(c if is_left else z),
                    "n_r": pa.array(z if is_left else c),
                    "in_l": pa.array(one if is_left else z),
                    "in_r": pa.array(z if is_left else one),
                }
            )

        return fn

    l = left_ds.map_batches(
        partial(True), batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    r = right_ds.map_batches(
        partial(False), batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    merged = l.union(r).groupby(key).aggregate(
        Sum("n_l", alias_name="n_l"),
        Sum("n_r", alias_name="n_r"),
        Sum("in_l", alias_name="in_l"),
        Sum("in_r", alias_name="in_r"),
    )

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        nl = b["n_l"].to_numpy(zero_copy_only=False).astype("int64")
        nr = b["n_r"].to_numpy(zero_copy_only=False).astype("int64")
        il = b["in_l"].to_numpy(zero_copy_only=False) > 0
        ir = b["in_r"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                key: b[key],
                "n_left": pa.array(np.where(il, nl, -1)),
                "n_right": pa.array(np.where(ir, nr, -1)),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def grouping_sets_counts(ds, keys: list[str], sets: "list[list[str]]", *,
                         sum_col: str | None = None, alias: str = "n",
                         fill: str = "*", batch_size=None):
    """ANSI SQL ``GROUP BY GROUPING SETS`` / ``CUBE`` (Gray et al.,
    ICDE 1996): grouped counts (+ one
    optional int64 sum) at every requested subset of ``keys``.

    Same scale shape as ``rollup_counts``: the fact table is scanned once
    into the finest (all-keys) level via the combiner → tiny-groupby
    exchange; every requested set re-aggregates that summary-sized result
    (any subset folds correctly from the full key combination — unlike
    rollup's prefix chain, sets here are arbitrary, e.g. ``('*', month)``).
    Key columns must be strings; keys absent from a set carry ``fill``.
    For a full cube pass ``sets=[all subsets]``.
    """
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s!r} has unknown keys {unknown}")

    aggs = [([], "count_all")] if sum_col is None else [
        (sum_col, "sum"), ([], "count_all")
    ]
    out_cols = [alias] if sum_col is None else [sum_col, alias]

    def partial(b: pa.Table) -> pa.Table:
        _require_string_keys(b, keys, "grouping_sets_counts")
        cols = keys + ([sum_col] if sum_col else [])
        agg = b.select(cols).group_by(keys).aggregate(aggs)
        return agg.rename_columns(keys + out_cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    sums = [Sum(alias, alias_name=alias)] + (
        [Sum(sum_col, alias_name=sum_col)] if sum_col else []
    )
    finest = partials.groupby(keys).aggregate(*sums)
    order = keys + out_cols

    def pad(dropped: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            for c in dropped:
                b = b.append_column(c, pa.array([fill] * len(b), pa.string()))
            return b.select(order)
        return fn

    levels = []
    for s in sets:
        kept = [k for k in keys if k in s]  # canonical key order
        dropped = [k for k in keys if k not in s]
        if set(kept) == set(keys):
            lvl = finest
        elif kept:
            lvl = finest.groupby(kept).aggregate(*sums)
        else:
            lvl = (
                finest.map_batches(
                    lambda b: b.append_column(
                        "_g", pa.array([0] * len(b), pa.int8())
                    ),
                    batch_format="pyarrow",
                )
                .groupby("_g")
                .aggregate(*sums)
                # _g is dropped by pad()'s select(order)
            )
        levels.append(lvl.map_batches(pad(dropped), batch_format="pyarrow"))
    u = levels[0]
    for lvl in levels[1:]:
        u = u.union(lvl)
    return u


def cube_counts(ds, keys: list[str], **kw):
    """``GROUP BY CUBE(keys...)`` — all 2^k subsets via
    ``grouping_sets_counts`` (finest level computed once)."""
    from itertools import combinations

    sets = [
        list(c) for r in range(len(keys), -1, -1)
        for c in combinations(keys, r)
    ]
    return grouping_sets_counts(ds, keys, sets, **kw)
