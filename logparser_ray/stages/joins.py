"""As-of join — a custom operator Ray Data lacks (SURVEY.md "custom
operators": compose from groupby().map_groups when semantics allow).

``asof_join(left, right, on=..., tiebreak=..., by=...)``: for every left
row, attach the latest right row STRICTLY BEFORE it in the total order
``(on, tiebreak)`` within the same ``by`` partition. Strict-previous over a
unique total order makes the result deterministic on any engine (no
tie-breaking ambiguity — the reason this formulation is DuckDB-oracle-able
where raw ASOF JOIN tie behavior is not).

Implementation: tag the two sides, union them, ONE hash-partitioned
``groupby(by).map_groups`` whose group fn sorts once and forward-fills —
each partition's rows meet exactly once, the same single exchange a
dedicated as-of operator needs. Partitioning assumption (documented per
SURVEY.md): ``by`` spreads partitions; as-of windows cannot be split, so
skew is bounded by the largest single key — true of any engine's as-of.
``(on, tiebreak)`` must be unique per row within a partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left,
    right,
    *,
    on: str,
    by: str,
    tiebreak: str,
    right_cols: list[str],
    suffix: str = "_r",
):
    """Strict-backward as-of join of two Datasets; left rows with no prior
    right row get nulls in the ``right_cols`` (renamed with ``suffix``)."""
    l_tag = left.map_batches(
        lambda b: b.append_column("_side", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    r_keep = list(dict.fromkeys([by, on, tiebreak] + list(right_cols)))
    r_tag = right.select_columns(r_keep).map_batches(
        lambda b: b.append_column("_side", pa.array(np.ones(len(b), np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    both = l_tag.union(r_tag)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([on, tiebreak]).reset_index(drop=True)
        is_r = g["_side"] == 1
        out_cols = {}
        for c in right_cols:
            # ffill = right value as of (≤) each row; shift(1) converts that
            # to "as of the previous row" = latest right row STRICTLY before
            # this one in the (on, tiebreak) total order
            out_cols[f"{c}{suffix}"] = g[c].where(is_r).ffill().shift(1)
        res = g.assign(**out_cols)
        return res[~is_r].drop(columns=["_side"])

    return both.groupby(by).map_groups(per_key, batch_format="pandas")


def interval_join(
    ds,
    intervals: "pa.Table",
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    carry_cols: list[str] | None = None,
):
    """Range join (SURVEY.md custom operators): attach to each row the
    interval containing its value (``lo <= v < hi``).

    Intervals must be non-overlapping; they are sorted and broadcast once
    (``ray.put`` — interval tables are dimension-sized), and each batch does
    ONE vectorized ``np.searchsorted`` — no shuffle at all, the
    broadcast-small-side pattern. Rows outside every interval get nulls.
    """
    import ray

    order = np.argsort(intervals[lo_col].to_numpy(zero_copy_only=False))
    sorted_iv = intervals.take(pa.array(order))
    lo = sorted_iv[lo_col].to_numpy(zero_copy_only=False)
    hi = sorted_iv[hi_col].to_numpy(zero_copy_only=False)
    if (lo[1:] < hi[:-1]).any():
        raise ValueError("intervals overlap")
    carry = carry_cols or [c for c in sorted_iv.column_names if c not in (lo_col, hi_col)]
    ref = ray.put(sorted_iv)

    def fn(batch: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        lo_v = iv[lo_col].to_numpy(zero_copy_only=False)
        hi_v = iv[hi_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo_v, v, side="right") - 1
        ok = (idx >= 0) & (v < hi_v[np.clip(idx, 0, len(hi_v) - 1)])
        take = np.where(ok, idx, -1)
        take_arr = pa.array(
            np.where(take < 0, None, take).astype(object), pa.int64()
        )
        out = batch
        for c in carry:
            out = out.append_column(c, iv[c].combine_chunks().take(take_arr))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
