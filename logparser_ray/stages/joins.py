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
