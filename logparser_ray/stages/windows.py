"""Windowed/streaming operators whose partitioning survives hot keys.

``groupby(user).map_groups`` sessionization is bounded by a single user's
whole history on one worker — fine for human users, a skew hazard for bot
traffic at 100 TB. ``sessionize_bucketed`` removes that bound EXACTLY:

1. phase 1 shuffles on the finer ``(user, time_bucket)`` key and computes
   per-bucket session counts plus the bucket's first/last timestamps;
2. phase 2 merges per user over the tiny bucket rows: a session continues
   across a bucket boundary iff the gap between the previous bucket's last
   event and the next present bucket's first event is ≤ ``gap_s`` — one
   subtraction per continuing boundary.

Gap-based sessionization is a linear scan, so the bucket decomposition is
lossless: the result equals the single-pass count for every input
(equality-tested against the naive operator). Worker memory is bounded by
one (user, bucket) slice, tunable via ``bucket_s``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize_bucketed(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
    bucket_s: int = 86_400,
):
    """Per-user session counts, hot-key-safe. Returns a Dataset
    ``(user_col, n_sessions)`` identical to the naive single-group scan."""

    def add_bucket(b: pa.Table) -> pa.Table:
        ep = pc.cast(b[ts_col].combine_chunks(), pa.int64()).to_numpy()  # µs
        bucket = ep // (bucket_s * 1_000_000)
        return b.append_column("_bucket", pa.array(bucket))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        gaps = g[ts_col].diff().dt.total_seconds()
        n = int((gaps.isna() | (gaps > gap_s)).sum())
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "_bucket": [g["_bucket"].iloc[0]],
                "n_sessions": [n],
                "_first_ts": [g[ts_col].iloc[0]],
                "_last_ts": [g[ts_col].iloc[-1]],
            }
        )

    partials = (
        ds.select_columns([user_col, ts_col, id_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([user_col, "_bucket"])
        .map_groups(per_bucket, batch_format="pandas")
    )

    def merge_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_bucket")
        n = int(g["n_sessions"].sum())
        if len(g) > 1:
            # continuation iff gap between a present bucket's last event and
            # the NEXT present bucket's first event is within gap_s (empty
            # buckets in between just make the gap larger — handled by time)
            gaps = (
                g["_first_ts"].iloc[1:].to_numpy() - g["_last_ts"].iloc[:-1].to_numpy()
            ) / np.timedelta64(1, "s")
            n -= int((gaps <= gap_s).sum())
        return pd.DataFrame({user_col: [g[user_col].iloc[0]], "n_sessions": [n]})

    return partials.groupby(user_col).map_groups(merge_user, batch_format="pandas")
