"""Distributed table profiler — per-column data-quality statistics in one
streaming pass plus one tiny keyed exchange (plus one value-scale exchange
for EXACT distinct counts, or none in the KMV-approximate mode).

Per column: row count, null count, distinct count, min / max (rendered as
strings so every column type shares one output schema). The 100 TB shape:

- counts and min/max are per-batch PARTIALS (one row per column per batch)
  merged by a column-count-sized ``groupby("col")`` — the exchange moves
  n_blocks × n_cols tiny rows, never data.
- min/max fold on ORDER-PRESERVING string keys (int64/timestamp values are
  offset to unsigned and zero-padded to fixed width, so lexicographic
  Min/Max equals numeric min/max; strings fold as themselves — byte-wise,
  which matches DuckDB's binary collation on ASCII corpora). Floats fold
  on the classic total-order bit trick (IEEE-754 bits viewed as uint64;
  negative values complemented, non-negative get the sign bit set) rendered
  as fixed-width hex — lexicographic order equals the IEEE total order, so
  the same string-key Min/Max stays exact. NaN is canonicalized to the
  positive-NaN pattern before keying, which sorts it GREATER than every
  real (and ±inf below/above all finite values) — exactly DuckDB's
  min/max semantics; the final rendering is Python's shortest-round-trip
  ``repr``, byte-identical to DuckDB ``CAST(double AS VARCHAR)``
  (verified: decimals, exponent thresholds, nan/inf/-inf, -0.0).
- exact distinct (``approx=False``) streams per-batch-deduped
  ``(col, value_repr)`` rows through one hash aggregation — value-scale,
  the same cost as any exact distinct. Renderings are injective per type
  (floats use their 64-bit pattern in hex), so the count equals DuckDB's
  ``count(DISTINCT col)``; caveat: -0.0 and 0.0 have distinct bit patterns
  but compare equal in SQL.
- ``approx=True`` replaces that exchange with per-batch KMV partials
  (k smallest 64-bit value hashes per column, merged driver-side —
  mergeable, bounded k·n_cols memory): the scale path when exact
  per-column distinct is not worth a value shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_OFFSET = 1 << 63  # int64 → unsigned, so zero-padded decimal keys order


def _int_key(v: int) -> str:
    return format(v + _OFFSET, "020d")


def _key_to_int(k: str) -> int:
    return int(k) - _OFFSET


_SIGN = np.uint64(1 << 63)
_POS_NAN = np.uint64(0x7FF8000000000000)


def _float_sortable(v: np.ndarray) -> np.ndarray:
    """float64 → uint64 whose unsigned order is the IEEE total order
    (negatives complemented, non-negatives sign-bit-flipped). NaNs first
    canonicalize to the positive pattern so every NaN — quiet, signalling,
    negative — keys GREATER than +inf, matching DuckDB min/max."""
    u = v.view(np.uint64)
    u = np.where(np.isnan(v), _POS_NAN, u)
    return np.where(u >> np.uint64(63), ~u, u | _SIGN)


def _key_to_float(k: str) -> float:
    u = np.uint64(int(k, 16))
    u = np.uint64(u ^ _SIGN) if bool(u >> np.uint64(63)) else np.uint64(~u)
    return float(u.view(np.float64))


def _col_reprs(arr: pa.ChunkedArray) -> np.ndarray:
    """Injective string renderings of the NON-NULL values (distinct-count
    carrier). Distinct renderings ↔ distinct values per type."""
    arr = arr.combine_chunks()
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_floating(t):
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        u = v.view(np.uint64)
        return np.char.mod("%016x", u.astype(object)).astype(object)
    if pa.types.is_timestamp(t) or pa.types.is_integer(t):
        v = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
        return v.astype(str).astype(object)
    return np.asarray(pc.cast(arr, pa.string()).to_numpy(zero_copy_only=False))


def profile_table(
    ds,
    *,
    columns: list[str] | None = None,
    approx: bool = False,
    kmv_k: int = 8192,
    num_partitions: int | None = None,
) -> pa.Table:
    """Profile every (or the given) column of ``ds``; returns a pa.Table
    ``(col, n_rows, n_null, n_distinct, min_repr, max_repr)`` sorted by
    column name. See the module docstring for the distributed shape."""
    from ray.data.aggregate import Max, Min, Sum

    schema = ds.schema()
    cols = list(columns) if columns else list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def stat_partial(b: pa.Table) -> pa.Table:
        out = {"col": [], "n": [], "n_null": [], "min_key": [], "max_key": []}
        for c in cols:
            arr = b[c].combine_chunks()
            n = len(arr)
            n_null = arr.null_count
            t = types[c]
            mn = mx = None
            if n > n_null:
                if pa.types.is_integer(t) or pa.types.is_timestamp(t):
                    iarr = pc.cast(arr, pa.int64())
                    mm = pc.min_max(iarr)
                    mn = _int_key(mm["min"].as_py())
                    mx = _int_key(mm["max"].as_py())
                elif pa.types.is_floating(t):
                    v = arr.drop_null().to_numpy(zero_copy_only=False)
                    us = _float_sortable(v.astype(np.float64))
                    mn = format(int(us.min()), "016x")
                    mx = format(int(us.max()), "016x")
                elif pa.types.is_string(t) or pa.types.is_large_string(t):
                    mm = pc.min_max(arr)
                    mn = mm["min"].as_py()
                    mx = mm["max"].as_py()
            out["col"].append(c)
            out["n"].append(n)
            out["n_null"].append(n_null)
            out["min_key"].append(mn)
            out["max_key"].append(mx)
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "min_key": pa.array(out["min_key"], pa.string()),
                "max_key": pa.array(out["max_key"], pa.string()),
            }
        )

    proj = ds.select_columns(cols)
    stats = (
        proj.map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
            Min("min_key", alias_name="min_key"),
            Max("max_key", alias_name="max_key"),
        )
        .to_pandas()  # n_cols rows
    )

    if approx:
        kmin: dict[str, np.ndarray] = {c: np.empty(0, np.uint64) for c in cols}

        def kmv_partial(b: pa.Table) -> pa.Table:
            rows_c, rows_blob = [], []
            for c in cols:
                reprs = np.unique(_col_reprs(b[c]))
                h = pd.util.hash_array(
                    reprs.astype(object), hash_key="rayparse-profile"
                ).astype(np.uint64)
                h = np.sort(h)[:kmv_k]
                rows_c.append(c)
                rows_blob.append(h.astype("<u8").tobytes())
            return pa.table(
                {"col": pa.array(rows_c, pa.string()), "blob": pa.array(rows_blob, pa.binary())}
            )

        parts = proj.map_batches(
            kmv_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # n_blocks × n_cols small rows
        for c, blob in zip(parts["col"], parts["blob"]):
            merged = np.concatenate(
                [kmin[c], np.frombuffer(blob, dtype="<u8")]
            )
            kmin[c] = np.unique(merged)[:kmv_k]  # unique() is sorted already
        n_distinct = {}
        for c, h in kmin.items():
            if len(h) < kmv_k:
                n_distinct[c] = len(h)  # exact below k
            else:
                # same estimator as sketch.approx_distinct: (k-1) / kth_norm
                kth_norm = float(h[kmv_k - 1]) / float(2**64 - 1)
                n_distinct[c] = int(round((kmv_k - 1) / kth_norm))
        stats["n_distinct"] = stats["col"].map(n_distinct).astype(np.int64)
    else:
        from ray.data.aggregate import Count

        def distinct_partial(b: pa.Table) -> pa.Table:
            cs, vs = [], []
            for c in cols:
                u = np.unique(_col_reprs(b[c]))
                cs.extend([c] * len(u))
                vs.extend(u.tolist())
            return pa.table(
                {"col": pa.array(cs, pa.string()), "v": pa.array(vs, pa.string())}
            )

        dist = (
            proj.map_batches(
                distinct_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["col", "v"], num_partitions=num_partitions)
            .aggregate(Count(alias_name="_c"))
            .drop_columns(["_c", "v"])
            .groupby("col", num_partitions=num_partitions)
            .aggregate(Count(alias_name="n_distinct"))
            .to_pandas()
        )
        stats = stats.merge(dist, on="col", how="left")
        stats["n_distinct"] = stats["n_distinct"].fillna(0).astype(np.int64)

    def render(c: str, key):
        if key is None or (isinstance(key, float) and np.isnan(key)):
            return None
        t = types[c]
        if pa.types.is_integer(t) or pa.types.is_timestamp(t):
            return str(_key_to_int(key))
        if pa.types.is_floating(t):
            return repr(_key_to_float(key))
        return key

    stats["min_repr"] = [render(c, k) for c, k in zip(stats["col"], stats["min_key"])]
    stats["max_repr"] = [render(c, k) for c, k in zip(stats["col"], stats["max_key"])]
    stats = stats.sort_values("col").reset_index(drop=True)
    return pa.table(
        {
            "col": pa.array(stats["col"], pa.string()),
            "n_rows": pa.array(stats["n_rows"].astype(np.int64)),
            "n_null": pa.array(stats["n_null"].astype(np.int64)),
            "n_distinct": pa.array(stats["n_distinct"].astype(np.int64)),
            "min_repr": pa.array(stats["min_repr"], pa.string()),
            "max_repr": pa.array(stats["max_repr"], pa.string()),
        }
    )
