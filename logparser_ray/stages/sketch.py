"""Mergeable streaming sketches (build-brief custom operators): heavy
hitters and approximate distinct counts over unbounded key streams.

Both follow the engine's canonical combine shape — a vectorized per-batch
partial inside ``map_batches`` emitting a TINY summary table, merged on the
driver (or a tree at 10⁶ blocks) — so the full stream never shuffles:

- **SpaceSaving heavy hitters** (Metwally, Agrawal, El Abbadi, ICDT 2005):
  per-batch exact counts collapse to the batch's top-(k·slack) entries plus
  the batch's maximum evicted count as the error bound. Merged sketch
  guarantees: every key with true count > N/k is present, and each reported
  count is within [true, true + err].
- **KMV distinct-count** (Bar-Yossef et al., RANDOM 2002 "k minimum
  values"): per-batch k smallest 64-bit key hashes; union-merge keeps the k
  smallest overall; estimate = (k − 1) / max_kth_normalized. Mergeable by
  construction; relative error ~ 1/√k.

The reference has no sketches (single-machine exact counts); these are
engine extras for the 100 TB regime where exact global top-k/distinct of a
high-cardinality key would shuffle the world.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# SpaceSaving heavy hitters
# ---------------------------------------------------------------------------


def heavy_hitters(ds, col: str, k: int = 20, slack: int = 8) -> pd.DataFrame:
    """Approximate top-``k`` values of ``col`` with per-key error bounds.

    Each batch keeps its exact top-``k·slack`` counts plus one META row
    carrying the batch's eviction ceiling (the largest evicted count — an
    upper bound on any absent key's in-batch count). Merge:

    - ``count_min(v)`` = Σ kept counts — never overcounts.
    - ``count_max(v)`` = count_min + Σ ceilings of batches where ``v`` was
      NOT kept — never undercounts.

    So ``count_min ≤ true ≤ count_max`` for every reported key, and any key
    whose true count exceeds the total eviction ceiling is guaranteed to be
    reported (it must have been kept somewhere). Summary size per batch is
    ``k·slack + 1`` rows — the stream itself never shuffles.

    Nulls are a first-class key carried as an ``is_null`` FLAG column (not a
    sentinel string — ADVICE r02: ``"<null>"`` merged with a genuine
    ``"<null>"`` data value); in the output the null key has ``is_null=True``
    and ``v=""``. The final top-``k`` ranks by ``count_min`` (guaranteed
    counts — ranking by ``count_max`` let rarely-kept keys with wide error
    windows displace true heavy hitters); ``count_max`` remains in the
    output so callers can see each key's error window.
    """
    cap = k * slack

    def partial(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks().cast(pa.string())
        t = pa.table({"v": pc.fill_null(arr, ""), "is_null": pc.is_null(arr)})
        counts = (
            t.group_by(["v", "is_null"])
            .aggregate([([], "count_all")])
            .rename_columns(["v", "is_null", "n"])
            .to_pandas()
            # is_null participates in the tie-break: a genuine "" key and
            # the null key share v="" and can tie on n — the cap boundary
            # must not depend on incidental row order
            .sort_values(["n", "v", "is_null"], ascending=[False, True, True])
        )
        kept = counts.head(cap)
        err = int(counts["n"].iloc[cap:].max()) if len(counts) > cap else 0
        return pa.table(
            {
                "v": pa.array(list(kept["v"]) + [""], pa.string()),
                "is_null": pa.array(list(kept["is_null"]) + [False]),
                "n": pa.array(
                    np.concatenate([kept["n"].to_numpy(np.int64), [0]])
                ),
                "err": pa.array(np.full(len(kept) + 1, err, np.int64)),
                "is_meta": pa.array([False] * len(kept) + [True]),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    meta = parts[parts["is_meta"]]
    total_err = int(meta["err"].sum())
    keys = parts[~parts["is_meta"]]
    merged = keys.groupby(["v", "is_null"], as_index=False).agg(
        count_min=("n", "sum"), err_seen=("err", "sum")
    )
    merged["count_max"] = merged["count_min"] + (total_err - merged["err_seen"])
    merged = merged.sort_values(
        ["count_min", "v", "is_null"], ascending=[False, True, True]
    ).head(k)
    return merged[["v", "is_null", "count_min", "count_max"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# KMV distinct count
# ---------------------------------------------------------------------------


def approx_distinct(ds, col: str, k: int = 1024) -> dict:
    """KMV estimate of ``count(DISTINCT col)`` with ~1/√k relative error.

    Returns ``{"estimate": float, "k": int, "exact_below_k": bool}`` —
    when fewer than ``k`` distinct hashes exist the count is exact.
    """

    def partial(b: pa.Table) -> pa.Table:
        # drop nulls to match SQL COUNT(DISTINCT col) semantics (nulls are
        # not a distinct value; hash_array would otherwise count one)
        arr = b[col].combine_chunks().drop_null()
        vals = arr.cast(pa.string()).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals, hash_key="rayparse-kmv-000")
        u = np.unique(h)  # sorted ascending
        return pa.table({"h": pa.array(u[:k].view(np.int64))})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    u = np.unique(parts["h"].to_numpy().view(np.uint64))
    if len(u) < k:
        return {"estimate": float(len(u)), "k": k, "exact_below_k": True}
    kth = u[k - 1]
    est = (k - 1) / (float(kth) / float(2**64 - 1))
    return {"estimate": float(est), "k": k, "exact_below_k": False}


# ---------------------------------------------------------------------------
# Mergeable binned-histogram quantiles
# ---------------------------------------------------------------------------


def binned_quantiles(
    ds, col: str, *, width: float, qs: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> pd.DataFrame:
    """Streaming rank statistics via a fixed-width histogram — the
    mergeable quantile structure whose semantics every engine reproduces
    bit-for-bit (unlike sampling sketches such as KLL, whose compaction
    order is engine-specific and can never be SQL-oracled).

    Per batch: ``floor(value / width)`` bincounts (nulls excluded, SQL
    aggregate semantics) — a tiny ``(bin, n)`` partial per block, so the
    stream never shuffles and the driver merge is bounded by
    ``n_bins × n_blocks`` rows (bins are bounded by domain/width; pick
    ``width`` so the histogram stays small — resolution IS the memory
    knob, exactly as in any production histogram sketch). The quantile
    ``q`` resolves to the smallest bin whose cumulative count reaches
    ``ceil(q × n)`` — the bin containing the exact rank-``ceil(q·n)``
    element, i.e. the true discrete quantile at bin resolution.

    Returns one row per q: ``(q, bin, n_le, n_total)`` with ``q`` as its
    Python literal string (matches the SQL VALUES literal), ``bin`` the
    quantile bin index, ``n_le`` the cumulative count through that bin.
    All integers — deterministically comparable across engines.
    """
    import math

    def partial(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks().drop_null()
        v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        bins = np.floor(v / width).astype(np.int64)
        ub, cnt = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(ub), "n": pa.array(cnt.astype(np.int64))}
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    agg = (
        parts.groupby("bin", as_index=False)["n"].sum().sort_values("bin")
        if len(parts)
        else pd.DataFrame({"bin": [], "n": []})
    )
    tot = int(agg["n"].sum()) if len(agg) else 0
    cum = agg["n"].cumsum().to_numpy(np.int64) if len(agg) else np.array([], np.int64)
    rows = []
    for q in qs:
        if tot == 0:
            rows.append({"q": f"{q}", "bin": None, "n_le": 0, "n_total": 0})
            continue
        # float rank identical to SQL ceil(q * n): both compute q·n in
        # float64 and ceil — same bits, same bin on every engine
        rank = math.ceil(q * tot)
        idx = int(np.searchsorted(cum, rank, side="left"))
        rows.append(
            {
                "q": f"{q}",
                "bin": int(agg["bin"].iloc[idx]),
                "n_le": int(cum[idx]),
                "n_total": tot,
            }
        )
    return pd.DataFrame(rows)


def binned_quantiles_by(
    ds,
    col: str,
    *,
    by: str,
    width: float,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> pd.DataFrame:
    """Per-group binned rank statistics — ``binned_quantiles`` partitioned
    by a (low-cardinality) dimension column: the per-tenant / per-endpoint
    latency-percentile shape.

    Per batch: ``(group, bin)`` bincounts — tiny mergeable partials; ONE
    group×bin-sized Ray aggregation merges them (the exchange moves
    summary rows, never values), and the driver resolves ranks over the
    n_groups × n_bins histogram. ``by`` must be dashboard-dimension
    cardinality (event types, tenants, status codes); a high-cardinality
    key makes the histogram itself data-scale — use the windowed
    operators for that. Rows with a NULL group key or NULL value are
    excluded by contract (the paired SQL oracle filters both). Same
    determinism contract as the global version:
    ``floor(value/width)`` bins, rank ``ceil(q·n_g)`` per group — every
    engine reproduces the integers bit-for-bit.

    Returns one row per (group, q): ``(grp, q, bin, n_le, n_total)``.
    """
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"grp": b[by], "v": b[col]}).drop_null()
        v = t["v"].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        bins = np.floor(v / width).astype(np.int64)
        g = pa.table({"grp": t["grp"], "bin": pa.array(bins)})
        agg = g.group_by(["grp", "bin"]).aggregate([([], "count_all")])
        return agg.rename_columns(["grp", "bin", "n"])

    hist = (
        ds.select_columns([by, col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["grp", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # n_groups × n_bins — summary-scale by contract
    )
    if len(hist) == 0:  # empty/all-null input → empty frame, not a crash
        return pd.DataFrame(
            {"grp": [], "q": [], "bin": [], "n_le": [], "n_total": []}
        )
    hist = hist.sort_values(["grp", "bin"])
    rows = []
    for grp, gdf in hist.groupby("grp", sort=True):
        cum = gdf["n"].cumsum().to_numpy(np.int64)
        tot = int(cum[-1])
        for q in qs:
            rank = math.ceil(q * tot)
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append(
                {
                    "grp": grp,
                    "q": f"{q}",
                    "bin": int(gdf["bin"].iloc[idx]),
                    "n_le": int(cum[idx]),
                    "n_total": tot,
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Exact grouped correlation from integer moments
# ---------------------------------------------------------------------------


def grouped_corr(
    ds,
    keys: "list[str]",
    x_col: str,
    y_col: str,
    *,
    scale: int = 1_000_000,
) -> pd.DataFrame:
    """Pearson correlation per group from EXACT integer moments (public
    shape: the textbook moment identity r = (nΣxy − ΣxΣy) /
    √((nΣx² − (Σx)²)(nΣy² − (Σy)²)), distributed as mergeable partials —
    the same algebra SQL's ``corr()`` uses).

    ``x_col``/``y_col`` must already be int64 (the caller applies the same
    integerization — e.g. cents — that the SQL oracle applies per row).
    Per batch, a vectorized partial computes the five grouped moment sums
    (Σx, Σy, Σx², Σy², Σxy) in int64, auto-chunking rows so no chunk's sum
    can overflow 2⁶²; the summary-sized partials (groups × chunks rows)
    merge on the driver in arbitrary-precision Python ints — the standard
    mergeable-sketch shape, except the "sketch" is exact.

    The float formula then runs on identical exact integers on both sides
    (engine and DuckDB HUGEINT→DOUBLE), so the scaled result
    ``corr = floor(num/sqrt(a·b) · scale + 0.5)`` is bit-deterministic:
    block layout, batch size and merge order cannot move it. Degenerate
    groups (zero variance on either side) return a null.
    """
    import math

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        if n == 0:
            return pa.table(
                {
                    **{k: pa.array([], b[k].type) for k in keys},
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sy": pa.array([], pa.int64()),
                    "sxx": pa.array([], pa.int64()),
                    "syy": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                }
            )
        mx = max(int(np.abs(x).max()), int(np.abs(y).max()), 1)
        # chunking bounds the SUM of products, but each x·x / x·y element
        # must itself fit int64 — past 2³¹ numpy would wrap silently
        if mx >= (1 << 31):
            raise ValueError(
                f"grouped_corr inputs must be |v| < 2^31 (got {mx}); "
                "rescale the integerization (e.g. coarser cents)"
            )
        step = max(1, int((1 << 62) // (mx * mx)))
        outs = []
        for lo in range(0, n, step):
            hi = min(n, lo + step)
            xs, ys = x[lo:hi], y[lo:hi]
            t = pa.table(
                {
                    **{k: b[k].slice(lo, hi - lo) for k in keys},
                    "n": pa.array(np.ones(hi - lo, dtype=np.int64)),
                    "sx": pa.array(xs),
                    "sy": pa.array(ys),
                    "sxx": pa.array(xs * xs),
                    "syy": pa.array(ys * ys),
                    "sxy": pa.array(xs * ys),
                }
            )
            agg = t.group_by(keys).aggregate(
                [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
            )
            outs.append(
                agg.rename_columns(keys + ["n", "sx", "sy", "sxx", "syy", "sxy"])
            )
        return pa.concat_tables(outs)

    parts = ds.select_columns(keys + [x_col, y_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    pdf = parts.to_pandas()  # summary-sized: ≤ groups × chunks rows
    mom = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    # merge in pure-Python ints — pandas groupby().sum() coerces object
    # columns back to int64 and silently overflows exactly where these
    # moments live (Σx² at price-cents scale crosses 2⁶³ in the millions
    # of rows); the partial table is summary-sized so a dict fold is free
    acc: "dict[tuple, list[int]]" = {}
    # name=None → plain tuples: attribute access would silently rename
    # non-identifier key columns (spaces, leading digits) to _1, _2, …
    for vals in pdf[keys + mom].itertuples(index=False, name=None):
        gk = tuple(vals[: len(keys)])
        slot = acc.setdefault(gk, [0] * len(mom))
        for j in range(len(mom)):
            slot[j] += int(vals[len(keys) + j])
    if not acc:
        return pd.DataFrame(columns=keys + ["corr_scaled"])
    merged = pd.DataFrame(
        [dict(zip(keys, gk)) for gk in sorted(acc)],
    )

    out_corr = []
    for gk in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[gk]
        num = n * sxy - sx * sy
        a = n * sxx - sx * sx
        bb = n * syy - sy * sy
        if a <= 0 or bb <= 0:
            out_corr.append(None)
            continue
        # operation order mirrors the SQL oracle exactly:
        # DOUBLE(num) / sqrt(DOUBLE(a) * DOUBLE(b)) * scale + 0.5, floored
        corr = float(num) / math.sqrt(float(a) * float(bb))
        out_corr.append(int(math.floor(corr * scale + 0.5)))
    res = merged[keys].copy()
    res["corr_scaled"] = pd.array(out_corr, dtype="Int64")
    return res
