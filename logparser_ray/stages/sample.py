"""Deterministic bounded sampling WITHOUT a global sort.

``sample_min_k_by_hash`` draws the ``n`` rows whose keyed hash of
``key_col`` is smallest — exactly the sample a global
``sort(hash).limit(n)`` would return — but computes it as a per-batch
k-smallest combiner (each block emits at most ``n`` rows) plus a tiny
driver-side merge over ``≤ n × num_blocks`` candidate rows. No all-to-all
exchange ever runs: sampling 5k rows out of 10¹² costs one streaming pass,
not a corpus-wide sort (the round-2 scale-killer this replaces).

The sample is a pure function of row VALUES (hash of ``key_col``,
tie-broken on the key itself), independent of block structure and
partitioning — stable across cluster sizes and re-runs, which is what the
deterministic miner fits (LogSig / LKE) and the IVF k-means quantizer fit
require.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _row_hashes(vals: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic uint64 hash per value; the seed keys the draw."""
    if vals.dtype == object:
        return pd.util.hash_array(vals, hash_key=f"{seed:016d}").astype(np.uint64)
    h = pd.util.hash_array(np.ascontiguousarray(vals))
    mix = np.uint64((0x9E3779B97F4A7C15 * seed) & 0xFFFFFFFFFFFFFFFF)
    return (h + mix).astype(np.uint64)


def sample_min_k_by_hash(
    ds,
    *,
    cols: list[str],
    key_col: str,
    n: int,
    seed: int = 0,
    distinct: bool = False,
    as_arrow: bool = False,
):
    """``n`` rows of ``ds[cols]`` with the smallest keyed hash of
    ``key_col``; ties broken by the key value. Returns a pandas frame
    (bounded: ``n`` rows) ordered by (hash, key) ascending, or the same
    rows as a ``pa.Table`` with ``as_arrow=True`` — the Arrow path never
    round-trips payload columns (e.g. ``list<float>`` embeddings) through
    Python objects, so matrix consumers can flatten+reshape zero-copy.

    ``distinct=True`` samples ``n`` DISTINCT key values instead of rows
    (requires ``cols == [key_col]``) and adds a ``_n`` occurrence-count
    column. Duplicate-heavy corpora break the row sampler for template
    mining: every occurrence of a text shares one hash, so whole duplicate
    groups enter or leave the sample together and a 1k-row draw can carry
    a couple dozen distinct shapes (measured: the 2k-row transcripts
    fixture sampled at 1k covered 24 of 42 post-rex shapes, silently
    dropping every ``Session started`` row — LKE/LogSig then can't emit
    those templates at all). Distinct-mode coverage is the fix and stays
    one streaming pass; ``_n`` is exact for keys that survive every
    block's local top-k (any key with an occurrence in each block) and a
    lower bound otherwise."""

    if distinct and cols != [key_col]:
        raise ValueError("distinct sampling requires cols == [key_col]")

    def partial_min_k(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        # Null keys are excluded from the draw: they carry no signal for the
        # fits this feeds (miner texts / embedding ids) and None breaks the
        # (hash, key) lexsort tie-break against str/int keys.
        t = t.filter(pc.is_valid(t[key_col]))
        if distinct:
            t = (
                t.group_by(cols)
                .aggregate([([], "count_all")])
                .rename_columns([*cols, "_n"])
            )
        vals = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = _row_hashes(vals, seed)
        # stable local k-smallest by (hash, key): sorts THIS block only —
        # the k-boundary tie-break must match the global merge's ordering
        order = np.lexsort((vals, h))[:n]
        out = t.take(pa.array(order))
        return out.append_column("_h", pa.array(h[order]))

    import ray

    # Bounded driver-side merge (≤ n × num_blocks candidate rows), done in
    # Arrow so payload columns stay columnar end to end.
    refs = (
        ds.select_columns(cols)
        .map_batches(partial_min_k, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    tables = [t for t in ray.get(refs) if t.num_rows] if refs else []
    if not tables:
        empty = pa.table(
            {c: pa.array([], ds.schema().field(c).type) for c in cols}
        )
        if distinct:
            empty = empty.append_column("_n", pa.array([], pa.int64()))
        return empty if as_arrow else empty.to_pandas()
    parts = pa.concat_tables(tables, promote_options="default")
    if distinct:
        # same key may survive several blocks' local top-k: sum occurrence
        # counts across blocks (group keys share one hash by construction)
        g = parts.group_by(["_h", key_col]).aggregate([("_n", "sum")])
        parts = g.rename_columns(
            ["_n" if c == "_n_sum" else c for c in g.column_names]
        )
    merged = parts.sort_by(
        [("_h", "ascending"), (key_col, "ascending")]
    ).slice(0, n)
    out_cols = [*cols, "_n"] if distinct else cols
    out = merged.select(out_cols)
    return out if as_arrow else out.to_pandas()


def sample_by_rates(
    ds,
    *,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
):
    """Deterministic per-group mixture sampling (Pile-style source
    reweighting, Gao et al. 2020): keep a row iff the first 8 hex chars
    of ``md5(key)`` fall below the group's rate threshold. Comparing HEX
    STRINGS is equivalent to comparing the 32-bit values (hex digits are
    lexicographically ordered), so the draw is bit-reproducible in SQL:
    ``substr(md5(key), 1, 8) < '<threshold-hex>'``.

    Zero shuffle — one streaming ``map_batches`` filter pass; the rate
    table is closure-captured (it is mixture-weights-sized, i.e. tiny).
    Unknown groups use ``default_rate``; null keys are dropped (their
    draw is undefined, matching SQL where ``md5(NULL)`` is NULL).
    Returns a Dataset of the kept rows (all input columns).
    """
    import hashlib

    thresholds = {
        g: format(min(int(r * (1 << 32)), (1 << 32) - 1), "08x")
        for g, r in rates.items()
    }
    default_thr = format(
        min(int(default_rate * (1 << 32)), (1 << 32) - 1), "08x"
    )

    def keep_batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))
        keys = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        groups = b[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        prefs = np.fromiter(
            (hashlib.md5(k.encode("utf-8")).hexdigest()[:8] for k in keys),
            dtype=object,
            count=len(keys),
        )
        thrs = np.fromiter(
            (thresholds.get(g, default_thr) for g in groups),
            dtype=object,
            count=len(groups),
        )
        return b.filter(pa.array(prefs < thrs))

    return ds.map_batches(keep_batch, batch_format="pyarrow", zero_copy_batch=True)


def sample_stratified(
    ds,
    *,
    group_col: str,
    key_col: str,
    tiebreak_col: str,
    n_per_group: int,
) -> pd.DataFrame:
    """Deterministic stratified sample: the ``n_per_group`` rows of each
    ``group_col`` stratum with the smallest ``(md5(key), tiebreak)`` —
    the balanced per-language / per-sink draw a training-data pipeline
    uses to build evaluation or annotation subsets.

    The md5 hex digest is the ordering key ON PURPOSE: it is the one
    deterministic "random" order every engine reproduces bit-for-bit
    (DuckDB ``md5(text)`` emits the identical lowercase hex), so the draw
    is SQL-oracle-able via ``row_number() OVER (PARTITION BY g ORDER BY
    md5(key), tiebreak)`` — unlike ``pd.util.hash_array``, whose seed
    never leaves Python. md5 is computed per row by design (no vectorized
    form exists in any engine; the C-backed ``hashlib`` call is the
    kernel, not a Python-loop substitute for one), inside ``map_batches``
    across the cluster.

    Shape: per-block partials keep each stratum's local ``n_per_group``
    smallest, so the driver merge sees ≤ ``n_per_group × n_strata ×
    n_blocks`` candidate rows and no all-to-all runs. Assumes the stratum
    count is bounded (languages, sinks, sources — ≤ ~10⁵); for unbounded
    strata route through a keyed repartition first. Null keys are
    excluded from the draw (SQL ``md5(NULL)`` is NULL and sorts last —
    never into a bounded sample).

    Returns ``(group_col, tiebreak_col)`` sorted ascending.
    """
    import hashlib

    import ray

    cols = [group_col, key_col, tiebreak_col]

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(cols).filter(pc.is_valid(b[key_col]))
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        digs = np.fromiter(
            (hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys),
            dtype=object,
            count=len(keys),
        )
        df = pd.DataFrame(
            {
                group_col: t[group_col].to_numpy(zero_copy_only=False),
                "_md5": digs,
                tiebreak_col: t[tiebreak_col].to_numpy(zero_copy_only=False),
            }
        )
        kept = (
            df.sort_values([group_col, "_md5", tiebreak_col], kind="mergesort")
            .groupby(group_col, sort=False)
            .head(n_per_group)
        )
        return pa.Table.from_pandas(kept, preserve_index=False)

    refs = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    tables = [t for t in ray.get(refs) if t.num_rows] if refs else []
    if not tables:
        return pd.DataFrame(columns=[group_col, tiebreak_col])
    cand = pa.concat_tables(tables, promote_options="default").to_pandas()
    merged = (
        cand.sort_values([group_col, "_md5", tiebreak_col], kind="mergesort")
        .groupby(group_col, sort=False)
        .head(n_per_group)
    )
    return (
        merged.drop(columns=["_md5"])
        .sort_values([group_col, tiebreak_col], kind="mergesort")
        .reset_index(drop=True)
    )


def split_by_hash(
    ds,
    *,
    key_col: str,
    ratios: "dict[str, float]",
    salt: str = "",
    out_col: str = "split",
):
    """Deterministic train/val/test splitting: each row's split label is a
    pure function of ``md5(key || salt)`` — reproducible across runs,
    engines, cluster sizes and block layouts, and ZERO shuffle (one
    streaming ``map_batches`` pass appending ``out_col``).

    ``ratios`` assigns labels by cumulative md5-hex-prefix thresholds in
    dict (insertion) order; they should sum to 1.0 (the LAST label absorbs
    any rounding remainder and all null keys — exactly SQL's ``ELSE``).
    SQL parity: ``CASE WHEN substr(md5(key || salt), 1, 8) < '<t1>' THEN
    l1 WHEN ... ELSE l_last END``. ``salt`` re-draws the whole split
    (e.g. per experiment) without touching the data.
    """
    import hashlib

    labels = list(ratios)
    if len(labels) < 2:
        raise ValueError("need at least two split labels")
    for lbl, r in ratios.items():
        if not r > 0:
            raise ValueError(f"split ratio for {lbl!r} must be > 0, got {r}")
    if sum(ratios.values()) > 1.0 + 1e-9:
        raise ValueError(f"split ratios sum to {sum(ratios.values())} > 1")
    cum = 0.0
    thrs: list[str] = []
    for lbl in labels[:-1]:
        cum += ratios[lbl]
        thrs.append(format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x"))
    assert list(thrs) == sorted(thrs), "thresholds must be monotonic"
    thr_arr = np.array(thrs, dtype=object)
    label_arr = np.array(labels, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        keys = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        null_mask = np.array([k is None for k in keys], dtype=bool)
        # md5 is per-row by necessity (SQL-parity digest — same convention
        # as sample_by_rates); the bucket lookup is ONE vectorized
        # searchsorted over the batch, not a per-row dispatch (review r4)
        prefs = np.array(
            [
                ""
                if k is None
                else hashlib.md5((k + salt).encode("utf-8")).hexdigest()[:8]
                for k in keys
            ],
            dtype=object,
        )
        # first threshold strictly above each draw = its label bucket
        idx = np.searchsorted(thr_arr, prefs, side="right")
        idx[null_mask] = len(labels) - 1  # SQL ELSE: null draw → last label
        return b.append_column(out_col, pa.array(label_arr[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
