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
import pyarrow.compute as pc

# dims at or under this (estimated) size broadcast to every worker; above it
# a per-worker copy is real memory pressure (VERDICT r02 #4: `customer` grows
# with scale factor — multi-GB per worker at 100 TB) and attach_dim falls
# back to a distributed hash join instead
BROADCAST_MAX_BYTES = 64 << 20


def join_num_partitions(n_rows: int | None = None) -> int:
    """Hash-join partition count scaled to input size and cluster CPUs
    (ADVICE r02: a hardcoded 8 under-partitions at larger scale factors).

    Each join partition is one aggregator actor with ~0.4 s measured
    spin-up (r4, this box), so small inputs want the FEWEST partitions
    that keep per-partition memory bounded — the former CPU/4 base put
    revenue_by_nation at 8 partitions and its wall at 5.2 s where 4
    partitions run 3.7 s. Big inputs grow with rows (~1 M fact rows per
    partition, cap 512) so no partition is ever unbounded."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    base = min(8, max(2, cpus // 8))
    if n_rows is None:
        return base
    return max(base, min(512, n_rows // 1_000_000 + 2))


def collect_dim_table(ds) -> pa.Table:
    """Collect a (dimension-sized) Dataset into ONE Arrow table for
    broadcast. Drops empty blocks — hash-aggregated dims emit zero-column
    empty blocks that ``concat_tables`` rejects — and returns a
    schema-typed empty table when every block is empty, so callers never
    crash on an empty dim/vocab/prior."""
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if parts:
        return pa.concat_tables(parts)
    sch = ds.schema(fetch_if_missing=False)
    if sch is None:  # fully-empty lineage can lose its schema entirely
        return pa.table({})
    return pa.table({n: pa.array([], t) for n, t in zip(sch.names, sch.types)})


def attach_dim(
    fact,
    dim,
    *,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    dim_bytes_hint: int | None = None,
    n_fact_rows: int | None = None,
):
    """Left-attach ``dim_cols`` from ``dim`` onto ``fact`` where
    ``fact[fact_key] == dim[dim_key]`` — the dimension-join operator
    (SURVEY.md J3) with an automatic broadcast-size guard.

    Small dims (estimated ≤ ``broadcast_max_bytes``) collect once on the
    driver, broadcast via ``ray.put``, and map per batch with
    ``pc.index_in`` + ``take`` — a vectorized dictionary lookup, no shuffle,
    left-join semantics (missing keys → nulls). Dims over the threshold
    fall back to a distributed ``Dataset.join`` (left_outer) sized by
    ``join_num_partitions`` — same semantics, no per-worker dim copy.

    ``dim`` is a Dataset; pass ``dim_bytes_hint`` when it is a DERIVED
    dataset (``size_bytes()`` on a lazy lineage may execute it). Requires
    unique ``dim_key`` values (true dimension), else the broadcast path
    takes the first match while the join path duplicates rows.
    """
    import ray

    proj = dim.select_columns([dim_key, *dim_cols])
    est = dim_bytes_hint
    if est is None:
        try:
            est = proj.size_bytes()
        except Exception:
            est = None
    # Unknown size (estimation failed) is treated as OVER the threshold:
    # the distributed join degrades gracefully for small dims, while a
    # blind broadcast of a large one OOMs the driver and every worker.
    if est is None or est > broadcast_max_bytes:
        joined = fact.join(
            proj,
            "left_outer",
            num_partitions=join_num_partitions(n_fact_rows),
            on=(fact_key,),
            right_on=(dim_key,),
        )
        # Ray's join already omits the right key column, so both paths emit
        # the same schema: fact columns + dim_cols
        return joined

    tbl = collect_dim_table(proj)
    ref = ray.put(tbl)

    def lookup(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = ray.get(ref)
        idx = pc.index_in(b[fact_key], value_set=d[dim_key].combine_chunks())
        for c in dim_cols:
            b = b.append_column(c, d[c].combine_chunks().take(idx))
        return b

    return fact.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_naive(
    left,
    right,
    *,
    on: str,
    by: str,
    tiebreak: str,
    right_cols: list[str],
    suffix: str = "_r",
):
    """Reference implementation of the strict-backward as-of join: one
    ``groupby(by).map_groups(pandas)`` — a whole key lands on one worker,
    so it is the SKEW-UNSAFE shape. Kept only as the equality oracle for
    ``asof_join`` (tests) and for tiny inputs; production paths use the
    bucketed operator below."""
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


def asof_join(
    left,
    right,
    *,
    on: str,
    by: str,
    tiebreak: str,
    right_cols: list[str],
    suffix: str = "_r",
    bucket_width: int | None = None,
    n_rows: int | None = None,
):
    """Strict-backward as-of join of two Datasets, hot-key-safe; left rows
    with no prior right row get nulls in the ``right_cols`` (renamed with
    ``suffix``). Semantics identical to ``asof_join_naive``
    (equality-tested): for every left row, the latest right row STRICTLY
    before it in the unique ``(on, tiebreak)`` total order within ``by``.

    VERDICT r03 #3 reroute: instead of shuffling whole keys to single
    workers, phase 1 exchanges on ``(by, time_bucket(on))`` and resolves
    every left row that has an in-bucket prior right row — one vectorized
    running-maximum scan per block, no per-group Python. Only the
    UNRESOLVED left rows (no in-bucket prior right) plus ONE carrier per
    (by, bucket) — the bucket's last right row, the only right row a later
    bucket can match — go through the second exchange keyed on ``by``.
    There, every carrier is strictly before every row of later buckets, so
    a plain forward-fill over the per-key sorted stream is exact (no shift:
    an unresolved left's own bucket contributes no carrier before it, by
    definition of unresolved). Phase-2 volume is bounded by
    match-sparse left rows + one row per (by, bucket), not by key heat.
    ``bucket_width`` is in raw ``on`` units (µs for timestamps); default
    1 day for timestamps, 2³² otherwise.
    """
    from logparser_ray.stages.exchange import hash_shuffle
    from logparser_ray.stages.windows import _exchange_blocks

    n_blocks = _exchange_blocks(n_rows)
    n_blocks2 = max(2, n_blocks // 4)
    r_keep = list(dict.fromkeys([by, on, tiebreak] + list(right_cols)))
    out_suffixed = [f"{c}{suffix}" for c in right_cols]

    l_tag = left.map_batches(
        lambda b: b.append_column("_side", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    r_tag = right.select_columns(r_keep).map_batches(
        lambda b: b.append_column("_side", pa.array(np.ones(len(b), np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    both = l_tag.union(r_tag)

    if bucket_width is None:
        on_type = dict(zip(left.schema().names, left.schema().types))[on]
        bucket_width = (
            86_400 * 1_000_000 if pa.types.is_timestamp(on_type) else 1 << 32
        )

    def add_bucket(b: pa.Table) -> pa.Table:
        v = pc.cast(b[on].combine_chunks(), pa.int64()).to_numpy()
        return b.append_column("_bucket", pa.array(v // bucket_width))

    def resolve_local(b: pa.Table) -> pa.Table:
        """Sort one (by, bucket)-complete block; emit every row tagged
        ``_fix``: 0 = resolved left, 1 = unresolved left, 2 = carrier."""
        if b.num_rows == 0:
            sch = b.schema
            for c, oc in zip(right_cols, out_suffixed):
                sch = sch.append(pa.field(oc, b.schema.field(c).type))
            sch = sch.append(pa.field("_fix", pa.int8()))
            return sch.empty_table()
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (by, "ascending"),
                    ("_bucket", "ascending"),
                    (on, "ascending"),
                    (tiebreak, "ascending"),
                ],
            )
        )
        n = t.num_rows
        kn = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        bk = t["_bucket"].combine_chunks().to_numpy()
        is_r = t["_side"].combine_chunks().to_numpy().astype(bool)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (kn[1:] != kn[:-1]) | (bk[1:] != bk[:-1])
        grp_id = np.cumsum(new_grp) - 1
        grp_first = np.flatnonzero(new_grp)
        idx = np.arange(n)
        # running max index of right rows, reset per group: subtracting a
        # huge per-group offset keeps the accumulate monotone within groups
        barrier = grp_first[grp_id].astype(np.int64) * (n + 1)
        run = np.maximum.accumulate(np.where(is_r, idx + barrier, -1))
        last_r_at = run - barrier  # ≥ group_first iff an in-group right ≤ i
        # strictly-before = state at the previous row of the same group
        prev_last = np.full(n, -1, dtype=np.int64)
        prev_last[1:] = last_r_at[:-1]
        prev_last[new_grp] = -1
        resolved = (~is_r) & (prev_last >= grp_first[grp_id])
        match_np = np.where(resolved, prev_last, 0)
        valid = pa.array(resolved)
        for c, oc in zip(right_cols, out_suffixed):
            vals = t[c].combine_chunks().take(pa.array(match_np))
            # null out unresolved positions
            vals = pc.if_else(valid, vals, pa.scalar(None, type=vals.type))
            t = t.append_column(oc, vals)
        # carrier = each group's LAST right row: the right row the group-end
        # running maximum points at
        grp_end = np.append(grp_first[1:] - 1, n - 1)
        grp_last_r = is_r & (last_r_at[grp_end[grp_id]] == idx)
        fix = np.full(n, -1, dtype=np.int8)
        fix[resolved] = 0
        fix[(~is_r) & ~resolved] = 1
        fix[grp_last_r] = 2
        t = t.append_column("_fix", pa.array(fix))
        return t.filter(pc.greater_equal(t["_fix"], 0))

    def fix_stream(b: pa.Table) -> pa.Table:
        """Per-key sorted stream of unresolved lefts + carriers: forward-
        fill carrier values onto the lefts (carriers are strictly before —
        see the operator docstring)."""
        if b.num_rows == 0:
            return b
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (by, "ascending"),
                    (on, "ascending"),
                    (tiebreak, "ascending"),
                ],
            )
        )
        n = t.num_rows
        kn = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        is_c = t["_fix"].combine_chunks().to_numpy() == 2
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = kn[1:] != kn[:-1]
        key_first = np.flatnonzero(new_key)
        key_id = np.cumsum(new_key) - 1
        idx = np.arange(n)
        barrier = key_first[key_id].astype(np.int64) * (n + 1)
        run = np.maximum.accumulate(np.where(is_c, idx + barrier, -1))
        last_c = run - barrier
        ok = last_c >= key_first[key_id]
        take_np = np.where(ok, last_c, 0)
        valid = pa.array(ok & ~is_c)
        for c, oc in zip(right_cols, out_suffixed):
            vals = t[c].combine_chunks().take(pa.array(take_np))
            vals = pc.if_else(valid, vals, pa.scalar(None, type=vals.type))
            col_i = t.schema.get_field_index(oc)
            t = t.set_column(col_i, oc, vals)
        return t.filter(pc.equal(t["_fix"], 1))

    drop_internal = ["_side", "_bucket", "_fix"]
    with hash_shuffle(both):
        tagged = (
            both.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=[by, "_bucket"])
            .map_batches(resolve_local, batch_format="pyarrow", zero_copy_batch=True)
            # plan forks (resolved vs fix stream): pin the exchange once
            .materialize()
        )
        resolved = tagged.filter(expr="_fix == 0").drop_columns(drop_internal)
        fixed = (
            tagged.filter(expr="_fix > 0")
            .repartition(num_blocks=n_blocks2, keys=[by])
            .map_batches(fix_stream, batch_format="pyarrow", zero_copy_batch=True)
            .drop_columns(drop_internal)
        )
        return resolved.union(fixed).materialize()


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
