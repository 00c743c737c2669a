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

from logparser_ray.stages.exchange import hash_shuffle


def _exchange_blocks(n_rows: int | None) -> int:
    """Keyed-exchange block count: CPU-bound by default, but capped by input
    size when the caller passes a row hint — a 100k-row exchange split into
    32 blocks pays ~32 aggregator spin-ups (~4-5 s fixed on this box) to
    move ~3k rows each. ~50k rows per block keeps blocks meaningful; the
    operators are block-structure-exact, so the count never changes results
    (equality tests pin it)."""
    import ray

    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    if n_rows is None:
        return cpus
    return max(2, min(cpus, n_rows // 50_000 + 1))


def lag_lead_bucketed(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_s: int = 86_400,
    n_rows: int | None = None,
):
    """Per-event LAG/LEAD window functions over ``(PARTITION BY user ORDER
    BY ts, id)``, hot-key-safe. Returns a Dataset ``(id_col, user_col,
    prev_id, next_id)`` — exactly SQL's ``lag(id) OVER w`` / ``lead(id)
    OVER w``.

    Same two-exchange decomposition as ``sessionize_bucketed``: phase 1
    shuffles on the finer ``(user, time_bucket)`` key and computes
    lag/lead locally — correct for every row except each bucket's FIRST
    (its lag lives in the previous bucket) and LAST (its lead lives in
    the next). Those edge rows — two per (user, bucket), regardless of
    how hot the user is — go through a second, tiny exchange keyed on
    user alone, where one sorted scan fills the boundary sides: a first
    row's lag is the previous present bucket's last event, a last row's
    lead is the next present bucket's first event. Interior rows never
    move twice, so worker memory stays bounded by one (user, bucket)
    slice while the result equals the single-partition window scan for
    every input (equality-tested against the naive operator).
    """
    import ray

    n_blocks = _exchange_blocks(n_rows)
    n_blocks2 = max(2, n_blocks // 4)
    sch = ds.schema()  # ray.data Schema: parallel names/types lists
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def add_bucket(b: pa.Table) -> pa.Table:
        ep = pc.cast(b[ts_col].combine_chunks(), pa.int64()).to_numpy()  # µs
        return b.append_column("_bucket", pa.array(ep // (bucket_s * 1_000_000)))

    def local_lag_lead(b: pa.Table) -> pa.Table:
        cols = {
            id_col: pa.array([], id_type),
            user_col: pa.array([], b.schema.field(user_col).type),
            "prev_id": pa.array([], id_type),
            "next_id": pa.array([], id_type),
            "_ts": pa.array([], pa.int64()),
            "_edge": pa.array([], pa.int8()),
        }
        if b.num_rows == 0:
            return pa.table(cols)
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_bucket", "ascending"),
                    (ts_col, "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        n = t.num_rows
        un = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        bk = t["_bucket"].combine_chunks().to_numpy()
        ids = t[id_col].combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col].combine_chunks(), pa.int64()).to_numpy()
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (un[1:] != un[:-1]) | (bk[1:] != bk[:-1])
        is_first = new_grp
        is_last = np.append(new_grp[1:], True)
        prev_np = np.empty(n, dtype=object)
        prev_np[1:] = ids_np[:-1]
        prev_np[is_first] = None
        next_np = np.empty(n, dtype=object)
        next_np[:-1] = ids_np[1:]
        next_np[is_last] = None
        # _edge bit flags: 1 = bucket-first (lag needs fixing), 2 =
        # bucket-last (lead needs fixing); 0 = interior (already exact)
        edge = (is_first.astype(np.int8)) | (is_last.astype(np.int8) << 1)
        return pa.table(
            {
                id_col: ids,
                user_col: t[user_col].combine_chunks(),
                "prev_id": pa.array(prev_np, id_type),
                "next_id": pa.array(next_np, id_type),
                "_ts": pa.array(ts),
                "_edge": pa.array(edge),
            }
        )

    def fix_edges(b: pa.Table) -> pa.Table:
        out_cols = [id_col, user_col, "prev_id", "next_id"]
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    user_col: pa.array([], b.schema.field(user_col).type),
                    "prev_id": pa.array([], id_type),
                    "next_id": pa.array([], id_type),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_ts", "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        n = t.num_rows
        un = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        ids_np = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        edge = t["_edge"].combine_chunks().to_numpy()
        # to_pylist, not to_numpy: Arrow nullable ints coerce to float64/NaN
        # under to_numpy, silently corrupting large ids
        prev_np = np.array(t["prev_id"].to_pylist(), dtype=object)
        next_np = np.array(t["next_id"].to_pylist(), dtype=object)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = un[1:] == un[:-1]
        same_next = np.append(same_prev[1:], False)
        # the edge stream per (user, bucket) is [first, last] (one row when
        # the bucket is a singleton, flagged both): a first row's stream
        # predecessor is the previous present bucket's last event
        need_prev = (edge & 1).astype(bool)
        fix = need_prev & same_prev
        prev_np[fix] = ids_np[np.flatnonzero(fix) - 1]
        prev_np[need_prev & ~same_prev] = None
        need_next = (edge & 2).astype(bool)
        fix = need_next & same_next
        next_np[fix] = ids_np[np.flatnonzero(fix) + 1]
        next_np[need_next & ~same_next] = None
        return pa.table(
            {
                id_col: t[id_col].combine_chunks(),
                user_col: t[user_col].combine_chunks(),
                "prev_id": pa.array(prev_np, id_type),
                "next_id": pa.array(next_np, id_type),
            }
        ).select(out_cols)

    with hash_shuffle(ds):
        tagged = (
            ds.select_columns([user_col, ts_col, id_col])
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=[user_col, "_bucket"])
            .map_batches(
                local_lag_lead, batch_format="pyarrow", zero_copy_batch=True
            )
            # the plan forks here (interior rows vs edge rows): pin the
            # post-exchange result once, else BOTH branches re-execute the
            # corpus-wide exchange — the double-execution trap
            .materialize()
        )
        interior = tagged.filter(expr="_edge == 0").drop_columns(
            ["_ts", "_edge"]
        )
        edges = (
            tagged.filter(expr="_edge > 0")
            .repartition(num_blocks=n_blocks2, keys=[user_col])
            .map_batches(fix_edges, batch_format="pyarrow", zero_copy_batch=True)
        )
        return interior.union(edges).materialize()


def sessionize_bucketed(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
    bucket_s: int = 86_400,
    n_rows: int | None = None,
):
    """Per-user session counts, hot-key-safe. Returns a Dataset
    ``(user_col, n_sessions)`` identical to the naive single-group scan.

    Both phases are ONE unsalted keyed repartition (complete groups per
    block — the bucket itself is the skew device, so no salt) followed by a
    map_batches that processes EVERY group in the block with array ops: sort
    the block, mark group boundaries, lag timestamps, segment-sum. An
    earlier revision used ``groupby().map_groups`` with a per-group pandas
    callback; the (user × bucket) group count made its fixed per-group cost
    the whole runtime (22 s vs ~1 s naive at sf0.1, ~40k groups). Group
    count grows with the corpus, so per-group Python is a scale bug, not a
    constant.

    Both keyed exchanges run in ONE streaming execution (strategy flipped
    once, single ``materialize`` at the end) so their aggregator pools spin
    up concurrently instead of serially — measured 6.6 s → ~4 s at sf0.1,
    where a 32-block hash exchange costs ~4.4 s of fixed spin-up on this
    box. The phase-2 exchange moves only the tiny per-(user, bucket)
    partials, so it gets a quarter of the blocks."""
    import ray

    gap_us = int(gap_s * 1_000_000)
    n_blocks = _exchange_blocks(n_rows)
    n_blocks2 = max(2, n_blocks // 4)

    def add_bucket(b: pa.Table) -> pa.Table:
        ep = pc.cast(b[ts_col].combine_chunks(), pa.int64()).to_numpy()  # µs
        bucket = ep // (bucket_s * 1_000_000)
        return b.append_column("_bucket", pa.array(bucket))

    def bucket_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], b.schema.field(user_col).type),
                    "_bucket": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "_first_us": pa.array([], pa.int64()),
                    "_last_us": pa.array([], pa.int64()),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_bucket", "ascending"),
                    (ts_col, "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        u = t[user_col].combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        bk = t["_bucket"].combine_chunks().to_numpy()
        ts = pc.cast(t[ts_col].combine_chunks(), pa.int64()).to_numpy()
        new_grp = np.ones(len(un), dtype=bool)
        new_grp[1:] = (un[1:] != un[:-1]) | (bk[1:] != bk[:-1])
        gap_prev = np.empty(len(ts), dtype=np.int64)
        gap_prev[0] = gap_us + 1
        gap_prev[1:] = ts[1:] - ts[:-1]
        start = new_grp | (gap_prev > gap_us)
        first = np.flatnonzero(new_grp)
        last = np.append(first[1:] - 1, len(ts) - 1)
        n_sessions = np.add.reduceat(start.astype(np.int64), first)
        return pa.table(
            {
                user_col: u.take(pa.array(first)),
                "_bucket": pa.array(bk[first]),
                "n_sessions": pa.array(n_sessions),
                "_first_us": pa.array(ts[first]),
                "_last_us": pa.array(ts[last]),
            }
        )

    def _lazy_partials(ds):
        return (
            ds.select_columns([user_col, ts_col, id_col])
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=[user_col, "_bucket"])
            .map_batches(
                bucket_partials, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    def merge_users(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], b.schema.field(user_col).type),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[(user_col, "ascending"), ("_bucket", "ascending")],
            )
        )
        u = t[user_col].combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        ns = t["n_sessions"].combine_chunks().to_numpy()
        first_us = t["_first_us"].combine_chunks().to_numpy()
        last_us = t["_last_us"].combine_chunks().to_numpy()
        new_u = np.ones(len(un), dtype=bool)
        new_u[1:] = un[1:] != un[:-1]
        grp_first = np.flatnonzero(new_u)
        total = np.add.reduceat(ns, grp_first)
        # a session continues across a bucket boundary iff the gap between
        # the previous PRESENT bucket's last event and the next present
        # bucket's first event is ≤ gap_s (empty buckets in between only
        # widen the time gap — handled by comparing timestamps, not buckets)
        cont = np.zeros(len(un), dtype=np.int64)
        if len(un) > 1:
            cont[1:] = (
                ~new_u[1:] & (first_us[1:] - last_us[:-1] <= gap_us)
            ).astype(np.int64)
        n_cont = np.add.reduceat(cont, grp_first)
        return pa.table(
            {
                user_col: u.take(pa.array(grp_first)),
                "n_sessions": pa.array(total - n_cont),
            }
        )

    # keyed repartition requires HASH_SHUFFLE at execution time; flip once,
    # execute the WHOLE two-exchange plan, restore (same guard discipline as
    # route_repartition, which materializes per-exchange and is the right
    # shape when callers need the exchanged dataset itself)
    with hash_shuffle(ds):
        return (
            _lazy_partials(ds)
            .repartition(num_blocks=n_blocks2, keys=[user_col])
            .map_batches(merge_users, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )


def avg_gap_bucketed(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_s: int = 86_400,
    n_rows: int | None = None,
):
    """Per-user gap statistics — count and floored-seconds sum of gaps
    between consecutive events in ``(ts, id)`` order — hot-key-safe.
    Returns a Dataset ``(user_col, n_gaps, sum_gap_s)`` equal to SQL's
    ``count(gap), sum(floor(epoch(ts - lag(ts) OVER w)))`` per user.

    Same decomposition as ``sessionize_bucketed`` (VERDICT r03 #2: this
    operator previously ran per-user ``map_groups(pandas)``, the exact
    skew/per-group-Python anti-pattern the repo eliminated from
    sessionize): phase 1 shuffles on ``(user, time_bucket)`` and sums
    intra-bucket gaps vectorized; phase 2 merges the tiny per-bucket
    partial rows per user, adding ONE boundary gap per consecutive pair of
    present buckets (the gap between the previous bucket's last event and
    the next present bucket's first — floored independently, matching the
    per-gap floor-then-sum rule). Worker memory is bounded by one
    (user, bucket) slice regardless of how hot the user is.
    """
    n_blocks = _exchange_blocks(n_rows)
    n_blocks2 = max(2, n_blocks // 4)

    def add_bucket(b: pa.Table) -> pa.Table:
        ep = pc.cast(b[ts_col].combine_chunks(), pa.int64()).to_numpy()  # µs
        return b.append_column("_bucket", pa.array(ep // (bucket_s * 1_000_000)))

    def bucket_partials(b: pa.Table) -> pa.Table:
        u_type = b.schema.field(user_col).type
        if b.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], u_type),
                    "_bucket": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "sum_gap_s": pa.array([], pa.int64()),
                    "_first_us": pa.array([], pa.int64()),
                    "_last_us": pa.array([], pa.int64()),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_bucket", "ascending"),
                    (ts_col, "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        u = t[user_col].combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        bk = t["_bucket"].combine_chunks().to_numpy()
        ts = pc.cast(t[ts_col].combine_chunks(), pa.int64()).to_numpy()
        n = len(un)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (un[1:] != un[:-1]) | (bk[1:] != bk[:-1])
        # per-gap floor BEFORE summing (µs → whole seconds), identical to
        # the SQL side — summing µs then flooring drifts by the fractions
        gap_s = np.zeros(n, dtype=np.int64)
        gap_s[1:] = (ts[1:] - ts[:-1]) // 1_000_000
        gap_s[new_grp] = 0
        is_gap = (~new_grp).astype(np.int64)
        first = np.flatnonzero(new_grp)
        last = np.append(first[1:] - 1, n - 1)
        return pa.table(
            {
                user_col: u.take(pa.array(first)),
                "_bucket": pa.array(bk[first]),
                "n_gaps": pa.array(np.add.reduceat(is_gap, first)),
                "sum_gap_s": pa.array(np.add.reduceat(gap_s, first)),
                "_first_us": pa.array(ts[first]),
                "_last_us": pa.array(ts[last]),
            }
        )

    def merge_users(b: pa.Table) -> pa.Table:
        u_type = b.schema.field(user_col).type
        if b.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], u_type),
                    "n_gaps": pa.array([], pa.int64()),
                    "sum_gap_s": pa.array([], pa.int64()),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[(user_col, "ascending"), ("_bucket", "ascending")],
            )
        )
        u = t[user_col].combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        ng = t["n_gaps"].combine_chunks().to_numpy()
        sg = t["sum_gap_s"].combine_chunks().to_numpy()
        first_us = t["_first_us"].combine_chunks().to_numpy()
        last_us = t["_last_us"].combine_chunks().to_numpy()
        n = len(un)
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = un[1:] != un[:-1]
        grp_first = np.flatnonzero(new_u)
        # one boundary gap per consecutive pair of present buckets of the
        # same user, floored independently like every intra-bucket gap
        bnd_gap = np.zeros(n, dtype=np.int64)
        bnd_cnt = np.zeros(n, dtype=np.int64)
        if n > 1:
            cont = ~new_u[1:]
            bnd_gap[1:][cont] = (first_us[1:] - last_us[:-1])[cont] // 1_000_000
            bnd_cnt[1:] = cont.astype(np.int64)
        return pa.table(
            {
                user_col: u.take(pa.array(grp_first)),
                "n_gaps": pa.array(
                    np.add.reduceat(ng + bnd_cnt, grp_first)
                ),
                "sum_gap_s": pa.array(
                    np.add.reduceat(sg + bnd_gap, grp_first)
                ),
            }
        )

    with hash_shuffle(ds):
        return (
            ds.select_columns([user_col, ts_col, id_col])
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=[user_col, "_bucket"])
            .map_batches(
                bucket_partials, batch_format="pyarrow", zero_copy_batch=True
            )
            .repartition(num_blocks=n_blocks2, keys=[user_col])
            .map_batches(merge_users, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )


def rolling_sum_bucketed(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 3,
    bucket_s: int = 86_400,
    n_rows: int | None = None,
):
    """Per-event rolling sum of value cents over the current + ``window-1``
    preceding events in ``(ts, id)`` order per user, hot-key-safe. Returns
    ``(id_col, roll{window}_cents)`` — SQL's ``sum(cents) OVER (PARTITION
    BY user ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` with ``min_periods=1`` semantics.

    Same ``(user, time_bucket)`` decomposition as ``lag_lead_bucketed``:
    phase 1 resolves every row whose full window lies inside its bucket
    (in-group position ≥ window-1); the per-bucket EDGE rows (first
    ``window-1`` of each bucket) plus CARRIER rows (last ``window-1`` —
    the only rows a later bucket's window can reach) go through a second
    tiny exchange keyed on user alone. In the per-user sorted stream of
    edges+carriers every global predecessor within ``window-1`` of an edge
    row is present and stream-adjacent (any row between two stream rows in
    global order would itself be within the window, hence a stream row),
    so one vectorized shifted-sum over the stream is exact. Per-bucket
    phase-2 volume is ≤ 2·(window-1) rows however hot the user.
    """
    n_blocks = _exchange_blocks(n_rows)
    n_blocks2 = max(2, n_blocks // 4)
    w = int(window)
    out_col = f"roll{w}_cents"

    def add_bucket(b: pa.Table) -> pa.Table:
        ep = pc.cast(b[ts_col].combine_chunks(), pa.int64()).to_numpy()  # µs
        return b.append_column("_bucket", pa.array(ep // (bucket_s * 1_000_000)))

    def local_roll(b: pa.Table) -> pa.Table:
        id_type = b.schema.field(id_col).type
        u_type = b.schema.field(user_col).type
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    out_col: pa.array([], pa.int64()),
                    user_col: pa.array([], u_type),
                    "_ts": pa.array([], pa.int64()),
                    "_cents": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.int8()),
                    "_int": pa.array([], pa.int8()),
                    "_strm": pa.array([], pa.int8()),
                }
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_bucket", "ascending"),
                    (ts_col, "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        n = t.num_rows
        un = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        bk = t["_bucket"].combine_chunks().to_numpy()
        ts = pc.cast(t[ts_col].combine_chunks(), pa.int64()).to_numpy()
        cents = np.floor(
            t[value_col].combine_chunks().to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (un[1:] != un[:-1]) | (bk[1:] != bk[:-1])
        first = np.flatnonzero(new_grp)
        counts = np.diff(np.append(first, n))
        pos = np.arange(n) - np.repeat(first, counts)  # in-group position
        size = np.repeat(counts, counts)
        roll = cents.copy()
        for j in range(1, w):
            # j-back predecessor contributes where it exists in-group
            ok = pos >= j
            roll[ok] += cents[np.flatnonzero(ok) - j]
        is_edge = pos < (w - 1)
        is_carrier = pos >= (size - (w - 1))
        keep = is_edge | is_carrier
        # ONE pass, every row once, flagged for the two consumers (review
        # r4: separate interior/stream map_batches each re-sorted and
        # re-rolled every block): _int → interior output rows (full window
        # in-bucket), _strm → edge/carrier rows for the per-user fix-up
        return pa.table(
            {
                id_col: t[id_col].combine_chunks(),
                out_col: pa.array(roll),
                user_col: t[user_col].combine_chunks(),
                "_ts": pa.array(ts),
                "_cents": pa.array(cents),
                "_edge": pa.array(is_edge.astype(np.int8)),
                "_int": pa.array((~is_edge).astype(np.int8)),
                "_strm": pa.array(keep.astype(np.int8)),
            }
        )

    def fix_edges(b: pa.Table) -> pa.Table:
        id_type = b.schema.field(id_col).type
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], id_type), out_col: pa.array([], pa.int64())}
            )
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    (user_col, "ascending"),
                    ("_ts", "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        n = t.num_rows
        un = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        cents = t["_cents"].combine_chunks().to_numpy()
        edge = t["_edge"].combine_chunks().to_numpy().astype(bool)
        roll = cents.copy()
        for j in range(1, w):
            idx = np.arange(j, n)
            same = un[idx] == un[idx - j]
            roll[idx[same]] += cents[idx - j][same]
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().filter(pa.array(edge)),
                out_col: pa.array(roll[edge]),
            }
        )

    with hash_shuffle(ds):
        tagged = (
            ds.select_columns([user_col, ts_col, id_col, value_col])
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=[user_col, "_bucket"])
        )
        # the plan forks (interior vs stream): run the sort+roll ONCE per
        # block and pin the flagged result, so both branches filter the
        # same computed rows (the exchange AND the roll never re-run)
        rolled = tagged.map_batches(
            local_roll, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        interior = rolled.filter(expr="_int == 1").select_columns(
            [id_col, out_col]
        )
        edges = (
            rolled.filter(expr="_strm == 1")
            .drop_columns([out_col, "_int", "_strm"])
            .repartition(num_blocks=n_blocks2, keys=[user_col])
            .map_batches(fix_edges, batch_format="pyarrow", zero_copy_batch=True)
        )
        return interior.union(edges).materialize()
