"""Routing / fan-out (SURVEY.md R1, S7).

Rows fan out to per-``(role, tool, template_id)`` sinks. Pieces:

- ``add_salt`` / ``route_repartition``: the explicit salted hash-partition
  shuffle for pipelines that need sink co-location *in flight* (hot conv_ids
  — BASELINE.json:6). Hash-partitioning by ``sink key + _salt`` splits a hot
  sink across ``num_salts`` blocks so no single reducer receives the whole
  hot key.
- ``pack_by_key`` / ``write_packed_shard`` / ``write_hive_shard``: the
  shard-local routed writers used by ``state.RoutedRunner``'s fused path —
  each Ray task groups its shard by sink key and writes it directly
  (packed: one file, row groups aligned to sink boundaries; hive: one file
  per sink present). Rows never re-enter the object store, so no
  all-to-all exchange is needed for the write itself; per-sink reads use
  the manifest's row-group index (packed) or the directory layout (hive).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SINK_KEYS = ["role", "tool", "template_id"]
SALT_COL = "_salt"


def add_salt(ds, *, on: tuple[str, ...] = ("conv_id", "turn_idx"), num_salts: int = 8):
    """Append a ROW-level ``_salt = hash64(on...) % num_salts`` column.

    The salt must vary WITHIN a hot key or it cannot split that key across
    reducers — so it hashes the key PLUS a within-key discriminator
    (``turn_idx`` here; any row-varying column works). Deterministic and
    stable across runs/partitionings (vectorized pandas hash)."""

    def fn(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for col in on:
            vals = batch[col].combine_chunks().to_numpy(zero_copy_only=False)
            h = h * np.uint64(1099511628211) + pd.util.hash_array(
                np.asarray(vals), hash_key="rayparse-salt-01"
            )
        return batch.append_column(
            SALT_COL, pa.array((h % num_salts).astype(np.int32))
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def route_repartition(
    ds,
    *,
    keys: list[str] | None = None,
    num_blocks: int | None = None,
    salted: bool = True,
    num_salts: int = 8,
    sort: bool = False,
):
    """Explicit hash-partitioned shuffle on the sink key (+ salt when skewed).

    Returns a dataset whose blocks are co-located by sink key — salted, a
    hot key's rows split across ≤ ``num_salts`` reducers instead of
    crushing one (BASELINE.json:6 hot conv_id skew); the salt column is
    dropped after the exchange.

    The key-based repartition requires ``shuffle_strategy=HASH_SHUFFLE`` *at
    execution time* (verified: Ray raises otherwise), so the exchange is
    executed here (``materialize`` — a keyed repartition is an all-to-all
    barrier regardless; blocks pin in the object store and spill as needed)
    and the context's previous strategy is restored before returning,
    instead of leaking HASH_SHUFFLE into every later op on the context.
    """
    from logparser_ray.stages.exchange import hash_shuffle

    with hash_shuffle(ds):
        keys = list(keys or SINK_KEYS)
        if salted:
            ds = add_salt(ds, num_salts=num_salts)
            keys = keys + [SALT_COL]
        ds = ds.repartition(num_blocks=num_blocks, keys=keys, sort=sort)
        if salted:
            ds = ds.drop_columns([SALT_COL])
        return ds.materialize()


# ---------------------------------------------------------------------------
# shard-local routed writers (fused path)
# ---------------------------------------------------------------------------


def _quote(v) -> str:
    from urllib.parse import quote

    return quote("" if v is None else str(v), safe="")


def pack_by_key(table: pa.Table, partition_cols: list[str]):
    """Sort a table by its (dictionary-encoded) sink key.

    Returns ``(sorted_table, rel_keys, starts, ends)`` where row range
    ``[starts[i], ends[i])`` of ``sorted_table`` is sink ``rel_keys[i]``
    (a hive-style relative path ``col=value/...``). One gather pass; no
    per-row Python.
    """
    if table.num_rows == 0:
        return table, [], np.zeros(0, np.int64), np.zeros(0, np.int64)
    # null key values route as "" (the reference's empty-tool convention);
    # the payload keeps the original nulls
    key_cols = [
        pc.fill_null(pc.cast(table[c], pa.string()), "") for c in partition_cols
    ]
    keys = (
        key_cols[0].combine_chunks()
        if len(key_cols) == 1
        else pc.binary_join_element_wise(*key_cols, "\x00").combine_chunks()
    )
    enc = keys.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    order = np.argsort(idx, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    sorted_idx = idx[order]
    bounds = np.flatnonzero(np.diff(sorted_idx)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(idx)]])
    rel_keys = []
    for s in starts:
        vals = enc.dictionary[sorted_idx[s]].as_py().split("\x00")
        rel_keys.append(
            "/".join(f"{c}={_quote(v)}" for c, v in zip(partition_cols, vals))
        )
    return sorted_tbl, rel_keys, starts, ends


def write_packed_shard(
    table: pa.Table,
    frag_dir: str,
    shard_name: str,
    partition_cols: list[str],
    drop_cols: list[str] = (),
) -> list[tuple[str, int, int]]:
    """Write one shard as ONE Parquet file with row groups aligned to sink
    boundaries (atomic: tmp + rename, so retries are idempotent).

    Returns ``[(rel_sink_key, row_group, n_rows), ...]`` — the manifest's
    row-group index. File count is O(shards), independent of sink
    cardinality — the property that keeps a 100 TB run with 10⁴⁺ sinks from
    exploding into 10⁹ tiny files. Partition columns stay IN the file so a
    packed file is self-describing.
    """
    sorted_tbl, rel_keys, starts, ends = pack_by_key(table, partition_cols)
    if drop_cols:
        sorted_tbl = sorted_tbl.drop_columns(list(drop_cols))
    os.makedirs(frag_dir, exist_ok=True)
    path = os.path.join(frag_dir, f"{shard_name}.parquet")
    tmp = os.path.join(frag_dir, f".tmp-{shard_name}.parquet")
    index: list[tuple[str, int, int]] = []
    with pq.ParquetWriter(tmp, sorted_tbl.schema, write_statistics=False) as w:
        for rg, (rel, s, e) in enumerate(zip(rel_keys, starts, ends)):
            w.write_table(sorted_tbl.slice(s, e - s), row_group_size=max(1, e - s))
            index.append((rel, rg, int(e - s)))
    os.replace(tmp, path)
    return index


def write_hive_shard(
    table: pa.Table,
    frag_dir: str,
    shard_name: str,
    partition_cols: list[str],
    drop_cols: list[str] = (),
) -> list[tuple[str, int, int]]:
    """Write one shard hive-style: ``col=value/.../<shard_name>.parquet`` per
    sink present (deterministic names → idempotent on retry). Plain
    directory-per-sink layout any engine can read; file count is
    O(shards × sinks-present-per-shard)."""
    sorted_tbl, rel_keys, starts, ends = pack_by_key(table, partition_cols)
    payload = sorted_tbl.drop_columns(list(partition_cols) + list(drop_cols))
    index: list[tuple[str, int, int]] = []
    for rel, s, e in zip(rel_keys, starts, ends):
        pdir = os.path.join(frag_dir, rel)
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"{shard_name}.parquet")
        tmp = os.path.join(pdir, f".tmp-{shard_name}.parquet")
        pq.write_table(payload.slice(s, e - s), tmp)
        os.replace(tmp, path)
        index.append((rel, 0, int(e - s)))
    return index
