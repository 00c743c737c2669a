"""Routing / fan-out (SURVEY.md R1, S7): salted hash-partitioned shuffle.

Rows fan out to per-``(role, tool, template_id)`` sinks. Two pieces:

- ``add_salt``: a vectorized salt column from the skewed key (hot conv_ids
  — BASELINE.json:6). Hash-partitioning by ``sink key + _salt`` splits a hot
  sink across ``num_salts`` blocks so no single reducer/writer receives the
  whole hot key; the salt is dropped before the hive-partitioned write, so
  sink layout is unchanged.
- ``route_repartition``: the explicit hash-partition shuffle
  (``Dataset.repartition(num_blocks, keys=..., sort=...)``).

The routed *write* itself is ``write_parquet(partition_cols=sink_key)``
per input fragment, orchestrated with manifests by ``state.RoutedRunner``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SINK_KEYS = ["role", "tool", "template_id"]
SALT_COL = "_salt"


def add_salt(ds, *, on: str = "conv_id", num_salts: int = 8):
    """Append ``_salt = hash64(on) % num_salts`` (vectorized, stable)."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[on].combine_chunks().to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals, hash_key="rayparse-salt-01") % num_salts
        return batch.append_column(SALT_COL, pa.array(h.astype(np.int32)))

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

    Returns a dataset whose blocks are co-located by sink key, salt dropped.
    """
    keys = list(keys or SINK_KEYS)
    if salted:
        ds = add_salt(ds, num_salts=num_salts)
        keys = keys + [SALT_COL]
    ds = ds.repartition(num_blocks=num_blocks, keys=keys, sort=sort)
    if salted:
        ds = ds.drop_columns([SALT_COL])
    return ds
