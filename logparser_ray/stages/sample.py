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


def _row_hashes(vals: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic uint64 hash per value; the seed keys the draw."""
    if vals.dtype == object:
        return pd.util.hash_array(vals, hash_key=f"{seed:016d}").astype(np.uint64)
    h = pd.util.hash_array(np.ascontiguousarray(vals))
    mix = np.uint64((0x9E3779B97F4A7C15 * seed) & 0xFFFFFFFFFFFFFFFF)
    return (h + mix).astype(np.uint64)


def sample_min_k_by_hash(
    ds, *, cols: list[str], key_col: str, n: int, seed: int = 0
) -> pd.DataFrame:
    """``n`` rows of ``ds[cols]`` with the smallest keyed hash of
    ``key_col``; ties broken by the key value. Returns a pandas frame
    (bounded: ``n`` rows) ordered by (hash, key) ascending."""

    def partial_min_k(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        vals = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = _row_hashes(vals, seed)
        # stable local k-smallest by (hash, key): sorts THIS block only —
        # the k-boundary tie-break must match the global merge's ordering
        order = np.lexsort((vals, h))[:n]
        out = t.take(pa.array(order))
        return out.append_column("_h", pa.array(h[order]))

    parts = (
        ds.select_columns(cols)
        .map_batches(partial_min_k, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    merged = parts.sort_values(["_h", key_col], kind="mergesort").head(n)
    return merged.drop(columns=["_h"]).reset_index(drop=True)
