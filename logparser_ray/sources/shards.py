"""Shard-granular Parquet source (measured fast path; see BASELINE.md).

``ray.data.read_parquet`` is the default source everywhere schema pruning /
row-group splitting matter. For the hot flagship path, the Parquet scanner's
per-task overhead (~3× the actual decode+compute on 75k-row shards — see
BASELINE.md architecture note) justifies this shard source: a Dataset of
file descriptors, each task ``pq.read_table``-ing its shard directly. It is
still Ray Data end to end (``from_items → map_batches``); it simply pins the
file→task mapping, which the routed writer needs anyway for deterministic
shard naming and per-shard lineage.

Trade-offs vs ``read_parquet`` (documented so callers choose deliberately):
no automatic row-group splitting of huge files (keep shards ≤ a few hundred
MB — the writer's own guidance), and column pruning must be passed
explicitly via ``columns=``.
"""

from __future__ import annotations

import glob
import os


def list_shards(path: str) -> list[str]:
    """Parquet files under a directory (or the path itself), sorted."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def read_parquet_shards(
    path: str | list[str],
    *,
    columns: list[str] | None = None,
    shards_per_task: int = 2,
):
    """Dataset over Parquet shards with one ``pq.read_table`` per shard.

    Each output block is one shard's full table (column-pruned when
    ``columns`` is given).
    """
    import pyarrow.parquet as pq
    import ray

    files = list_shards(path) if isinstance(path, str) else sorted(path)

    def read_shard(batch):
        import pyarrow as pa

        tables = [
            pq.read_table(p, columns=columns) for p in batch["path"].to_pylist()
        ]
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    n_tasks = max(1, (len(files) + shards_per_task - 1) // shards_per_task)
    return ray.data.from_items(
        [{"path": f} for f in files], override_num_blocks=n_tasks
    ).map_batches(read_shard, batch_format="pyarrow", batch_size=None)
