"""The flagship parse → enrich → route → aggregate pipeline (SURVEY.md §3.4).

    read_parquet(transcripts)
      → match_stage       (compiled pattern bank, vectorized, broadcast once)
      → enrich_stage      (broadcast dims: role_class / tool_family / is_sandboxed)
      → [optional] routed write per (role, tool, template_id) with manifests
      → sink_counts       (partial-agg → tiny groupby)

Everything streams; nothing materializes the row-scale data on the driver.
"""

from __future__ import annotations

import glob
import os

import ray

from logparser_ray import fixtures
from logparser_ray.stages.aggregate import sink_counts, template_occurrences
from logparser_ray.stages.enrich import enrich_stage
from logparser_ray.stages.parse import match_stage
from logparser_ray.state.manifest import RoutedRunner, manifests_sink_table


def parse_enrich(ds, bank=None, *, with_params: bool = True, concurrency=None):
    """The stateless transform chain shared by all entry points."""
    bank = bank or fixtures.pattern_bank()
    ds = match_stage(ds, bank, with_params=with_params, concurrency=concurrency)
    ds = enrich_stage(
        ds, roles_dim=fixtures.roles_dim(), tools_dim=fixtures.tools_dim()
    )
    return ds


def run_flagship(
    input_dir: str,
    *,
    out_dir: str | None = None,
    bank=None,
    resume: bool = True,
    with_params: bool = True,
    files_per_fragment: int = 16,
    layout: str = "packed",
):
    """Run the full pipeline over a transcripts Parquet directory.

    Returns ``{"sink_counts": Dataset, "manifests": [...], "skipped": int}``.
    When ``out_dir`` is None the routed write is skipped (aggregate only).

    A *fragment* (the checkpoint/resume unit) bundles ``files_per_fragment``
    input shards; each shard is one fused read→parse→enrich→routed-write
    Ray task (see ``state.RoutedRunner`` for the layout trade-offs).

    Incremental ingest: fragments are formed from the lexicographically
    sorted file list, so appending new files that sort AFTER the existing
    ones (the usual ``part-NNNN`` convention) leaves every full earlier
    fragment's membership unchanged — a re-run with ``resume=True``
    processes only the final partial fragment and the new ones.
    """
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    result: dict = {}
    if out_dir is not None:
        files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
        table_fn = make_match_enrich_table_fn(
            bank or fixtures.pattern_bank(),
            fixtures.roles_dim(),
            fixtures.tools_dim(),
            with_params=with_params,
        )
        runner = RoutedRunner(out_dir, table_fn, layout=layout)
        fragments = {
            f"f{i // files_per_fragment:05d}": files[i : i + files_per_fragment]
            for i in range(0, len(files), files_per_fragment)
        }
        import time as _time

        t0 = _time.perf_counter()
        manifests, skipped = runner.run(fragments, resume=resume)
        wall = _time.perf_counter() - t0
        result["manifests"] = manifests
        result["skipped"] = skipped
        # per-sink counts straight from the lineage manifests (metadata only —
        # no read-back of the routed files)
        result["sink_counts"] = ray.data.from_arrow(manifests_sink_table(manifests))
        # per-stage metrics (north-star: throughput / row counts per stage)
        rows_in = sum(m.rows_in for m in manifests)
        rows_out = sum(m.rows_written for m in manifests)
        result["metrics"] = {
            "fragments": len(manifests),
            "fragments_skipped": skipped,
            "shards": sum(len(m.input_files) for m in manifests),
            "rows_in": rows_in,
            "rows_written": rows_out,
            "sinks": len({k for m in manifests for k in m.sink_counts}),
            "wall_s": round(wall, 3),
            "turns_per_sec": round(rows_in / wall, 1) if wall > 0 else None,
        }
    else:
        from logparser_ray.sources.shards import read_parquet_shards

        ds = read_parquet_shards(input_dir)
        ds = parse_enrich(ds, bank, with_params=with_params)
        result["sink_counts"] = sink_counts(ds)
    return result


def flagship_fixture(n_turns: int = 2_000, seed: int = 42, out_dir: str | None = None):
    """Flagship over the deterministic transcripts fixture (cached Parquet)."""
    tdir, _ = fixtures.ensure_transcripts(n_turns, seed=seed)
    return run_flagship(tdir, out_dir=out_dir)
