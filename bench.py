"""Benchmark harness — prints ONE JSON line (driver contract).

    python bench.py             # headline + per-query seconds at $GRAFT_SF_DIR
    python bench.py --scaling   # same job at num_cpus=8 and 32 in fresh
                                # processes → throughputs + scaling efficiency

Headline: the flagship parse→enrich→route→aggregate pipeline over the
bench-scale transcripts fixture (600k turns at sf0.1), reported as wall
seconds (metric value) plus turns/sec. This script OWNS its Ray session
(the only places allowed to: bench/CLI/tests fixture).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

TURNS_BY_SF = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}


def _turns() -> int:
    return TURNS_BY_SF.get(os.path.basename(os.path.normpath(SF_DIR)), 600_000)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from logparser_ray import fixtures
    from logparser_ray.pipelines import flagship
    from logparser_ray.queries import QUERIES

    n_turns = _turns()
    tdir, _ = fixtures.ensure_transcripts(n_turns)  # untimed generation

    # warm the page cache so we measure compute+shuffle, not first disk read
    ray.data.read_parquet(tdir).count()

    timings: dict[str, float] = {}

    # headline: full flagship incl. routed write + per-sink aggregate
    out_dir = "/tmp/rayparse_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = flagship.run_flagship(tdir, out_dir=out_dir, resume=False)
    n_sinks = res["sink_counts"].count()
    headline = time.perf_counter() - t0
    timings["flagship_route_write"] = round(headline, 3)

    # aggregate-only variant (no routed write) — the pure streaming path
    t0 = time.perf_counter()
    res2 = flagship.run_flagship(tdir, out_dir=None)
    res2["sink_counts"].count()
    timings["flagship_aggregate"] = round(time.perf_counter() - t0, 3)

    for name in (
        "lineitem_pricing",
        "events_sessionize",
        "docs_word_freq_topk",
        "embeddings_knn",
        "docs_unigram_near_dupes",
    ):
        t0 = time.perf_counter()
        r = QUERIES[name](SF_DIR)
        if hasattr(r, "count"):
            r.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship parse→enrich→route→aggregate wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "n_sinks": n_sinks,
        "turns_per_sec": round(n_turns / headline, 1),
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["turns_per_sec"]
    tp_hi = r_hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (turns/sec at 8 vs 32 cpus)",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "turns_per_sec_lo": tp_lo,
        "turns_per_sec_hi": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
