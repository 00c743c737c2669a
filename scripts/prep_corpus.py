"""CLI for the composed training-corpus prep pipeline
(gate → PII redact → mixture sample → exact dedup → pack → partitioned
write). The curation counterpart of scripts/run_pipeline.py:

    python scripts/prep_corpus.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/prep_out --budget 1024 --rate src0=0.9 --rate src1=0.5

Exit code 0 iff the pipeline ran and (with --output) the packed corpus
row count read back equals the deduped count. Prints one JSON line of
metrics (rows in/gated/deduped, sequences, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="corpus prep: gate→redact→mix→dedup→pack")
    ap.add_argument("--input", required=True, help="documents-shaped Parquet path/dir")
    ap.add_argument("--output", help="packed corpus root (partitioned by seq_part)")
    ap.add_argument("--budget", type=int, default=2048, help="tokens per sequence")
    ap.add_argument("--seq-per-part", type=int, default=64)
    ap.add_argument(
        "--rate", action="append", default=[], metavar="SOURCE=R",
        help="mixture rate per source (repeatable); unknown sources take --default-rate",
    )
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument(
        "--dedup-exec", choices=["auto", "pin", "spill", "recompute"],
        default="auto",
    )
    args = ap.parse_args()

    rates: dict[str, float] = {}
    for spec in args.rate:
        k, _, v = spec.partition("=")
        if not _ or not k:
            raise SystemExit(f"--rate expects SOURCE=R, got {spec!r}")
        rates[k] = float(v)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from logparser_ray.pipelines.prep import prep_corpus

    t0 = time.perf_counter()
    res = prep_corpus(
        args.input,
        out_dir=args.output,
        rates=rates,
        default_rate=args.default_rate,
        budget=args.budget,
        seq_per_part=args.seq_per_part,
        dedup_exec=args.dedup_exec,
    )
    metrics = dict(res["metrics"])
    ok = True
    if args.output:
        n_back = ray.data.read_parquet(args.output).count()
        ok = n_back == metrics["rows_deduped"]
        metrics["rows_read_back"] = n_back
    metrics["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"metrics": metrics, "ok": ok}))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
