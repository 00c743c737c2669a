"""The ``ray job submit`` entry point for the flagship pipeline.

On a real cluster (the north-star deployment: fixed-size multi-node, N and
4N nodes):

    ray job submit --working-dir . -- \
        python scripts/run_pipeline.py \
            --input  /data/transcripts/   \
            --output /data/routed/        \
            --layout packed --resume

Locally it runs against the driver testdata-scale fixtures. The job is
resumable: re-submitting after a failure skips completed fragments and
re-runs only shards without receipts (see ``state/manifest.py``). Exit code
0 iff every fragment committed and audited clean.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="parse→enrich→route→aggregate job")
    ap.add_argument("--input", required=True, help="transcripts Parquet dir")
    ap.add_argument("--output", required=True, help="routed output root")
    ap.add_argument("--layout", choices=["packed", "hive"], default="packed")
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--no-params", dest="with_params", action="store_false")
    ap.add_argument("--files-per-fragment", type=int, default=16)
    ap.add_argument("--audit", action="store_true", help="verify manifests vs footers")
    ap.add_argument(
        "--bank", help="Parquet pattern-bank artifact to match with "
        "(default: fit per --fit-miner and save to <output>/_bank.parquet)"
    )
    ap.add_argument(
        "--fit-miner", default=None,
        help="fit a bank first with this miner (e.g. drain, spell, shiso) "
        "and save it next to the output",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` this attaches to the cluster; standalone it
        # starts a local session
        ray.init(ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from logparser_ray.pipelines import flagship
    from logparser_ray.state.manifest import audit_fragment

    bank = None
    if args.bank:
        from logparser_ray.core.bank import PatternBank

        bank = PatternBank.load(args.bank)
    elif args.fit_miner:
        # fit job → bank artifact → match job (the two-phase deployment flow)
        from logparser_ray.stages.mine import fit_bank

        ds = ray.data.read_parquet(args.input)
        bank = fit_bank(ds, args.fit_miner)
        os.makedirs(args.output, exist_ok=True)
        bank.save(os.path.join(args.output, "_bank.parquet"))

    res = flagship.run_flagship(
        args.input,
        out_dir=args.output,
        bank=bank,
        resume=args.resume,
        layout=args.layout,
        with_params=args.with_params,
        files_per_fragment=args.files_per_fragment,
    )
    ok = True
    if args.audit:
        for m in res["manifests"]:
            a = audit_fragment(args.output, m.fragment)
            if not a["ok"]:
                print(f"AUDIT FAIL {m.fragment}: {a['mismatches']}", file=sys.stderr)
                ok = False
    print(json.dumps({"metrics": res["metrics"], "audited": args.audit, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
