"""Per-partition lineage manifests + checkpointed resume (SURVEY.md §4).

The unit of work is an *input fragment* (one or more input Parquet files).
Each fragment is processed through the pipeline and written to its own
output directory ``frag=<name>/`` partitioned by the sink key; completion is
recorded by an atomically-renamed manifest JSON carrying lineage (input
files, row counts, per-sink counts, checksum, wall time). On resume,
fragments with a ``done`` manifest are skipped — a failed 100 TB run
restarts only its unfinished fragments, and retried fragments overwrite
their own directory atomically so double-writes are impossible
(SURVEY.md §7.4 #4: idempotent writes via deterministic names + manifest
commit).

Driver-side code here only touches manifests and directory renames —
row-scale data stays inside Ray Data tasks.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


@dataclass
class FragmentManifest:
    fragment: str
    input_files: list[str]
    rows_in: int
    rows_written: int
    sinks: int
    sink_counts_sha256: str
    wall_s: float
    status: str = "done"
    sink_counts: dict = field(default_factory=dict)  # hive rel-path → rows
    extra: dict = field(default_factory=dict)


def _manifest_dir(out_root: str) -> str:
    return os.path.join(out_root, "_manifest")


def _manifest_path(out_root: str, frag_name: str) -> str:
    return os.path.join(_manifest_dir(out_root), f"{frag_name}.json")


def load_manifest(out_root: str, frag_name: str) -> FragmentManifest | None:
    p = _manifest_path(out_root, frag_name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return FragmentManifest(**d)


def write_manifest(out_root: str, m: FragmentManifest) -> None:
    os.makedirs(_manifest_dir(out_root), exist_ok=True)
    p = _manifest_path(out_root, m.fragment)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
    os.replace(tmp, p)


def dir_sink_counts(frag_dir: str) -> dict[str, int]:
    """Per-sink row counts from Parquet *metadata* of a hive-partitioned
    fragment dir — no data read, driver-cheap even for huge fragments."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(frag_dir):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        rel = os.path.relpath(dirpath, frag_dir)
        n = sum(
            pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows for f in pfiles
        )
        counts[rel] = counts.get(rel, 0) + n
    return counts


def manifests_sink_table(manifests, partition_cols=("role", "tool", "template_id")):
    """Aggregate per-sink counts across fragment manifests into an Arrow
    table ``(*partition_cols, n_turns)`` — pure lineage metadata, no data
    read. The hive rel-paths in ``sink_counts`` are decoded back to column
    values."""
    from collections import Counter
    from urllib.parse import unquote

    import pyarrow as pa

    agg: Counter = Counter()
    for m in manifests:
        for rel, n in m.sink_counts.items():
            vals = []
            for part in rel.split(os.sep):
                _, _, v = part.partition("=")
                vals.append(unquote(v))
            agg[tuple(vals)] += n
    keys = sorted(agg)
    cols = {
        c: pa.array([k[i] for k in keys], pa.string())
        for i, c in enumerate(partition_cols)
    }
    cols["n_turns"] = pa.array([agg[k] for k in keys], pa.int64())
    return pa.table(cols)


def counts_checksum(counts: dict[str, int]) -> str:
    payload = "\n".join(f"{k}\t{v}" for k, v in sorted(counts.items()))
    return hashlib.sha256(payload.encode()).hexdigest()


class RoutedRunner:
    """Checkpointed fragment-by-fragment routed-write runner (SURVEY.md R1+S7).

    ``pipeline_fn(ds) -> ds`` is the parse→enrich transform chain; output is
    written per fragment, hive-partitioned by ``partition_cols`` (the sink
    key). ``run`` returns the manifests of all fragments (completed ones are
    skipped when ``resume=True`` — the checkpointed-resume contract).
    """

    def __init__(
        self,
        out_root: str,
        pipeline_fn,
        partition_cols: tuple[str, ...] = ("role", "tool", "template_id"),
        drop_cols: tuple[str, ...] = (),
    ):
        self.out_root = out_root
        self.pipeline_fn = pipeline_fn
        self.partition_cols = list(partition_cols)
        self.drop_cols = list(drop_cols)
        os.makedirs(out_root, exist_ok=True)

    def frag_dir(self, frag_name: str) -> str:
        return os.path.join(self.out_root, f"frag={frag_name}")

    def run_fragment(self, frag_name: str, input_files: list[str]) -> FragmentManifest:
        import pyarrow.parquet as pq
        import ray

        t0 = time.perf_counter()
        # rows_in from parquet footers — no data read
        rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in input_files)
        ds = ray.data.read_parquet(input_files)
        out = self.pipeline_fn(ds)
        if self.drop_cols:
            out = out.drop_columns(self.drop_cols)
        final_dir = self.frag_dir(frag_name)
        tmp_dir = os.path.join(self.out_root, f".tmp-{frag_name}")
        for d in (tmp_dir, final_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        out.write_parquet(tmp_dir, partition_cols=self.partition_cols)
        os.replace(tmp_dir, final_dir)
        counts = dir_sink_counts(final_dir)
        m = FragmentManifest(
            fragment=frag_name,
            input_files=list(input_files),
            rows_in=rows_in,
            rows_written=sum(counts.values()),
            sinks=len(counts),
            sink_counts_sha256=counts_checksum(counts),
            wall_s=round(time.perf_counter() - t0, 3),
            sink_counts=counts,
        )
        write_manifest(self.out_root, m)
        return m

    def run(
        self,
        fragments: dict[str, list[str]],
        resume: bool = True,
        max_concurrent: int = 4,
    ) -> tuple[list[FragmentManifest], int]:
        """Process ``{frag_name: [input files]}``; returns (manifests, n_skipped).

        Fragments run as ``max_concurrent`` overlapping Ray Data pipelines
        (each is an independent streaming execution; overlapping them hides
        per-pipeline startup and lets the write of one fragment overlap the
        read/match of the next — on a multi-node cluster each fragment's
        tasks spread across the whole cluster regardless).
        """
        from concurrent.futures import ThreadPoolExecutor

        todo: list[str] = []
        done: dict[str, FragmentManifest] = {}
        for name in sorted(fragments):
            prev = load_manifest(self.out_root, name) if resume else None
            if prev is not None and prev.status == "done":
                done[name] = prev
            else:
                todo.append(name)
        if todo:
            with ThreadPoolExecutor(max_workers=max(1, max_concurrent)) as pool:
                for name, m in zip(
                    todo,
                    pool.map(lambda n: self.run_fragment(n, fragments[n]), todo),
                ):
                    done[name] = m
        return [done[n] for n in sorted(fragments)], len(fragments) - len(todo)
