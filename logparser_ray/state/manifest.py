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


def _defuse_fsspec_http_race() -> None:
    """Ray's path resolution probes fsspec's optional HTTP filesystem on every
    datasource/datasink construction. With aiohttp absent that import raises
    ModuleNotFoundError (which Ray catches) — but when two fragment threads
    import it concurrently, one can observe the other's partially-initialized
    module and die with a plain ImportError that Ray does NOT catch.
    Pre-install a benign stub so the import is deterministic; the stub class
    is never instantiated, so Ray's isinstance checks correctly return False.
    """
    try:
        import fsspec.implementations.http  # noqa: F401

        return
    except ImportError:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover - marker type only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


_defuse_fsspec_http_race()


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
    fragment dir — no data read, cheap even for huge fragments."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(frag_dir):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        rel = os.path.relpath(dirpath, frag_dir)
        n = sum(pq.read_metadata(os.path.join(dirpath, f)).num_rows for f in pfiles)
        counts[rel] = counts.get(rel, 0) + n
    return counts


def audit_fragment(out_root: str, frag_name: str) -> dict:
    """Integrity check: do the manifest's lineage claims match the bytes on
    disk? Verifies (a) per-sink counts against Parquet footer metadata and
    (b) the sink_counts checksum. Returns ``{"ok": bool, "mismatches": [...]}``
    — the audit half of the exactly-once story (manifests are claims;
    footers are ground truth)."""
    import pyarrow.parquet as pq

    m = load_manifest(out_root, frag_name)
    if m is None:
        return {"ok": False, "mismatches": ["manifest missing"]}
    frag_dir = os.path.join(out_root, f"frag={frag_name}")
    mismatches: list[str] = []
    if m.extra.get("layout") == "packed":
        # per-sink counts from each pack file's row-group metadata
        actual: dict[str, int] = {}
        for rel, entries in m.extra.get("sink_index", {}).items():
            for fname, rg, _n in entries:
                md = pq.read_metadata(os.path.join(frag_dir, fname))
                actual[rel] = actual.get(rel, 0) + md.row_group(rg).num_rows
        if actual != m.sink_counts:
            bad = {
                k
                for k in set(actual) | set(m.sink_counts)
                if actual.get(k) != m.sink_counts.get(k)
            }
            mismatches.append(f"sink counts differ for {sorted(bad)[:5]}")
    else:
        actual = dir_sink_counts(frag_dir)
        if actual != m.sink_counts:
            mismatches.append("hive dir counts differ from manifest")
    if counts_checksum(m.sink_counts) != m.sink_counts_sha256:
        mismatches.append("sink_counts checksum mismatch")
    if sum(m.sink_counts.values()) != m.rows_written:
        mismatches.append("rows_written != sum(sink_counts)")
    return {"ok": not mismatches, "mismatches": mismatches}


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


def list_manifests(out_root: str) -> list[FragmentManifest]:
    mdir = _manifest_dir(out_root)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            out.append(load_manifest(out_root, f[: -len(".json")]))
    return [m for m in out if m is not None]


def read_sink(
    out_root: str,
    sink: dict[str, str],
    partition_cols: tuple[str, ...] = ("role", "tool", "template_id"),
):
    """Read ONE routed sink back as a ``ray.data.Dataset`` using the lineage
    manifests — for the packed layout this touches only the sink's own row
    groups (no other sink's bytes are read); for hive it reads the sink's
    directory. ``sink`` maps partition col → value, e.g.
    ``{"role": "tool", "tool": "bash", "template_id": "ab12cd34"}``.
    """
    from urllib.parse import quote

    import ray

    rel = "/".join(f"{c}={quote(str(sink[c]), safe='')}" for c in partition_cols)
    items = []
    hive_dirs = []
    for m in list_manifests(out_root):
        frag_dir = os.path.join(out_root, f"frag={m.fragment}")
        layout = m.extra.get("layout", "hive")
        if layout == "packed":
            for fname, rg, _n in m.extra.get("sink_index", {}).get(rel, []):
                items.append({"path": os.path.join(frag_dir, fname), "row_group": rg})
        elif rel in m.sink_counts:
            hive_dirs.append(os.path.join(frag_dir, rel))
    def read_groups(batch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = []
        by_path: dict[str, list[int]] = {}
        for path, rg in zip(batch["path"].to_pylist(), batch["row_group"].to_pylist()):
            by_path.setdefault(path, []).append(rg)
        for path, rgs in by_path.items():
            tables.append(pq.ParquetFile(path).read_row_groups(sorted(rgs)))
        return pa.concat_tables(tables) if tables else pa.table({})

    if not items and not hive_dirs:
        raise KeyError(f"sink {rel!r} not found in manifests under {out_root}")
    # an out_root may mix layouts across fragments (e.g. a resumed run with a
    # changed layout setting): read BOTH and union, instead of silently
    # dropping the packed fragments when any hive fragment exists (ADVICE r01)
    parts = []
    if hive_dirs:
        parts.append(ray.data.read_parquet(hive_dirs))
    if items:
        ds = ray.data.from_items(items)
        n_blocks = max(1, min(len(items), 64))
        parts.append(
            ds.repartition(num_blocks=n_blocks).map_batches(
                read_groups, batch_format="pyarrow", batch_size=None
            )
        )
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def counts_checksum(counts: dict[str, int]) -> str:
    payload = "\n".join(f"{k}\t{v}" for k, v in sorted(counts.items()))
    return hashlib.sha256(payload.encode()).hexdigest()


class RoutedRunner:
    """Checkpointed fragment-by-fragment routed-write runner (SURVEY.md R1+S7).

    **Fused-shard architecture** (chosen by measurement — see BASELINE.md):
    each input shard (one Parquet file) is handled by ONE Ray task that
    reads the shard, applies ``table_fn`` (parse→enrich, a
    ``pa.Table → pa.Table`` transform), groups rows by the sink key and
    writes the shard's routed output directly, returning only the tiny
    per-sink count/index table. Rows never re-enter the object store and
    there is no all-to-all barrier; this removed the busy-CPU inflation
    that capped N→4N scaling at ~0.6 and is ~2.4× faster end-to-end than a
    Dataset-level repartition + hive ``write_parquet``.

    Layouts (see ``stages.route``):

    - ``layout="packed"`` (default, the 100 TB path): one file per shard
      with row groups aligned to sink boundaries; the fragment manifest
      carries a sink → (file, row_group) index and ``read_sink`` uses it to
      reconstruct any sink without touching other sinks' bytes. File count
      is O(shards), independent of sink cardinality.
    - ``layout="hive"``: classic ``role=…/tool=…/template_id=…/`` dirs,
      one file per (shard, sink) — plain layout any engine reads directly.

    **Checkpointing is shard-granular**: each shard task atomically writes
    its data file(s) AND a receipt JSON (``.receipt-sNNNNN.json`` in the
    fragment dir) carrying the shard's sink counts + row-group index. A
    fragment's manifest is assembled from its receipts once all shards have
    one; on resume, fragments with a ``done`` manifest are skipped outright
    and partially-done fragments re-run ONLY their missing shards — a crash
    mid-run never loses completed work, even work the driver hadn't
    observed yet (Ray's streaming iterator drops undelivered results on
    failure, so driver-side streaming commits would). Writes are atomic
    (tmp + rename) with deterministic names, so retried shard tasks
    overwrite idempotently (SURVEY.md §7.4 #4: exact count equality under
    retries).
    """

    def __init__(
        self,
        out_root: str,
        table_fn,
        partition_cols: tuple[str, ...] = ("role", "tool", "template_id"),
        drop_cols: tuple[str, ...] = (),
        layout: str = "packed",
        shards_per_task: int = 8,
    ):
        self.out_root = out_root
        self.table_fn = table_fn
        self.partition_cols = list(partition_cols)
        self.drop_cols = list(drop_cols)
        if layout not in ("packed", "hive"):
            raise ValueError(f"unknown layout {layout!r}")
        self.layout = layout
        self.shards_per_task = shards_per_task
        os.makedirs(out_root, exist_ok=True)

    def frag_dir(self, frag_name: str) -> str:
        return os.path.join(self.out_root, f"frag={frag_name}")

    def _make_shard_fn(self):
        """Build the fused per-shard task fn (read → transform → routed
        write → counts). Each item carries its fragment dir, so ONE
        streaming pipeline serves every fragment; module-level caches inside
        ``table_fn`` survive across tasks on the same worker."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from logparser_ray.stages.route import write_hive_shard, write_packed_shard

        table_fn = self.table_fn
        partition_cols = self.partition_cols
        drop_cols = self.drop_cols
        layout_name = self.layout
        writer = write_packed_shard if self.layout == "packed" else write_hive_shard

        def shard_fn(batch: pa.Table) -> pa.Table:
            import json as _json

            acks = []
            for path, sidx, frag, frag_dir in zip(
                batch["path"].to_pylist(),
                batch["shard"].to_pylist(),
                batch["frag"].to_pylist(),
                batch["frag_dir"].to_pylist(),
            ):
                shard_name = f"pack-s{sidx:05d}"
                tbl = pq.read_table(path)
                out = table_fn(tbl)
                index = writer(out, frag_dir, shard_name, partition_cols, drop_cols)
                fname = (
                    f"{shard_name}.parquet" if writer is write_packed_shard else ""
                )
                # shard-level checkpoint: data file(s) are already on disk,
                # now the receipt commits this shard atomically
                receipt = {
                    "shard": sidx,
                    "input": path,
                    "input_bytes": os.path.getsize(path),
                    "layout": layout_name,
                    "file": fname,
                    "rows_in": len(tbl),
                    "index": [[rel, rg, n] for rel, rg, n in index],
                }
                rpath = os.path.join(frag_dir, f".receipt-s{sidx:05d}.json")
                with open(rpath + ".tmp", "w") as f:
                    _json.dump(receipt, f)
                os.replace(rpath + ".tmp", rpath)
                acks.append((frag, sidx))
            return pa.table(
                {
                    "frag": pa.array([a[0] for a in acks], pa.string()),
                    "shard": pa.array([a[1] for a in acks], pa.int32()),
                }
            )

        return shard_fn

    def _load_receipts(self, frag_name: str) -> dict[int, dict]:
        frag_dir = self.frag_dir(frag_name)
        out: dict[int, dict] = {}
        if not os.path.isdir(frag_dir):
            return out
        for f in os.listdir(frag_dir):
            if f.startswith(".receipt-") and f.endswith(".json"):
                with open(os.path.join(frag_dir, f)) as fh:
                    r = json.load(fh)
                out[int(r["shard"])] = r
        return out

    @staticmethod
    def _clean_shard_outputs(frag_dir: str, receipt: dict) -> None:
        """Remove a stale shard's data file(s) + receipt before re-running it."""
        paths = []
        if receipt.get("file"):
            paths.append(os.path.join(frag_dir, receipt["file"]))
        else:
            shard_file = f"pack-s{int(receipt['shard']):05d}.parquet"
            paths.extend(
                os.path.join(frag_dir, rel, shard_file)
                for rel, _rg, _n in receipt.get("index", [])
            )
        paths.append(
            os.path.join(frag_dir, f".receipt-s{int(receipt['shard']):05d}.json")
        )
        for p in paths:
            if os.path.exists(p):
                os.unlink(p)

    def _receipts_valid(self, frag_name: str, files: list[str]) -> bool:
        receipts = self._load_receipts(frag_name)
        for i, p in enumerate(files):
            r = receipts.get(i)
            if (
                r is None
                or r.get("input") != p
                or r.get("input_bytes") != os.path.getsize(p)
                or r.get("layout") != self.layout
            ):
                return False
        return True

    def run_fragment(self, frag_name: str, input_files: list[str]) -> FragmentManifest:
        """Convenience: run a single fragment (fresh, no resume)."""
        manifests, _ = self.run({frag_name: input_files}, resume=False)
        return manifests[0]

    def run(
        self,
        fragments: dict[str, list[str]],
        resume: bool = True,
    ) -> tuple[list[FragmentManifest], int]:
        """Process ``{frag_name: [input files]}``; returns (manifests, n_skipped).

        All pending shards run in ONE streaming Ray Data pipeline (maximum
        overlap; the streaming executor handles backpressure). Completed
        fragments (manifest present) are skipped when ``resume=True``;
        partially-done fragments re-run only shards without a receipt.
        ``n_skipped`` counts fully-skipped fragments.
        """
        import ray

        t0 = time.perf_counter()
        done: dict[str, FragmentManifest] = {}
        todo: list[str] = []
        for name in sorted(fragments):
            prev = load_manifest(self.out_root, name) if resume else None
            # a manifest only vouches for the EXACT input set it recorded —
            # if the fragment's file list OR any file's bytes changed (per
            # the shard receipts), it must re-run
            if (
                prev is not None
                and prev.status == "done"
                and prev.extra.get("layout") == self.layout
                and prev.input_files == sorted(fragments[name])
                and self._receipts_valid(name, sorted(fragments[name]))
            ):
                done[name] = prev
            else:
                todo.append(name)
        n_skipped = len(fragments) - len(todo)
        if not todo:
            return [done[n] for n in sorted(fragments)], n_skipped

        items = []
        for name in todo:
            frag_dir = self.frag_dir(name)
            files = sorted(fragments[name])
            receipts = self._load_receipts(name) if resume else {}
            if not resume and os.path.exists(frag_dir):
                shutil.rmtree(frag_dir)  # fresh run of this fragment
            os.makedirs(frag_dir, exist_ok=True)
            # receipts beyond the current file list (fragment shrank) are
            # stale — remove their outputs so no orphan rows linger on disk
            for sidx in [s for s in receipts if s >= len(files)]:
                self._clean_shard_outputs(frag_dir, receipts.pop(sidx))
            # drop receipts whose recorded input no longer matches (path,
            # size, or layout changed between runs) — their shard re-runs,
            # after its superseded outputs are removed (deterministic names
            # only overwrite within the SAME layout)
            for i, p in enumerate(files):
                r = receipts.get(i)
                if (
                    r is not None
                    and r.get("input") == p
                    and r.get("input_bytes") == os.path.getsize(p)
                    and r.get("layout") == self.layout
                ):
                    continue
                if r is not None:
                    self._clean_shard_outputs(frag_dir, r)
                items.append(
                    {"path": p, "shard": i, "frag": name, "frag_dir": frag_dir}
                )

        if items:
            # bundle a few shards per task: task dispatch costs ~10-20ms of
            # driver time, so single-shard tasks cap in-flight parallelism
            # on large clusters; a handful per task keeps dispatch off the
            # critical path while staying small enough for the tail
            n_tasks = max(
                1, (len(items) + self.shards_per_task - 1) // self.shards_per_task
            )
            ray.data.from_items(items, override_num_blocks=n_tasks).map_batches(
                self._make_shard_fn(),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            ).materialize()  # acks only; receipts on disk are the source of truth

        for name in todo:
            done[name] = self._commit_fragment(name, sorted(fragments[name]), t0)
        return [done[n] for n in sorted(fragments)], n_skipped

    def _commit_fragment(
        self, frag_name: str, input_files: list[str], t0: float
    ) -> FragmentManifest:
        """Assemble the fragment manifest from its shard receipts."""
        receipts = self._load_receipts(frag_name)
        missing = [i for i in range(len(input_files)) if i not in receipts]
        if missing:
            raise RuntimeError(
                f"fragment {frag_name}: shards {missing} have no receipt"
            )
        counts: dict[str, int] = {}
        sink_index: dict[str, list] = {}
        rows_in = 0
        for i in range(len(input_files)):
            r = receipts[i]
            rows_in += r["rows_in"]
            for rel, rg, n in r["index"]:
                counts[rel] = counts.get(rel, 0) + n
                if r["file"]:
                    sink_index.setdefault(rel, []).append([r["file"], rg, n])
        m = FragmentManifest(
            fragment=frag_name,
            input_files=list(input_files),
            rows_in=rows_in,
            rows_written=sum(counts.values()),
            sinks=len(counts),
            sink_counts_sha256=counts_checksum(counts),
            wall_s=round(time.perf_counter() - t0, 3),
            sink_counts=counts,
            extra={"layout": self.layout, "sink_index": sink_index},
        )
        write_manifest(self.out_root, m)
        return m
