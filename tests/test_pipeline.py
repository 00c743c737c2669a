"""End-to-end flagship conformance tests (FIXTURES.md invariants 1–5)."""

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from logparser_ray import fixtures
from logparser_ray.pipelines import flagship
from logparser_ray.state.manifest import RoutedRunner, load_manifest

N = 2_000
SEED = 42


@pytest.fixture(scope="module")
def golden():
    _, g = fixtures.make_transcripts(n_turns=N, seed=SEED)
    return g


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory, golden):
    out = str(tmp_path_factory.mktemp("flagship_out"))
    shutil.rmtree(out, ignore_errors=True)
    res = flagship.flagship_fixture(n_turns=N, seed=SEED, out_dir=out)
    res["out_dir"] = out
    return res


def test_sink_counts_equal_golden(run, golden):
    got = (
        run["sink_counts"]
        .to_pandas()
        .sort_values(["role", "tool", "template_id"])
        .reset_index(drop=True)
    )
    want = fixtures.golden_sink_counts(golden).to_pandas()
    pd.testing.assert_frame_equal(
        got[["role", "tool", "template_id", "n_turns"]], want, check_dtype=False
    )


def test_count_conservation(run, golden):
    assert run["sink_counts"].to_pandas().n_turns.sum() == golden.num_rows


def test_routed_row_equality_and_text_order(run, golden):
    """Invariants 1+2: each sink partition holds exactly the golden rows, and
    per-turn text is byte-equal under (conv_id, turn_idx) order."""
    files = glob.glob(os.path.join(run["out_dir"], "frag=*", "**", "*.parquet"), recursive=True)
    got = pq.read_table(files).to_pandas()
    gold = golden.to_pandas()
    # routed output carries hive partition cols back as columns
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    gold = gold.sort_values(key).reset_index(drop=True)
    assert len(got) == len(gold)
    assert got["text"].tolist() == gold["text"].tolist()
    merged = got.merge(
        gold[key + ["template_id", "role", "tool"]], on=key, suffixes=("", "_g")
    )
    assert (merged["template_id"].astype(str) == merged["template_id_g"]).all()
    assert (merged["role"].astype(str) == merged["role_g"]).all()
    assert (merged["tool"].astype(str).fillna("") == merged["tool_g"]).all()


def test_enrichment_columns(run):
    files = glob.glob(os.path.join(run["out_dir"], "frag=*", "**", "*.parquet"), recursive=True)
    df = pq.read_table(files).to_pandas()
    assert set(df.loc[df.role.astype(str) == "user", "role_class"]) == {"human"}
    ghost = df[df.tool.astype(str) == "ghost"]
    if len(ghost):
        assert ghost["tool_family"].isna().all(), "absent dim key must yield null"


def test_resume_skips_completed(run, ray_session):
    """Invariant: re-running with resume=True recomputes nothing."""
    res2 = flagship.run_flagship(
        fixtures.ensure_transcripts(N, seed=SEED)[0], out_dir=run["out_dir"], resume=True
    )
    assert res2["skipped"] == len(res2["manifests"])


def test_resume_after_partial_failure(ray_session, tmp_path):
    """Kill-and-resume: delete one fragment's manifest → only it reruns, and
    outputs are identical (idempotent overwrite)."""
    tdir, _ = fixtures.ensure_transcripts(N, seed=7)
    out = str(tmp_path / "out")
    res = flagship.run_flagship(tdir, out_dir=out, resume=True)
    frag = res["manifests"][0].fragment
    sha_before = res["manifests"][0].sink_counts_sha256
    os.unlink(os.path.join(out, "_manifest", f"{frag}.json"))
    res2 = flagship.run_flagship(tdir, out_dir=out, resume=True)
    assert res2["skipped"] == len(res2["manifests"]) - 1
    assert load_manifest(out, frag).sink_counts_sha256 == sha_before


def test_read_sink_packed_roundtrip(run, golden):
    """read_sink reconstructs exactly one sink's rows via the manifest's
    row-group index (packed layout)."""
    from logparser_ray.state.manifest import read_sink

    sc = run["sink_counts"].to_pandas()
    row = sc.sort_values("n_turns", ascending=False).iloc[0]
    ds = read_sink(
        run["out_dir"],
        {"role": row.role, "tool": row.tool, "template_id": row.template_id},
    )
    got = ds.to_pandas()
    assert len(got) == row.n_turns
    assert set(got["role"]) == {row.role}
    assert set(got["template_id"].astype(str)) == {row.template_id}


def test_hive_layout_roundtrip(ray_session, tmp_path):
    """layout='hive' writes per-sink directories with identical counts."""
    import glob as _glob

    import pyarrow.parquet as _pq

    tdir, _ = fixtures.ensure_transcripts(N, seed=11)
    out = str(tmp_path / "hive_out")
    res = flagship.run_flagship(tdir, out_dir=out, resume=False, layout="hive")
    sc = res["sink_counts"].to_pandas()
    row = sc.sort_values("n_turns", ascending=False).iloc[0]
    from urllib.parse import quote

    rel = "/".join(
        f"{c}={quote(str(v), safe='')}"
        for c, v in [("role", row.role), ("tool", row.tool), ("template_id", row.template_id)]
    )
    files = _glob.glob(os.path.join(out, "frag=*", rel, "*.parquet"))
    n = sum(_pq.read_metadata(f).num_rows for f in files)
    assert n == row.n_turns
    # hive drops partition cols from payload; packed keeps them
    cols = _pq.read_schema(files[0]).names
    assert "role" not in cols and "text" in cols


def test_read_sink_mixed_layouts_unions(ray_session, tmp_path):
    """An out_root whose fragments mix packed and hive layouts must read a
    sink from BOTH fragment kinds — previously any hive fragment made
    read_sink silently drop the packed fragments' rows (ADVICE r01). The
    resume receipts invalidate on layout change, so the mix is constructed
    at the writer level."""
    import pyarrow as pa
    from logparser_ray.state.manifest import (
        FragmentManifest,
        counts_checksum,
        read_sink,
        write_manifest,
    )
    from logparser_ray.stages.route import write_hive_shard, write_packed_shard

    out = str(tmp_path / "mixed_out")
    pcols = ["role", "tool", "template_id"]
    tbl = pa.table(
        {
            "role": ["user", "user", "assistant"],
            "tool": ["", "", "bash"],
            "template_id": ["t1", "t1", "t2"],
            "text": ["a", "b", "c"],
        }
    )
    for frag, writer, layout in [
        ("f0", write_packed_shard, "packed"),
        ("f1", write_hive_shard, "hive"),
    ]:
        frag_dir = os.path.join(out, f"frag={frag}")
        index = writer(tbl, frag_dir, "shard-0", pcols)
        counts = {}
        for rel, _rg, n in index:
            counts[rel] = counts.get(rel, 0) + n
        extra = {"layout": layout}
        if layout == "packed":
            sink_index = {}
            for rel, rg, n in index:
                sink_index.setdefault(rel, []).append(["shard-0.parquet", rg, n])
            extra["sink_index"] = sink_index
        write_manifest(
            out,
            FragmentManifest(
                fragment=frag,
                input_files=[],
                rows_in=tbl.num_rows,
                rows_written=tbl.num_rows,
                sinks=len(counts),
                sink_counts_sha256=counts_checksum(counts),
                wall_s=0.0,
                sink_counts=counts,
                extra=extra,
            ),
        )
    got = read_sink(out, {"role": "user", "tool": "", "template_id": "t1"}).to_pandas()
    assert len(got) == 4  # 2 rows from the packed frag + 2 from the hive frag
    assert sorted(got["text"]) == ["a", "a", "b", "b"]


def test_crash_mid_run_keeps_completed_fragments_and_resumes(ray_session, tmp_path):
    """A failure while fragment B is in flight must not lose fragment A's
    streaming-committed manifest; resume then completes only B and the final
    counts equal the golden (exactly-once despite the crash)."""
    import time

    import pyarrow.parquet as _pq
    from logparser_ray.state.manifest import RoutedRunner, list_manifests
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    transcripts, golden = fixtures.make_transcripts(n_turns=2_000, seed=13)
    indir = tmp_path / "in"
    os.makedirs(indir)
    files = []
    step = 500
    for i in range(4):
        part = transcripts.slice(i * step, step).append_column(
            "shard_tag", pd.array([i] * step, dtype="int32[pyarrow]").__arrow_array__()
        )
        p = str(indir / f"part-{i}.parquet")
        _pq.write_table(part, p)
        files.append(p)

    sentinel = str(tmp_path / "fail_on")
    open(sentinel, "w").close()
    inner = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )

    def flaky(tbl, _inner=inner, _sentinel=sentinel):
        tag = tbl["shard_tag"][0].as_py()
        if tag >= 2 and os.path.exists(_sentinel):
            time.sleep(2)  # let fragment A's shards land + commit first
            raise RuntimeError("injected crash")
        return _inner(tbl)

    out = str(tmp_path / "out")
    runner = RoutedRunner(out, flaky, drop_cols=("shard_tag",), shards_per_task=1)
    frags = {"fA": files[:2], "fB": files[2:]}
    with pytest.raises(Exception):
        runner.run(frags, resume=True)
    # completed shards left durable receipts even though no manifest committed
    fa_receipts = [
        f for f in os.listdir(os.path.join(out, "frag=fA")) if f.startswith(".receipt-")
    ]
    assert len(fa_receipts) == 2
    fa_packs = {
        f: os.path.getmtime(os.path.join(out, "frag=fA", f))
        for f in os.listdir(os.path.join(out, "frag=fA"))
        if f.endswith(".parquet")
    }
    assert len(fa_packs) == 2

    os.unlink(sentinel)
    manifests, skipped = runner.run(frags, resume=True)
    assert {m.fragment for m in manifests} == {"fA", "fB"}
    # fA's shards were NOT re-executed: pack files untouched
    for f, mtime in fa_packs.items():
        assert os.path.getmtime(os.path.join(out, "frag=fA", f)) == mtime
    total = sum(m.rows_written for m in manifests)
    assert total == golden.num_rows
    from logparser_ray.state.manifest import manifests_sink_table

    got = (
        manifests_sink_table(manifests)
        .to_pandas()
        .sort_values(["role", "tool", "template_id"])
        .reset_index(drop=True)
    )
    want = fixtures.golden_sink_counts(golden).to_pandas()
    pd.testing.assert_frame_equal(
        got[["role", "tool", "template_id", "n_turns"]], want, check_dtype=False
    )


def test_audit_fragment_validates_and_detects_tamper(run):
    from logparser_ray.state.manifest import audit_fragment, list_manifests

    out = run["out_dir"]
    frags = [m.fragment for m in list_manifests(out)]
    for f in frags:
        res = audit_fragment(out, f)
        assert res["ok"], res
    # tamper: truncate one pack file's claim by editing the manifest
    import json as _json

    mpath = os.path.join(out, "_manifest", f"{frags[0]}.json")
    with open(mpath) as fh:
        doc = _json.load(fh)
    k = next(iter(doc["sink_counts"]))
    doc["sink_counts"][k] += 1
    with open(mpath, "w") as fh:
        _json.dump(doc, fh)
    res = audit_fragment(out, frags[0])
    assert not res["ok"] and res["mismatches"]


def test_salted_route_repartition_colocates_and_conserves(ray_session):
    """R1: the explicit salted hash-partition shuffle — rows conserved, each
    (conv_id) key lands in at most num_salts blocks (hot keys split), and
    unsalted each key lands whole in exactly one block."""
    import ray

    from logparser_ray.stages.route import route_repartition

    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)

    def block_spread(salted):
        ds = ray.data.read_parquet(tdir)
        out = route_repartition(
            ds, keys=["conv_id"], num_blocks=8, salted=salted, num_salts=4
        )
        spread = {}
        total = 0
        for i, ref in enumerate(out.to_arrow_refs()):
            tbl = ray.get(ref)
            total += tbl.num_rows
            for cid in set(tbl["conv_id"].to_pylist()):
                spread.setdefault(cid, set()).add(i)
        return spread, total

    spread_salted, total_salted = block_spread(True)
    assert total_salted == N
    assert max(len(v) for v in spread_salted.values()) <= 4
    # the hot conv (zipf head) actually DOES use multiple blocks when salted
    hot = max(spread_salted, key=lambda c: len(spread_salted[c]))
    assert len(spread_salted[hot]) >= 2

    spread_plain, total_plain = block_spread(False)
    assert total_plain == N
    assert max(len(v) for v in spread_plain.values()) == 1


def test_pipeline_builder_steps_and_metrics(ray_session):
    """§2.8 plugin hook: declarative (name, fn_or_cls, options) steps."""
    import ray

    from logparser_ray.pipelines.builder import Pipeline
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )

    class AddLen:
        def __call__(self, batch):
            import pyarrow.compute as pc

            return batch.append_column("text_len", pc.utf8_length(batch["text"]))

    pipe = Pipeline(
        [
            ("match_enrich", table_fn, {}),
            ("textlen", AddLen, {"concurrency": (1, 2)}),
        ]
    )
    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
    out = pipe(ray.data.read_parquet(tdir)).to_pandas()
    assert len(out) == N
    assert {"template_id", "role_class", "text_len"} <= set(out.columns)
    desc = pipe.describe()
    assert desc[0]["kind"] == "tasks" and desc[1]["kind"] == "actor_pool"


def test_run_pipeline_cli(ray_session, tmp_path):
    """The ray-job-submit entry point runs end to end with audit."""
    import subprocess
    import sys as _sys

    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
    out = str(tmp_path / "cli_out")
    proc = subprocess.run(
        [
            _sys.executable,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "run_pipeline.py"),
            "--input", tdir, "--output", out, "--audit",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    import json as _json

    rep = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["ok"] and rep["metrics"]["rows_in"] == N


def test_resume_detects_changed_inputs(ray_session, tmp_path):
    """A done manifest must not be trusted if the fragment's input set or an
    input file's bytes changed — the fragment re-runs and counts update."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    from logparser_ray.state.manifest import RoutedRunner
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    transcripts, _ = fixtures.make_transcripts(n_turns=1_000, seed=23)
    indir = tmp_path / "in"
    os.makedirs(indir)
    p1, p2 = str(indir / "a.parquet"), str(indir / "b.parquet")
    _pq.write_table(transcripts.slice(0, 500), p1)
    _pq.write_table(transcripts.slice(500, 500), p2)

    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )
    out = str(tmp_path / "out")
    runner = RoutedRunner(out, table_fn)
    m1, sk1 = runner.run({"f": [p1]}, resume=True)
    assert sk1 == 0 and m1[0].rows_written == 500

    # same fragment name, different input set → must re-run, not skip
    m2, sk2 = runner.run({"f": [p1, p2]}, resume=True)
    assert sk2 == 0 and m2[0].rows_written == 1000

    # rewrite one input with different bytes → its shard re-runs on resume
    _pq.write_table(transcripts.slice(0, 400), p1)
    m3, sk3 = runner.run({"f": [p1, p2]}, resume=True)
    assert sk3 == 0 and m3[0].rows_written == 900


def test_flagship_60k_sink_counts_equal_golden(ray_session, tmp_path):
    """Scale-up conformance: the full routed flagship at 60k turns still
    reproduces the golden per-sink aggregate exactly (catches bugs that only
    appear with many shards/fragments)."""
    tdir, _ = fixtures.ensure_transcripts(60_000, seed=SEED)
    _, golden = fixtures.make_transcripts(n_turns=60_000, seed=SEED)
    out = str(tmp_path / "out60k")
    res = flagship.run_flagship(tdir, out_dir=out, resume=False)
    got = (
        res["sink_counts"]
        .to_pandas()
        .sort_values(["role", "tool", "template_id"])
        .reset_index(drop=True)
    )
    want = fixtures.golden_sink_counts(golden).to_pandas()
    pd.testing.assert_frame_equal(
        got[["role", "tool", "template_id", "n_turns"]], want, check_dtype=False
    )
    assert res["metrics"]["rows_in"] == 60_000


def test_flagship_extreme_conv_skew(ray_session, tmp_path):
    """80% of all turns in ONE conversation: the routed pipeline must still
    reproduce exact counts (the fused shard design is skew-immune for the
    write; the combiner absorbs skew for the aggregate)."""
    import numpy as np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    transcripts, golden = fixtures.make_transcripts(n_turns=4_000, seed=31)
    # overwrite conv ids: 80% hot, rest spread
    n = transcripts.num_rows
    rng = np.random.default_rng(5)
    hot = rng.random(n) < 0.8
    cid = np.where(hot, "conv_hot", transcripts["conv_id"].to_numpy(zero_copy_only=False))
    # keep (conv_id, turn_idx) unique: renumber turn_idx within new convs
    import pandas as pd_

    df = pd_.DataFrame({"cid": cid})
    tidx = df.groupby("cid").cumcount().astype("int32")
    skewed = (
        transcripts.set_column(0, "conv_id", _pa.array(cid, _pa.string()))
        .set_column(1, "turn_idx", _pa.array(tidx.to_numpy(), _pa.int32()))
    )
    indir = tmp_path / "in"
    os.makedirs(indir)
    files = []
    for i in range(4):
        p = str(indir / f"p{i}.parquet")
        _pq.write_table(skewed.slice(i * 1000, 1000), p)
        files.append(p)
    out = str(tmp_path / "out")
    res = flagship.run_flagship(str(indir), out_dir=out, resume=False, files_per_fragment=2)
    sc = res["sink_counts"].to_pandas()
    # counts keyed by (role, tool, template_id) are conv-agnostic → must
    # equal the unskewed golden exactly
    want = fixtures.golden_sink_counts(golden).to_pandas()
    got = sc.sort_values(["role", "tool", "template_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["role", "tool", "template_id", "n_turns"]], want, check_dtype=False
    )


def test_error_paths(ray_session, tmp_path):
    import pyarrow as _pa
    import pytest as _pytest

    from logparser_ray.stages.joins import interval_join
    from logparser_ray.state.manifest import read_sink

    iv = _pa.table({"band": ["a", "b"], "lo": [0.0, 5.0], "hi": [6.0, 10.0]})
    import ray

    ds = ray.data.range(3)
    with _pytest.raises(ValueError, match="overlap"):
        interval_join(ds, iv, value_col="id")

    with _pytest.raises(KeyError):
        tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
        out = str(tmp_path / "rs")
        flagship.run_flagship(tdir, out_dir=out, resume=False)
        read_sink(out, {"role": "nope", "tool": "x", "template_id": "y"})


def test_layout_switch_invalidates_resume(ray_session, tmp_path):
    """Switching packed↔hive must re-run fragments, never reuse the other
    layout's receipts/outputs."""
    from logparser_ray.state.manifest import RoutedRunner
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
    files = sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )
    out = str(tmp_path / "out")
    m1, sk1 = RoutedRunner(out, table_fn, layout="packed").run({"f": files}, resume=True)
    assert sk1 == 0 and m1[0].extra["layout"] == "packed"
    m2, sk2 = RoutedRunner(out, table_fn, layout="hive").run({"f": files}, resume=True)
    assert sk2 == 0, "layout change must not be skipped"
    assert m2[0].extra["layout"] == "hive"
    assert m2[0].rows_written == m1[0].rows_written


def test_layout_switch_leaves_no_stale_files(ray_session, tmp_path):
    from logparser_ray.state.manifest import RoutedRunner
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
    files = sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )
    out = str(tmp_path / "out")
    RoutedRunner(out, table_fn, layout="packed").run({"f": files}, resume=True)
    RoutedRunner(out, table_fn, layout="hive").run({"f": files}, resume=True)
    # no top-level pack files may remain after switching to hive
    frag = os.path.join(out, "frag=f")
    stale = [f for f in os.listdir(frag) if f.endswith(".parquet")]
    assert stale == [], stale
    # and total rows across hive files equal the input
    hive_files = glob.glob(os.path.join(frag, "**", "*.parquet"), recursive=True)
    total = sum(pq.read_metadata(f).num_rows for f in hive_files)
    assert total == N


def test_sigkill_resume_exact_counts(ray_session, tmp_path):
    """Hard-kill (SIGKILL) a subprocess running the job CLI mid-write, then
    resume in-process: final per-sink counts must equal the golden exactly,
    and any shard that completed before the kill is not rewritten."""
    import signal
    import subprocess
    import sys as _sys
    import time

    tdir, _ = fixtures.ensure_transcripts(60_000, seed=SEED)
    _, golden = fixtures.make_transcripts(n_turns=60_000, seed=SEED)
    out = str(tmp_path / "out")
    script = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts", "run_pipeline.py"
    )
    proc = subprocess.Popen(
        [_sys.executable, script, "--input", tdir, "--output", out],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    # let it get partway (ray startup ~5s + some shards), then SIGKILL
    deadline = time.time() + 60
    killed_mid_run = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we killed — resume is then a no-op
        receipts = []
        if os.path.isdir(out):
            for dp, _dn, fn in os.walk(out):
                receipts += [f for f in fn if f.startswith(".receipt-")]
        if receipts:
            proc.send_signal(signal.SIGKILL)
            killed_mid_run = True
            break
        time.sleep(0.25)
    proc.wait(timeout=60)

    # only receipt-backed files are guaranteed stable: a data file whose
    # receipt hadn't committed at kill time legitimately re-runs
    import json as _json

    pre = {}
    if os.path.isdir(out):
        for dp, _dn, fn in os.walk(out):
            for f in fn:
                if f.startswith(".receipt-") and f.endswith(".json"):
                    with open(os.path.join(dp, f)) as fh:
                        r = _json.load(fh)
                    if r.get("file"):
                        p = os.path.join(dp, r["file"])
                        if os.path.exists(p):
                            pre[p] = os.path.getmtime(p)

    res = flagship.run_flagship(tdir, out_dir=out, resume=True)
    got = (
        res["sink_counts"]
        .to_pandas()
        .sort_values(["role", "tool", "template_id"])
        .reset_index(drop=True)
    )
    want = fixtures.golden_sink_counts(golden).to_pandas()
    pd.testing.assert_frame_equal(
        got[["role", "tool", "template_id", "n_turns"]], want, check_dtype=False
    )
    if killed_mid_run and pre:
        # completed-before-kill shard files must be reused byte-identically
        reused = [p for p in pre if os.path.exists(p)]
        for p in reused:
            assert os.path.getmtime(p) == pre[p], f"rewritten: {p}"
        assert reused, "expected at least one pre-kill file to survive"


def test_shrunk_fragment_cleans_orphan_shards(ray_session, tmp_path):
    """Removing an input file from a fragment must delete the removed
    shard's outputs — total on-disk rows equal the new input exactly."""
    import pyarrow.parquet as _pq
    from logparser_ray.state.manifest import RoutedRunner
    from logparser_ray.stages.parse import make_match_enrich_table_fn

    transcripts, _ = fixtures.make_transcripts(n_turns=1_000, seed=29)
    indir = tmp_path / "in"
    os.makedirs(indir)
    p1, p2 = str(indir / "a.parquet"), str(indir / "b.parquet")
    _pq.write_table(transcripts.slice(0, 500), p1)
    _pq.write_table(transcripts.slice(500, 500), p2)
    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )
    out = str(tmp_path / "out")
    runner = RoutedRunner(out, table_fn)
    runner.run({"f": [p1, p2]}, resume=True)
    m2, _ = runner.run({"f": [p1]}, resume=True)
    assert m2[0].rows_written == 500
    files = glob.glob(os.path.join(out, "frag=f", "**", "*.parquet"), recursive=True)
    total = sum(_pq.read_metadata(f).num_rows for f in files)
    assert total == 500, f"orphan rows on disk: {total}"


def test_empty_shard_and_empty_batch(ray_session, tmp_path):
    """Zero-row inputs must flow through the writers and matcher cleanly."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from logparser_ray.stages.parse import make_match_enrich_table_fn
    from logparser_ray.stages.route import pack_by_key, write_packed_shard
    from logparser_ray.state.manifest import RoutedRunner

    transcripts, _ = fixtures.make_transcripts(n_turns=100, seed=3)
    empty = transcripts.slice(0, 0)
    # kernel level
    cb = fixtures.pattern_bank().compile()
    tid, _t, params = cb.match_array(empty["text"].combine_chunks())
    assert len(tid) == 0 and len(params) == 0
    st, rels, s, e = pack_by_key(transcripts.slice(0, 0), ["role", "tool"])
    assert rels == []
    idx = write_packed_shard(empty, str(tmp_path), "pack-s00000", ["role", "tool"])
    assert idx == []
    # end to end: a fragment containing one empty file alongside a real one
    indir = tmp_path / "in"
    os.makedirs(indir)
    p1, p2 = str(indir / "a.parquet"), str(indir / "b.parquet")
    _pq.write_table(transcripts, p1)
    _pq.write_table(empty, p2)
    table_fn = make_match_enrich_table_fn(
        fixtures.pattern_bank(), fixtures.roles_dim(), fixtures.tools_dim(),
        with_params=False,
    )
    out = str(tmp_path / "out")
    m, _sk = RoutedRunner(out, table_fn).run({"f": [p1, p2]}, resume=False)
    assert m[0].rows_in == 100 and m[0].rows_written == 100


def test_null_routing_key_routes_as_empty(ray_session, tmp_path):
    import pyarrow as _pa

    from logparser_ray.stages.route import write_packed_shard

    t = _pa.table(
        {
            "role": ["user", None, "user"],
            "tool": [None, "bash", "bash"],
            "x": [1, 2, 3],
        }
    )
    idx = write_packed_shard(t, str(tmp_path), "pack-s00000", ["role", "tool"])
    rels = sorted(r for r, _rg, _n in idx)
    assert rels == ["role=/tool=bash", "role=user/tool=", "role=user/tool=bash"]
    assert sum(n for _r, _rg, n in idx) == 3


def test_flagship_runs_are_deterministic(ray_session, tmp_path):
    """Two fresh runs over the same input produce identical per-fragment
    sink-count checksums — the determinism the exactly-once story rests on."""
    tdir, _ = fixtures.ensure_transcripts(N, seed=SEED)
    shas = []
    for d in ("o1", "o2"):
        res = flagship.run_flagship(tdir, out_dir=str(tmp_path / d), resume=False)
        shas.append({m.fragment: m.sink_counts_sha256 for m in res["manifests"]})
    assert shas[0] == shas[1]


def test_append_only_ingest_reprocesses_only_new_files(ray_session, tmp_path):
    """Appending files that sort after the existing ones must leave earlier
    full fragments untouched on resume (incremental ingest)."""
    import pyarrow.parquet as _pq

    transcripts, _ = fixtures.make_transcripts(n_turns=3_000, seed=37)
    indir = tmp_path / "in"
    os.makedirs(indir)
    for i in range(4):
        _pq.write_table(
            transcripts.slice(i * 500, 500), str(indir / f"part-{i:04d}.parquet")
        )
    out = str(tmp_path / "out")
    res1 = flagship.run_flagship(str(indir), out_dir=out, files_per_fragment=2)
    assert res1["metrics"]["rows_in"] == 2_000

    # append two files sorting AFTER the existing ones
    for i in (4, 5):
        _pq.write_table(
            transcripts.slice(i * 500, 500), str(indir / f"part-{i:04d}.parquet")
        )
    res2 = flagship.run_flagship(str(indir), out_dir=out, files_per_fragment=2)
    assert res2["metrics"]["rows_in"] == 3_000
    assert res2["skipped"] == 2, "both earlier full fragments must be reused"


def test_attach_dim_broadcast_vs_join_fallback(ray_session):
    """attach_dim's two paths (broadcast lookup vs distributed left_outer
    hash join past BROADCAST_MAX_BYTES) must produce identical rows and
    schema, including null left-join semantics for missing dim keys
    (VERDICT r02 #5: size guard on the dim joins)."""
    import ray

    from logparser_ray.stages.joins import attach_dim

    # key 49 is absent from the dim → must surface as null in BOTH paths
    fact = ray.data.from_items([{"k": i % 50, "v": float(i)} for i in range(4000)])
    dim = ray.data.from_items([{"dk": i, "name": f"d{i}"} for i in range(49)])

    kw = dict(fact_key="k", dim_key="dk", dim_cols=["name"])
    bc = attach_dim(fact, dim, **kw).to_pandas()
    jn = attach_dim(fact, dim, dim_bytes_hint=1 << 40, **kw).to_pandas()

    bc = bc.sort_values(["k", "v"]).reset_index(drop=True)
    jn = jn.sort_values(["k", "v"]).reset_index(drop=True)
    assert list(bc.columns) == list(jn.columns) == ["k", "v", "name"]
    pd.testing.assert_frame_equal(bc, jn)
    assert bc[bc["k"] == 49]["name"].isna().all()


def test_join_num_partitions_scales():
    from logparser_ray.stages.joins import join_num_partitions

    small = join_num_partitions(10_000)
    big = join_num_partitions(500_000_000)
    assert 2 <= small <= 64
    assert big > small  # grows with fact size (ADVICE r02: no hardcoded 8)
    assert big <= 512


def test_attach_dim_unknown_size_takes_join_path(ray_session, monkeypatch):
    """When size estimation fails (derived dim whose size_bytes raises) and
    no hint is given, attach_dim must take the distributed-join path — NOT
    broadcast (review r03: a blind driver-side concat of an unknown-size
    dim is the exact OOM hazard the guard exists for). Results must still
    match the broadcast path."""
    import ray

    from logparser_ray.stages.joins import attach_dim

    fact = ray.data.from_items([{"k": i % 20, "v": float(i)} for i in range(1000)])
    dim = ray.data.from_items([{"dk": i, "name": f"d{i}"} for i in range(20)])
    kw = dict(fact_key="k", dim_key="dk", dim_cols=["name"])
    want = attach_dim(fact, dim, **kw).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    calls = {"join": 0}
    real_join = ray.data.Dataset.join

    def counting_join(self, *a, **k):
        calls["join"] += 1
        return real_join(self, *a, **k)

    def boom(self, *a, **k):
        raise RuntimeError("size estimation unavailable for derived datasets")

    monkeypatch.setattr(ray.data.Dataset, "join", counting_join)
    monkeypatch.setattr(ray.data.Dataset, "size_bytes", boom)
    got = attach_dim(fact, dim, **kw).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert calls["join"] == 1, "unknown-size dim must use the distributed join"
    pd.testing.assert_frame_equal(got, want)


def test_transcripts_conv_stats_matches_pandas(ray_session):
    """Per-conversation analytics must equal the plain pandas reference."""
    import pandas as pd
    import pyarrow.parquet as pq

    from logparser_ray import fixtures
    from logparser_ray.queries import q_transcripts_conv_stats

    got = (
        q_transcripts_conv_stats("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    tdir, _ = fixtures.ensure_transcripts(6_000)
    import glob

    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in sorted(glob.glob(f"{tdir}/*.parquet"))]
    )
    ep = df["ts"].astype("int64")
    want = (
        df.assign(
            n_chars=df["text"].str.len().fillna(0).astype("int64"),
            # "no tool" is encoded as '' in the fixture, never null
            is_tool=(df["tool"].fillna("") != "").astype("int64"),
            ep_us=ep,
        )
        .groupby("conv_id", as_index=False)
        .agg(
            n_turns=("text", "size"),
            n_tool_turns=("is_tool", "sum"),
            sum_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
            _first=("ep_us", "min"),
            _last=("ep_us", "max"),
        )
        .assign(span_s=lambda d: (d["_last"] - d["_first"]) // 1_000_000)
        .drop(columns=["_first", "_last"])
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64", errors="ignore"),
        want.astype("int64", errors="ignore"),
        check_dtype=False,
    )
