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
