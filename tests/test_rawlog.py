"""Raw-log file source + CSV-compat sinks (SURVEY.md S1, S2, S4, S5)."""

import os

import pandas as pd
import pytest

from logparser_ray import fixtures
from logparser_ray.sources.rawlog import (
    read_raw_log,
    write_structured_csv,
    write_templates_csv,
)


@pytest.fixture(scope="module")
def parsed(ray_session):
    path, golden = fixtures.ensure_rawlog(n_lines=300, seed=47)
    ds = read_raw_log(path, fixtures.RAWLOG_FORMAT, keep_line=True)
    return ds, golden


def test_rawlog_lineids_and_headers(parsed):
    ds, golden = parsed
    df = ds.to_pandas().sort_values("LineId").reset_index(drop=True)
    gold = golden.to_pandas()
    assert list(df["LineId"]) == list(gold["LineId"])
    ok = ~gold["_quarantined"]
    assert (df.loc[ok, "Level"] == gold.loc[ok, "Level"]).all()
    assert (df.loc[ok, "Content"] == gold.loc[ok, "Content"]).all()
    # malformed lines quarantined, never dropped
    assert df["_quarantined"].sum() == gold["_quarantined"].sum()
    assert len(df) == len(gold)


def test_rawlog_mine_match_csv_roundtrip(ray_session, parsed, tmp_path):
    """Full reference workflow: file → headers → Drain fit on Content →
    match → _structured.csv + _templates.csv."""
    from logparser_ray.stages.mine import fit_bank
    from logparser_ray.stages.parse import match_stage

    ds, _ = parsed
    ok = ds.filter(expr="_quarantined == False")
    bank = fit_bank(
        ok,
        "drain",
        text_col="Content",
        params={"depth": 4, "st": 0.5, "rex": fixtures.RAWLOG_REX},
    )
    matched = match_stage(ok, bank, text_col="Content")
    sp = write_structured_csv(
        matched, str(tmp_path / "x_structured.csv"), headers=["Date", "Time", "Pid", "Level", "Component"]
    )
    tp = write_templates_csv(matched, str(tmp_path / "x_templates.csv"))
    s = pd.read_csv(sp)
    t = pd.read_csv(tp)
    assert {"LineId", "EventId", "EventTemplate", "ParameterList"} <= set(s.columns)
    assert list(t.columns) == ["EventId", "EventTemplate", "Occurrences"]
    assert t["Occurrences"].sum() == len(s)
    assert (t["Occurrences"].values == sorted(t["Occurrences"].values, reverse=True)).all()


def test_read_structured_csv_roundtrip(ray_session, tmp_path):
    """write_structured_csv → read_structured_csv restores native names and
    row identity (the upstream evaluator's CSV input path)."""
    from logparser_ray import fixtures
    from logparser_ray.sources.rawlog import (
        read_raw_log,
        read_structured_csv,
        write_structured_csv,
    )
    from logparser_ray.stages.parse import match_stage

    path, _ = fixtures.ensure_rawlog(n_lines=200)
    parsed = read_raw_log(path, fixtures.RAWLOG_FORMAT)
    ok = parsed.filter(expr="_quarantined == False").drop_columns(["_quarantined"])
    matched = match_stage(ok, fixtures.pattern_bank(), text_col="Content")
    csv_path = str(tmp_path / "x_structured.csv")
    write_structured_csv(matched, csv_path)
    back = read_structured_csv(csv_path).to_pandas()
    orig = matched.to_pandas()
    assert len(back) == len(orig)
    assert {"template_id", "template", "params_literal", "LineId"} <= set(back.columns)
    b = back.sort_values("LineId").reset_index(drop=True)
    o = orig.sort_values("LineId").reset_index(drop=True)
    assert (b["template_id"] == o["template_id"]).all()


def test_jsonl_transcript_source(ray_session, tmp_path):
    """JSONL turns (ISO ts strings + missing tool) land in the canonical
    transcript schema and flow through the flagship parse stage."""
    import json as _json

    from logparser_ray.sources.jsonl import TRANSCRIPT_SCHEMA, read_transcripts_jsonl
    from logparser_ray import fixtures
    from logparser_ray.stages.parse import match_stage

    iso_rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "Session started",
         "ts": "2026-08-17T01:02:03.123456Z"},  # fractional + Z suffix
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "Tool bash returned exit code 0 in 12 ms", "tool": "bash",
         "ts": "2026-08-17T01:02:04+00:00", "extra_key": "dropped"},
    ]
    epoch_rows = [
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "Heartbeat ok",
         "ts": 1765000000},
    ]
    p1, p2 = tmp_path / "iso.jsonl", tmp_path / "epoch.jsonl"
    for p, rows in ((p1, iso_rows), (p2, epoch_rows)):
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
    tbl = read_transcripts_jsonl(str(p1)).to_pandas()
    assert list(tbl.columns) == TRANSCRIPT_SCHEMA.names
    assert len(tbl) == 2
    assert tbl["tool"].isna().sum() == 1  # missing tool stays null
    tbl = tbl.sort_values("turn_idx")  # block delivery order isn't stable
    assert str(tbl["ts"].iloc[0]).startswith("2026-08-17 01:02:03")
    tbl2 = read_transcripts_jsonl(str(p2)).to_pandas()
    assert str(tbl2["ts"].iloc[0]).startswith("2025-12")  # epoch secs decoded
    matched = match_stage(
        read_transcripts_jsonl(str(p1)), fixtures.pattern_bank(), with_params=False
    ).to_pandas()
    assert (matched["template_id"] != "").all()


def test_jsonl_ts_offsets_and_units(ray_session, tmp_path):
    """ISO offsets convert to the UTC instant (ADVICE r02: they were being
    regex-stripped, a 5h error); epoch unit is selectable and fractions
    round rather than truncate."""
    import json as _json

    from logparser_ray.sources.jsonl import read_transcripts_jsonl

    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "u", "text": "a",
         "ts": "2026-08-17T12:00:00+05:00"},   # = 07:00 UTC
        {"conv_id": "c", "turn_idx": 1, "role": "u", "text": "b",
         "ts": "2026-08-17T12:00:00-0130"},    # = 13:30 UTC
        {"conv_id": "c", "turn_idx": 2, "role": "u", "text": "c",
         "ts": "2026-08-17T07:00:00"},         # offset-less = UTC wall time
    ]
    p = tmp_path / "off.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    ts = read_transcripts_jsonl(str(p)).to_pandas().sort_values("turn_idx")["ts"]
    assert str(ts.iloc[0]) == "2026-08-17 07:00:00"
    assert str(ts.iloc[1]) == "2026-08-17 13:30:00"
    assert str(ts.iloc[2]) == "2026-08-17 07:00:00"

    # a 1970s millisecond stamp: auto misreads as seconds, ts_unit='ms' fixes
    ms_rows = [{"conv_id": "c", "turn_idx": 0, "role": "u", "text": "x",
                "ts": 99_999_999_999}]  # 1973-03-03 in millis, < 1e11
    p2 = tmp_path / "ms.jsonl"
    with open(p2, "w") as f:
        f.write(_json.dumps(ms_rows[0]) + "\n")
    auto = read_transcripts_jsonl(str(p2)).to_pandas()["ts"].iloc[0]
    ms = read_transcripts_jsonl(str(p2), ts_unit="ms").to_pandas()["ts"].iloc[0]
    assert auto.year > 5000 and ms.year == 1973

    # fractional epoch seconds round to the nearest microsecond
    fr_rows = [{"conv_id": "c", "turn_idx": 0, "role": "u", "text": "x",
                "ts": 1000000.0000019}]
    p3 = tmp_path / "fr.jsonl"
    with open(p3, "w") as f:
        f.write(_json.dumps(fr_rows[0]) + "\n")
    fr = read_transcripts_jsonl(str(p3), ts_unit="s").to_pandas()["ts"].iloc[0]
    assert fr.microsecond == 2  # 1.9µs rounds up, truncation would give 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ts_unit"):
        read_transcripts_jsonl(str(p3), ts_unit="ns")
