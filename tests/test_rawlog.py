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
