"""Unit tests for the log-format header DSL (SURVEY.md S2)."""

import pyarrow as pa

from logparser_ray.core import HeaderFormat
from logparser_ray import fixtures


def test_compile_hdfs_format():
    hf = HeaderFormat("<Date> <Time> <Pid> <Level> <Component>: <Content>")
    assert hf.headers == ["Date", "Time", "Pid", "Level", "Component", "Content"]
    d = hf.parse_line("2026-01-01 00:00:03 412 INFO dfs.DataNode: hello world")
    assert d == {
        "Date": "2026-01-01",
        "Time": "00:00:03",
        "Pid": "412",
        "Level": "INFO",
        "Component": "dfs.DataNode",
        "Content": "hello world",
    }
    assert hf.parse_line("garbage") is None


def test_multispace_literal_collapses_to_ws():
    hf = HeaderFormat("<A>  <B>")
    assert hf.parse_line("x      y") == {"A": "x", "B": "y"}


def test_vectorized_parse_and_quarantine():
    lines, golden = fixtures.make_rawlog(n_lines=200, seed=43)
    hf = HeaderFormat(fixtures.RAWLOG_FORMAT)
    out = hf.parse_array(pa.array(lines))
    gq = golden["_quarantined"].to_pylist()
    assert out["_quarantined"].to_pylist() == gq
    got_content = out["Content"].to_pylist()
    want_content = golden["Content"].to_pylist()
    for g, w, q in zip(got_content, want_content, gq):
        if not q:
            assert g == w
    assert any(gq), "fixture must contain malformed lines"
