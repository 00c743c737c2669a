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


def test_apache_style_format():
    """Bracketed fields + literal punctuation (loghub Apache shape)."""
    hf = HeaderFormat("[<Time>] [<Level>] <Content>")
    d = hf.parse_line("[Sun Aug 17 04:05:06 2026] [error] mod_jk child init 1 -2")
    assert d == {
        "Time": "Sun Aug 17 04:05:06 2026",
        "Level": "error",
        "Content": "mod_jk child init 1 -2",
    }


def test_syslog_style_format():
    """Month/day/time + host + process[pid] (loghub Linux/OpenSSH shape)."""
    hf = HeaderFormat("<Month> <Date> <Time> <Host> <Component>(<PID>): <Content>")
    d = hf.parse_line(
        "Jun 14 15:16:01 combo sshd(pam_unix)(19939): session opened for user test"
    )
    assert d is not None
    assert d["Month"] == "Jun" and d["Host"] == "combo"
    assert d["Content"] == "session opened for user test"


def test_windows_style_format():
    """Comma-separated CBS-style fields (loghub Windows shape)."""
    hf = HeaderFormat("<Date> <Time>, <Level>                  <Component>    <Content>")
    d = hf.parse_line(
        "2016-09-28 04:30:30, Info                  CBS    Loaded Servicing Stack"
    )
    assert d is not None
    assert d["Level"] == "Info" and d["Component"] == "CBS"
    assert d["Content"] == "Loaded Servicing Stack"


def test_format_roundtrip_many_shapes():
    """Property: render(fields) then parse returns the fields, across format
    shapes with different separators."""
    shapes = [
        "<A> <B>: <C>",
        "[<A>] <B> - <C>",
        "<A>|<B>|<C>",
        "<A> (<B>) <C>",
    ]
    for fmt in shapes:
        hf = HeaderFormat(fmt)
        rendered = (
            fmt.replace("<A>", "x1").replace("<B>", "y2").replace("<C>", "z 3 w")
        )
        d = hf.parse_line(rendered)
        assert d == {"A": "x1", "B": "y2", "C": "z 3 w"}, fmt
