"""Drop-in upstream API façade tests (SURVEY.md §2.8): upstream demo-script
shape, upstream parameter names, upstream output artifacts."""

import os

import pandas as pd
import pytest

from logparser_ray import fixtures


@pytest.fixture(scope="module")
def logdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    lines, _ = fixtures.make_rawlog(n_lines=300, seed=51)
    with open(d / "app.log", "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(d)


def test_drain_compat_demo_shape(ray_session, logdir, tmp_path):
    from logparser_ray.compat import Drain

    parser = Drain.LogParser(
        fixtures.RAWLOG_FORMAT,
        logdir,
        str(tmp_path),
        rex=fixtures.RAWLOG_REX,
        depth=4,
        st=0.5,
    )
    parser.parse("app.log")
    s = pd.read_csv(tmp_path / "app.log_structured.csv")
    t = pd.read_csv(tmp_path / "app.log_templates.csv")
    assert {"LineId", "Date", "Time", "Level", "Content", "EventId", "EventTemplate"} <= set(
        s.columns
    )
    # Content is the ORIGINAL raw content (rex only feeds the miner)
    assert s["Content"].str.contains("blk_").any()
    assert not s["Content"].str.contains("<\\*>", regex=True).any()
    assert list(t.columns) == ["EventId", "EventTemplate", "Occurrences"]
    assert t["Occurrences"].sum() == len(s)
    # the rex-preprocessed corpus has 4 true shapes; Drain should find few
    assert 1 <= len(t) <= 12
    # EventIds consistent between the two files
    assert set(s["EventId"]) == set(t["EventId"])


@pytest.mark.parametrize(
    "algo,kwargs",
    [
        ("Spell", {"tau": 0.55}),
        ("IPLoM", {"CT": 0.35, "lowerBound": 0.25}),
        ("SLCT", {"support": 10}),
        ("LogCluster", {"rsupport": 3}),
        ("SHISO", {"maxChildNum": 8, "mergeThreshold": 0.15}),
        ("LenMa", {"threshold": 0.9}),
        ("LogMine", {"max_dist": 0.3}),
        ("Logram", {"doubleThreshold": 10}),
        ("LFA", {}),
        ("LogSig", {"groupNum": 8}),
        ("LKE", {"split_threshold": 0.3}),
        ("AEL", {"mergePercent": 0.1}),
        ("POP", {"CT": 0.35, "lowerBound": 0.25}),
    ],
)
def test_other_algos_compat(ray_session, logdir, tmp_path, algo, kwargs):
    import logparser_ray.compat as compat

    mod = getattr(compat, algo)
    parser = mod.LogParser(
        fixtures.RAWLOG_FORMAT, logdir, str(tmp_path / algo),
        rex=fixtures.RAWLOG_REX, **kwargs,
    )
    parser.parse("app.log")
    s = pd.read_csv(tmp_path / algo / "app.log_structured.csv")
    t = pd.read_csv(tmp_path / algo / "app.log_templates.csv")
    assert len(s) > 0 and len(t) >= 1
    assert t["Occurrences"].sum() == len(s)


def test_drain_compat_default_rex(ray_session, logdir, tmp_path):
    """Upstream default rex=[] must work: no preprocessing, Content feeds
    the miner directly (this path crashed before — ADVICE r01)."""
    from logparser_ray.compat import Drain

    parser = Drain.LogParser(fixtures.RAWLOG_FORMAT, logdir, str(tmp_path))
    parser.parse("app.log")
    s = pd.read_csv(tmp_path / "app.log_structured.csv")
    t = pd.read_csv(tmp_path / "app.log_templates.csv")
    assert len(s) > 0 and len(t) >= 1
    assert t["Occurrences"].sum() == len(s)
    assert {"LineId", "Content", "EventId", "EventTemplate"} <= set(s.columns)


def test_molfi_unavailable(logdir, tmp_path):
    from logparser_ray.compat import MoLFI

    with pytest.raises(NotImplementedError):
        MoLFI.LogParser(fixtures.RAWLOG_FORMAT, logdir, str(tmp_path))


def test_syslog_format_end_to_end(ray_session, tmp_path):
    """A third log FORMAT (RFC3164 syslog-style: 'Mon DD HH:MM:SS host
    proc[pid]: msg') through the compat stack — host and the proc[pid]
    token as separate header fields."""
    import numpy as np

    rng = np.random.default_rng(73)
    hosts = ["web01", "web02", "db01"]
    shapes = [
        ("session opened for user u{}", (500,)),
        ("connection from 10.0.0.{} port {}", (255, 65000)),
        ("segfault at {} ip {} sp {}", (9999, 9999, 9999)),
    ]
    lines = []
    for i in range(300):
        tmpl, maxes = shapes[rng.integers(0, len(shapes))]
        content = tmpl.format(*[int(rng.integers(1, m)) for m in maxes])
        lines.append(
            f"Aug 17 04:{i % 60:02d}:{(i * 7) % 60:02d} "
            f"{hosts[rng.integers(0, 3)]} app[{int(rng.integers(100, 999))}]: {content}"
        )
    d = tmp_path / "logs"
    os.makedirs(d)
    with open(d / "sys.log", "w") as f:
        f.write("\n".join(lines) + "\n")

    from logparser_ray.compat import Drain

    parser = Drain.LogParser(
        "<Month> <Day> <Time> <Host> <Proc>: <Content>",
        str(d),
        str(tmp_path / "out"),
        rex=[r"\d+"],
        depth=4,
        st=0.5,
    )
    parser.parse("sys.log")
    s = pd.read_csv(tmp_path / "out" / "sys.log_structured.csv")
    t = pd.read_csv(tmp_path / "out" / "sys.log_templates.csv")
    assert len(s) == 300
    assert set(s["Host"]) <= set(hosts)
    assert 3 <= len(t) <= 6
    assert t["Occurrences"].sum() == 300


def test_apache_format_end_to_end(ray_session, tmp_path):
    """A second log FORMAT (bracketed apache-style) through the whole compat
    stack — proving the header DSL variety works end to end, not just at
    parse_line level."""
    import numpy as np

    rng = np.random.default_rng(61)
    levels = ["notice", "error", "warn"]
    shapes = [
        ("jk2_init() Found child {} in scoreboard slot {}", (9999, 50)),
        ("workerEnv.init() ok /etc/httpd/conf/workers{}.properties", (9,)),
        ("mod_jk child workerEnv in error state {}", (11,)),
    ]
    lines = []
    for i in range(300):
        tmpl, maxes = shapes[rng.integers(0, len(shapes))]
        vals = [int(rng.integers(1, m)) for m in maxes]
        content = tmpl.format(*vals)
        lines.append(f"[Sun Aug 17 04:05:{i % 60:02d} 2026] [{levels[rng.integers(0,3)]}] {content}")
    d = tmp_path / "logs"
    os.makedirs(d)
    with open(d / "apache.log", "w") as f:
        f.write("\n".join(lines) + "\n")

    from logparser_ray.compat import Drain

    parser = Drain.LogParser(
        "[<Time>] [<Level>] <Content>",
        str(d),
        str(tmp_path / "out"),
        rex=[r"\d+"],
        depth=4,
        st=0.5,
    )
    parser.parse("apache.log")
    s = pd.read_csv(tmp_path / "out" / "apache.log_structured.csv")
    t = pd.read_csv(tmp_path / "out" / "apache.log_templates.csv")
    assert len(s) == 300
    assert set(s["Level"]) <= {"notice", "error", "warn"}
    # three content shapes → three-ish templates (rex folds the numbers)
    assert 3 <= len(t) <= 6
    assert t["Occurrences"].sum() == 300
