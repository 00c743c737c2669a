"""Fixture-generator invariants (FIXTURES.md 'Invariants' block)."""

import numpy as np
import pyarrow.compute as pc

from logparser_ray import fixtures


def test_transcripts_schema_and_keys():
    tr, golden = fixtures.make_transcripts(n_turns=2_000, seed=42)
    assert [f.name for f in tr.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(tr.schema.field("turn_idx").type) == "int32"
    assert str(tr.schema.field("ts").type) == "timestamp[us]"
    df = golden.to_pandas()
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    by = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    assert (by["turn_idx"].min() == 0).all()
    assert by["ts"].apply(lambda s: s.is_monotonic_increasing).all()
    assert (df.loc[df.turn_idx == 0, "role"] == "system").all()


def test_golden_agrees_with_matcher():
    tr, golden = fixtures.make_transcripts(n_turns=2_000, seed=7)
    cb = fixtures.pattern_bank().compile()
    tid, tmpl, params = cb.match_array(tr["text"].combine_chunks())
    assert tid.to_pylist() == golden["template_id"].to_pylist()
    assert params.to_pylist() == golden["params"].to_pylist()


def test_determinism_and_skew():
    a, _ = fixtures.make_transcripts(n_turns=3_000, seed=42)
    b, _ = fixtures.make_transcripts(n_turns=3_000, seed=42)
    assert a.equals(b)
    counts = a.to_pandas().conv_id.value_counts()
    assert counts.iloc[0] > 10 * counts.median(), "Zipf skew expected (hot conv_ids)"


def test_sink_counts_conserve_rows():
    _, golden = fixtures.make_transcripts(n_turns=2_000, seed=42)
    sc = fixtures.golden_sink_counts(golden)
    assert pc.sum(sc["n_turns"]).as_py() == golden.num_rows


def test_dims():
    roles = fixtures.roles_dim()
    tools = fixtures.tools_dim()
    assert roles.num_rows == 4
    assert "ghost" not in tools["tool"].to_pylist()


def test_driver_contract_registry_invariants():
    """Every oracle has a query; names are unique and well-formed."""
    from logparser_ray.queries import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)
    assert all(callable(v) for v in QUERIES.values())
    assert all(isinstance(v, str) and "SELECT" in v.upper() for v in ORACLE.values())
