"""Round-5 operators: n-gram top-k, ROLLUP, funnel, grouped corr,
FULL-OUTER aligned counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logparser_ray.stages.aggregate import aligned_counts, rollup_counts
from logparser_ray.stages.funnel import (
    cohort_retention,
    cohort_retention_grouped,
    funnel_counts,
    funnel_counts_grouped,
)
from logparser_ray.stages.sketch import grouped_corr
from logparser_ray.stages.textstats import ngram_counts_batch, ngram_freq_topk


def _ds(tbl):
    import ray

    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------------------
# n-gram top-k
# ---------------------------------------------------------------------------


def _ref_ngrams(texts, n):
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    return c


@pytest.mark.parametrize("n", [2, 3])
def test_ngram_batch_matches_python_reference(ray_session, n):
    texts = [
        "a b c a b",
        "a",  # shorter than any bigram
        "",  # empty text → one empty token
        "x y x y x y",
        "b c a b c",
    ]
    out = ngram_counts_batch(pa.table({"text": texts}), "text", n)
    got = dict(zip(out["gram"].to_pylist(), out["n"].to_pylist()))
    assert got == dict(_ref_ngrams(texts, n))


def test_ngram_never_crosses_doc_boundary(ray_session):
    # "b | c" straddles the two docs — must NOT appear
    out = ngram_counts_batch(pa.table({"text": ["a b", "c d"]}), "text", 2)
    grams = set(out["gram"].to_pylist())
    assert grams == {"a b", "c d"}


def test_ngram_topk_is_block_layout_invariant(ray_session):
    texts = [f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5}" for i in range(200)]
    t = pa.table({"text": texts})
    one = ngram_freq_topk(_ds(t), n=2, k=10).to_pandas()
    many = ngram_freq_topk(_ds(t).repartition(13), n=2, k=10).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    ref = _ref_ngrams(texts, 2)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(map(tuple, one.itertuples(index=False))) == top


def test_ngram_empty_batch(ray_session):
    out = ngram_counts_batch(
        pa.table({"text": pa.array([], pa.string())}), "text", 2
    )
    assert len(out) == 0
    assert out.column_names == ["gram", "n"]


# ---------------------------------------------------------------------------
# ROLLUP
# ---------------------------------------------------------------------------


def test_rollup_counts_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    k1 = rng.choice(["a", "b", "c"], 500).tolist()
    k2 = rng.choice(["x", "y"], 500).tolist()
    v = rng.integers(0, 100, 500).astype(np.int64)
    t = pa.table({"k1": k1, "k2": k2, "v": pa.array(v)})
    out = (
        rollup_counts(_ds(t).repartition(7), ["k1", "k2"], sum_col="v")
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"k1": k1, "k2": k2, "v": v})
    fine = df.groupby(["k1", "k2"], as_index=False).agg(
        n=("v", "size"), v=("v", "sum")
    )
    lvl1 = df.groupby(["k1"], as_index=False).agg(n=("v", "size"), v=("v", "sum"))
    lvl1["k2"] = "*"
    total = pd.DataFrame(
        {"k1": ["*"], "k2": ["*"], "n": [len(df)], "v": [v.sum()]}
    )
    ref = (
        pd.concat([fine, lvl1, total], ignore_index=True)[
            ["k1", "k2", "v", "n"]
        ]
        .astype({"v": "int64", "n": "int64"})
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)


def test_rollup_count_only(ray_session):
    t = pa.table({"k": ["a", "a", "b"]})
    out = rollup_counts(_ds(t), ["k"]).to_pandas().sort_values("k")
    assert dict(zip(out["k"], out["n"])) == {"a": 2, "b": 1, "*": 3}


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _ev(user, etype, s):
    return {"user_id": user, "event_type": etype, "ts": np.datetime64(s, "us")}


def test_funnel_strictly_after_semantics(ray_session):
    rows = [
        # u1 completes A→B→C in order
        _ev(1, "A", "2024-01-01T00:00:00"),
        _ev(1, "B", "2024-01-01T00:01:00"),
        _ev(1, "C", "2024-01-01T00:02:00"),
        # u2: B BEFORE first A — B at stage 2 must not count
        _ev(2, "B", "2024-01-01T00:00:00"),
        _ev(2, "A", "2024-01-01T00:01:00"),
        # u3: A and B simultaneous — 'strictly after' excludes B
        _ev(3, "A", "2024-01-01T00:00:00"),
        _ev(3, "B", "2024-01-01T00:00:00"),
        # u4: A only
        _ev(4, "A", "2024-01-01T00:00:00"),
        # u5: full path but C before B — C must not count
        _ev(5, "A", "2024-01-01T00:00:00"),
        _ev(5, "C", "2024-01-01T00:01:00"),
        _ev(5, "B", "2024-01-01T00:02:00"),
    ]
    t = pa.Table.from_pylist(rows)
    out = funnel_counts(_ds(t).repartition(3), ["A", "B", "C"])
    got = dict(zip(out["stage"], out["n_users"]))
    # the single-exchange path must agree exactly (and on this layout a
    # user's rows straddle repartition inputs, exercising the exchange)
    g = funnel_counts_grouped(_ds(t).repartition(3), ["A", "B", "C"])
    assert dict(zip(g["stage"], g["n_users"])) == got
    # B: u1 (00:01 > 00:00) and u5 (00:02 > 00:00). NOT u2 (their only B
    # precedes their first A) nor u3 (simultaneous is not strictly after).
    # C: u1 only — u5's C (00:01) precedes their B-qualifying time (00:02).
    assert got == {"A": 5, "B": 2, "C": 1}


def test_funnel_empty_stage_downstream(ray_session):
    t = pa.Table.from_pylist([_ev(1, "A", "2024-01-01T00:00:00")])
    out = funnel_counts(_ds(t), ["A", "B", "C"])
    assert out["n_users"].tolist() == [1, 0, 0]
    g = funnel_counts_grouped(_ds(t), ["A", "B", "C"])
    assert g["n_users"].tolist() == [1, 0, 0]


# ---------------------------------------------------------------------------
# grouped corr
# ---------------------------------------------------------------------------


def test_grouped_corr_matches_numpy(ray_session):
    rng = np.random.default_rng(11)
    g = rng.choice(["p", "q"], 400).tolist()
    x = rng.integers(1, 50, 400).astype(np.int64)
    y = (x * 3 + rng.integers(-20, 20, 400)).astype(np.int64)
    t = pa.table({"g": g, "x": pa.array(x), "y": pa.array(y)})
    out = grouped_corr(_ds(t).repartition(5), ["g"], "x", "y")
    for _, r in out.iterrows():
        m = np.asarray(g) == r["g"]
        ref = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(r["corr_scaled"] / 1e6 - ref) < 1e-5


def test_grouped_corr_block_layout_invariant(ray_session):
    rng = np.random.default_rng(3)
    g = rng.choice(["a", "b", "c"], 300).tolist()
    x = rng.integers(0, 10_000_000, 300).astype(np.int64)  # price-cents scale
    y = rng.integers(0, 10_000_000, 300).astype(np.int64)
    t = pa.table({"g": g, "x": pa.array(x), "y": pa.array(y)})
    a = grouped_corr(_ds(t), ["g"], "x", "y")
    b = grouped_corr(_ds(t).repartition(11), ["g"], "x", "y")
    pd.testing.assert_frame_equal(a, b)  # bit-identical, not allclose


def test_grouped_corr_degenerate_group_is_null(ray_session):
    t = pa.table(
        {
            "g": ["z"] * 4,
            "x": pa.array([5, 5, 5, 5], pa.int64()),
            "y": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = grouped_corr(_ds(t), ["g"], "x", "y")
    assert pd.isna(out["corr_scaled"].iloc[0])


def test_grouped_corr_chunking_no_overflow(ray_session):
    # values near the int64-overflow danger zone: x² ≈ 9e15 per element,
    # 3000 rows would overflow a naive full-batch int64 sum of x²·rows
    n = 3000
    x = np.full(n, 95_000_000, dtype=np.int64)
    x[::2] = 94_000_000
    y = np.arange(n, dtype=np.int64)
    t = pa.table({"g": ["h"] * n, "x": pa.array(x), "y": pa.array(y)})
    out = grouped_corr(_ds(t), ["g"], "x", "y")
    ref = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    assert abs(out["corr_scaled"].iloc[0] / 1e6 - ref) < 1e-5


# ---------------------------------------------------------------------------
# aligned counts (FULL OUTER)
# ---------------------------------------------------------------------------


def test_aligned_counts_full_outer(ray_session):
    left = pa.table({"k": ["a", "a", "b", "c"]})
    right = pa.table({"k": ["b", "c", "c", "d"]})
    out = (
        aligned_counts(_ds(left).repartition(2), _ds(right).repartition(3), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        {
            "k": ["a", "b", "c", "d"],
            "n_left": [2, 1, 1, -1],
            "n_right": [-1, 1, 2, 1],
        }
    )
    pd.testing.assert_frame_equal(out, ref)


def test_grouping_sets_and_cube(ray_session):
    rng = np.random.default_rng(5)
    k1 = rng.choice(["a", "b"], 200).tolist()
    k2 = rng.choice(["x", "y", "z"], 200).tolist()
    t = pa.table({"k1": k1, "k2": k2})
    from logparser_ray.stages.aggregate import cube_counts, grouping_sets_counts

    df = pd.DataFrame({"k1": k1, "k2": k2})
    out = (
        cube_counts(_ds(t).repartition(4), ["k1", "k2"])
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["k1", "k2"], as_index=False).size().rename(columns={"size": "n"})
    l1 = df.groupby("k1", as_index=False).size().rename(columns={"size": "n"})
    l1["k2"] = "*"
    l2 = df.groupby("k2", as_index=False).size().rename(columns={"size": "n"})
    l2["k1"] = "*"
    tot = pd.DataFrame({"k1": ["*"], "k2": ["*"], "n": [len(df)]})
    ref = (
        pd.concat([fine, l1, l2, tot], ignore_index=True)[["k1", "k2", "n"]]
        .astype({"n": "int64"})
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)

    # the set rollup can't express: only ('*', k2)
    only = grouping_sets_counts(_ds(t), ["k1", "k2"], [["k2"]]).to_pandas()
    assert set(only["k1"]) == {"*"}
    assert dict(zip(only["k2"], only["n"])) == dict(zip(l2["k2"], l2["n"]))

    with pytest.raises(ValueError, match="unknown keys"):
        grouping_sets_counts(_ds(t), ["k1"], [["nope"]])


def test_grouped_corr_rejects_overflowing_magnitudes(ray_session):
    big = np.array([1 << 31, 5], dtype=np.int64)
    t = pa.table({"g": ["a", "a"], "x": pa.array(big), "y": pa.array(big)})
    with pytest.raises(Exception, match="2\\^31"):
        grouped_corr(_ds(t), ["g"], "x", "y")


@pytest.mark.parametrize("impl", [cohort_retention, cohort_retention_grouped])
def test_cohort_retention_multi_cohort(ray_session, impl):
    rows = [
        # u1: first week W0 (Mon 2024-01-01), returns W1 and W3
        _ev(1, "x", "2024-01-02T10:00:00"),
        _ev(1, "x", "2024-01-10T10:00:00"),
        _ev(1, "x", "2024-01-24T10:00:00"),
        # u2: cohort W0, active only W0 (two events — distinct fold)
        _ev(2, "x", "2024-01-03T00:00:00"),
        _ev(2, "x", "2024-01-06T00:00:00"),
        # u3: cohort W1, returns W2
        _ev(3, "x", "2024-01-08T00:00:00"),
        _ev(3, "x", "2024-01-15T00:00:00"),
    ]
    t = pa.Table.from_pylist(rows)
    res = impl(_ds(t).repartition(3))
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    out = res.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    ref = pd.DataFrame(
        {
            "cohort_week": ["2024-01-01"] * 3 + ["2024-01-08"] * 2,
            "week_offset": [0, 1, 3, 0, 1],
            "n_users": [2, 1, 1, 1, 1],
        }
    )
    got = out.astype({"week_offset": "int64", "n_users": "int64"})
    pd.testing.assert_frame_equal(got, ref.astype({"week_offset": "int64", "n_users": "int64"}))


def test_funnel_user_times_grouped_matches_multipass(ray_session):
    from logparser_ray.stages.funnel import (
        funnel_user_times,
        funnel_user_times_grouped,
    )

    rows = [
        _ev(1, "A", "2024-01-01T00:00:00"),
        _ev(1, "B", "2024-01-01T00:01:00"),
        _ev(1, "C", "2024-01-01T00:02:00"),
        _ev(2, "A", "2024-01-01T00:00:30"),
        _ev(2, "B", "2024-01-01T00:00:10"),  # B before A → stops at A
        _ev(3, "A", "2024-01-01T00:00:00"),
        _ev(3, "B", "2024-01-01T00:05:00"),
        _ev(3, "B", "2024-01-01T00:04:00"),  # earliest qualifying B wins
    ]
    t = pa.Table.from_pylist(rows)
    stages = ["A", "B", "C"]
    grouped = (
        funnel_user_times_grouped(_ds(t).repartition(3), stages)
        .to_pandas()
        .sort_values(["stage_idx", "user_id"])
        .reset_index(drop=True)
    )
    parts = []
    for i, (_, d) in enumerate(funnel_user_times(_ds(t), stages)):
        df = d.to_pandas().rename(columns={"t_stage": "t"})
        df["stage_idx"] = i
        parts.append(df[["user_id", "stage_idx", "t"]])
    ref = (
        pd.concat(parts, ignore_index=True)
        .sort_values(["stage_idx", "user_id"])
        .reset_index(drop=True)
    )
    assert grouped["user_id"].tolist() == ref["user_id"].tolist()
    assert grouped["stage_idx"].tolist() == ref["stage_idx"].tolist()
    assert (
        pd.to_datetime(grouped["t_stage"]).tolist()
        == pd.to_datetime(ref["t"]).tolist()
    )


def test_rollup_rejects_non_string_keys(ray_session):
    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="string key"):
        rollup_counts(_ds(t), ["k"]).to_pandas()


def test_ngram_rejects_n_zero(ray_session):
    with pytest.raises(ValueError, match=">= 1"):
        ngram_counts_batch(pa.table({"text": ["a b"]}), "text", 0)


def test_funnel_kernel_rejects_bad_emit(ray_session):
    from logparser_ray.stages.funnel import funnel_block_cascade

    t = pa.Table.from_pylist([_ev(1, "A", "2024-01-01T00:00:00")])
    with pytest.raises(ValueError, match="emit"):
        funnel_block_cascade(t, ["A"], emit="nope")
