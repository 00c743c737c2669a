"""Hypothesis property tests for the curation/packing/window kernels —
random inputs checked against independent pure-pandas/numpy references.
Kernel-level (no Ray session needed): the distributed operators' exchange
equality is pinned by the equality tests in test_extras/test_curation;
these pin the per-batch math itself under adversarial inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

token = st.text(alphabet="abcxyz019", min_size=1, max_size=4)
doc = st.lists(token, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(doc, min_size=1, max_size=12))
def test_curation_stats_match_python_reference(texts):
    from logparser_ray.stages.curation import curation_stats_batch

    out = curation_stats_batch(pa.table({"text": texts}))
    for i, t in enumerate(texts):
        toks = t.split(" ")
        assert out["n_words"][i].as_py() == len(toks)
        assert out["n_distinct"][i].as_py() == len(set(toks))
        assert out["max_word_n"][i].as_py() == max(
            toks.count(w) for w in set(toks)
        )
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want_bg = max((bigrams.count(g) for g in set(bigrams)), default=0)
        assert out["top_bigram_n"][i].as_py() == want_bg


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=64),
)
def test_pack_scan_matches_exclusive_prefix_rule(counts, budget):
    """The packing rule itself (exclusive prefix // budget), checked via
    the same numpy path add_scan uses."""
    excl = np.concatenate(([0], np.cumsum(np.asarray(counts[:-1], np.int64))))
    seq = excl // budget
    # docs never split: a doc's bin start strictly precedes the next doc's
    assert (np.diff(seq) >= 0).all()
    # bins are dense from 0
    assert seq[0] == 0


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=10_000),  # ts (µs)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=2_000),  # bucket width µs
)
def test_lag_lead_local_plus_fix_algebra(rows, bucket_us):
    """The two-phase lag/lead decomposition equals the single-pass window
    on arbitrary (user, ts) multisets, exercised WITHOUT Ray: run
    local_lag_lead's math per (user, bucket) group and fix_edges' stream
    rule over the edges, then compare to a pandas groupby shift."""
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["bucket"] = df["ts"] // bucket_us

    # phase 1: within (user, bucket) in (ts, id) order
    s = df.sort_values(["user_id", "bucket", "ts", "event_id"], kind="mergesort")
    g = s.groupby(["user_id", "bucket"], sort=False)
    s = s.assign(prev=g["event_id"].shift(1), next=g["event_id"].shift(-1))
    first = s["prev"].isna()
    last = s["next"].isna()

    # phase 2: edge stream per user in (ts, id) order
    edges = s[first | last].sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    same_prev = edges["user_id"].eq(edges["user_id"].shift(1))
    same_next = edges["user_id"].eq(edges["user_id"].shift(-1))
    e = edges.copy()
    is_first = e["prev"].isna()
    is_last = e["next"].isna()
    e.loc[is_first & same_prev, "prev"] = edges["event_id"].shift(1)[
        is_first & same_prev
    ]
    e.loc[is_last & same_next, "next"] = edges["event_id"].shift(-1)[
        is_last & same_next
    ]
    merged = pd.concat([s[~(first | last)], e]).sort_values("event_id")

    want = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    wg = want.groupby("user_id", sort=False)
    want = want.assign(
        prev=wg["event_id"].shift(1), next=wg["event_id"].shift(-1)
    ).sort_values("event_id")

    pd.testing.assert_series_equal(
        merged["prev"].reset_index(drop=True),
        want["prev"].reset_index(drop=True),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        merged["next"].reset_index(drop=True),
        want["next"].reset_index(drop=True),
        check_names=False,
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(doc, min_size=1, max_size=10), st.integers(min_value=1, max_value=5))
def test_ngram_strings_match_python_reference(texts, n):
    from logparser_ray.stages.curation import _ngram_strings

    grams, di = _ngram_strings(pa.array(texts, pa.string()), n)
    want_g, want_d = [], []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for j in range(len(toks) - n + 1):
            want_g.append(" ".join(toks[j : j + n]))
            want_d.append(i)
    assert grams.to_pylist() == want_g
    assert di.tolist() == want_d


# ---------------------------------------------------------------------------
# round-5 pure kernels: funnel cascade + n-gram counter
# ---------------------------------------------------------------------------

_ev_strategy = st.tuples(
    st.integers(min_value=0, max_value=5),          # user
    st.sampled_from(["A", "B", "C", "x"]),          # event type (x = noise)
    st.integers(min_value=0, max_value=30),         # ts (seconds; ties likely)
)


def _funnel_ref(events, stages):
    """Pure-Python strictly-after cascade reference."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, t in events:
        by_user[u].append((t, e))
    counts = [0] * len(stages)
    for u, evs in by_user.items():
        evs.sort()
        prev = float("-inf")
        for i, s in enumerate(stages):
            cand = [t for t, e in evs if e == s and t > prev]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


@settings(max_examples=120, deadline=None)
@given(st.lists(_ev_strategy, min_size=0, max_size=60))
def test_funnel_block_cascade_matches_reference(events):
    import numpy as np
    import pyarrow as pa

    from logparser_ray.stages.funnel import funnel_block_cascade

    stages = ["A", "B", "C"]
    t = pa.table(
        {
            "user_id": pa.array([u for u, _, _ in events], pa.int64()),
            "event_type": pa.array([e for _, e, _ in events]),
            "ts": pa.array(
                np.array([ts * 1_000_000 for _, _, ts in events], dtype="datetime64[us]")
            ),
        }
    )
    out = funnel_block_cascade(t, stages)
    got = out["n_users"].to_pylist() if len(out) else [0, 0, 0]
    assert got == _funnel_ref(events, stages) or (not events and got == [])


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_ngram_counts_batch_matches_reference(texts, n):
    from collections import Counter

    import pyarrow as pa

    from logparser_ray.stages.textstats import ngram_counts_batch

    out = ngram_counts_batch(pa.table({"text": pa.array(texts, pa.string())}), "text", n)
    got = dict(zip(out["gram"].to_pylist(), out["n"].to_pylist()))
    ref = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            ref[" ".join(toks[i : i + n])] += 1
    assert got == dict(ref)
