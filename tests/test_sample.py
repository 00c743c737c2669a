"""Tests for the no-shuffle deterministic sampler (stages/sample.py) and the
round-3 rewires that consume it (_sample_texts, kmeans_fit) plus the
vectorized shingle hashing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logparser_ray.stages import dedup
from logparser_ray.stages.sample import sample_min_k_by_hash


def _items(texts):
    import ray

    return ray.data.from_items([{"text": t} for t in texts])


def test_sampler_matches_global_hash_sort(ray_session):
    """The combiner sample must be byte-identical to what an explicit global
    DISTINCT + sort by (keyed hash, value) would select (the miner sampler
    draws distinct shapes — a row draw admits whole duplicate groups per
    hash and starves template coverage)."""
    from logparser_ray.stages.mine import _sample_texts

    texts = [f"msg {i % 7} value {i * 13 % 101}" for i in range(5000)]
    got = _sample_texts(_items(texts).repartition(13), "text", 200, 42)
    h = pd.util.hash_array(np.asarray(texts, dtype=object), hash_key=f"{42:016d}")
    want = (
        pd.DataFrame({"text": texts, "h": h})
        .drop_duplicates("text")
        .sort_values(["h", "text"], kind="mergesort")
        .head(200)["text"]
        .tolist()
    )
    assert got == want


def test_distinct_sampler_counts_exact_when_keys_survive(ray_session):
    """_n counts are exact occurrence counts when n covers every distinct
    key (each block's local top-k keeps all its keys)."""
    texts = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    out = sample_min_k_by_hash(
        _items(texts).repartition(4), cols=["text"], key_col="text", n=10,
        seed=1, distinct=True,
    )
    got = dict(zip(out["text"], out["_n"]))
    assert got == {"a": 5, "b": 3, "c": 2}


def test_sampler_partitioning_independent(ray_session):
    from logparser_ray.stages.mine import _sample_texts

    texts = [f"row {i} {'x' * (i % 5)}" for i in range(3000)]
    a = _sample_texts(_items(texts).repartition(2), "text", 150, 7)
    b = _sample_texts(_items(texts).repartition(17), "text", 150, 7)
    assert a == b


def test_sampler_never_global_sorts(ray_session, monkeypatch):
    """The point of the rewrite: sampling must not invoke Dataset.sort (a
    corpus-wide all-to-all at 10¹² rows)."""
    import ray

    def boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("global sort invoked by the sampler")

    monkeypatch.setattr(ray.data.Dataset, "sort", boom)
    out = sample_min_k_by_hash(
        _items([f"t {i}" for i in range(1000)]),
        cols=["text"],
        key_col="text",
        n=100,
        seed=3,
    )
    assert len(out) == 100


def test_kmeans_fit_no_materialize_no_sort(ray_session, monkeypatch):
    """The IVF quantizer fit must stream: no full-projection materialize()
    and no global sort anywhere in its lineage."""
    import ray

    from logparser_ray.stages.similarity import kmeans_fit

    def boom_sort(self, *a, **k):  # pragma: no cover
        raise AssertionError("Dataset.sort invoked by kmeans_fit")

    def boom_mat(self, *a, **k):  # pragma: no cover
        raise AssertionError("Dataset.materialize invoked by kmeans_fit")

    monkeypatch.setattr(ray.data.Dataset, "sort", boom_sort)
    monkeypatch.setattr(ray.data.Dataset, "materialize", boom_mat)
    rng = np.random.default_rng(5)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": rng.standard_normal(8).tolist()} for i in range(200)]
    )
    c = kmeans_fit(ds, k=6, iters=4)
    assert c.shape == (6, 8)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)


def test_kmeans_fit_bounded_sample_still_deterministic(ray_session):
    import ray

    from logparser_ray.stages.similarity import kmeans_fit

    rng = np.random.default_rng(9)
    rows = [
        {"vec_id": i, "embedding": rng.standard_normal(8).tolist()} for i in range(500)
    ]
    ds = ray.data.from_items(rows)
    c1 = kmeans_fit(ds, k=4, iters=6, n_fit=128)
    c2 = kmeans_fit(ray.data.from_items(rows).repartition(9), k=4, iters=6, n_fit=128)
    assert np.allclose(c1, c2)


def test_shingle_hash_jaccard_equals_string_jaccard():
    """The Horner rolling-combine shingle hashes must preserve set semantics:
    Jaccard over hashed shingle sets == Jaccard over the string k-gram sets
    (the regression pin for the round-3 vectorization)."""
    rng = np.random.default_rng(0)
    vocab = ["a", "bb", "ccc", "dd", "e", "ff"]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))).tolist())
        for _ in range(80)
    ]
    docs += ["", "single", "two words", "a b c d e"]
    k = 3

    def string_shingles(text):
        toks = text.split(" ")
        if len(toks) < k:  # whole-doc shingle, mirroring _shingle_hashes
            return {tuple(toks)}
        return set(zip(*[toks[m:] for m in range(k)]))

    hs = dedup._shingle_hashes(pa.array(docs, pa.string()), k)
    assert len(hs) == len(docs)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            got = dedup._jaccard_packed(
                np.unique(hs[i]).astype("<u8").tobytes(),
                np.unique(hs[j]).astype("<u8").tobytes(),
            )
            sa, sb = string_shingles(docs[i]), string_shingles(docs[j])
            want = len(sa & sb) / len(sa | sb)
            assert got == pytest.approx(want, abs=1e-12), (i, j, docs[i], docs[j])


def test_shingle_hashes_short_and_empty_docs():
    """Docs shorter than k collapse to one whole-doc shingle; '' and a
    1-token doc behave like their split() token lists."""
    hs = dedup._shingle_hashes(pa.array(["", "one", "one two", "x y z w"], pa.string()), 3)
    assert [len(h) for h in hs] == [1, 1, 1, 2]
    # distinct short docs get distinct shingles
    assert hs[1][0] != hs[2][0]


def test_minhash_n_docs_hint_same_pairs(ray_session):
    """Passing the n_docs hint (derived-dataset path) must not change results."""
    import ray

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base}] + [
        {"doc_id": i, "text": f"doc {i} filler words here {i}"} for i in range(2, 30)
    ]
    ds = ray.data.from_items(rows)
    a = dedup.minhash_near_dupes(ds, k=2, bands=8, rows_per_band=2, threshold=0.5)
    b = dedup.minhash_near_dupes(
        ds, k=2, bands=8, rows_per_band=2, threshold=0.5, n_docs=len(rows)
    )
    pd.testing.assert_frame_equal(a, b)


def test_sampler_skips_null_keys(ray_session):
    """Null key values are excluded from the draw (review r03: None broke
    the (hash, key) lexsort against str keys with a TypeError that failed
    the whole Ray job; a null text carries no signal for miner fits)."""
    import ray

    rows = [{"text": t} for t in ["a b", None, "x y", "c d", None]]
    out = sample_min_k_by_hash(
        ray.data.from_items(rows), cols=["text"], key_col="text", n=10, seed=0
    )
    assert sorted(out["text"]) == ["a b", "c d", "x y"]


def test_sampler_arrow_mode_matches_pandas_mode(ray_session):
    """as_arrow=True returns the same rows in the same order, with list
    payload columns staying Arrow (no Python-object round-trip)."""
    import ray

    rows = [
        {"vec_id": i, "embedding": [float(i), float(i * 2)]} for i in range(300)
    ]
    ds = ray.data.from_items(rows).repartition(5)
    kw = dict(cols=["vec_id", "embedding"], key_col="vec_id", n=50, seed=11)
    pd_out = sample_min_k_by_hash(ds, **kw)
    ar_out = sample_min_k_by_hash(ds, as_arrow=True, **kw)
    assert isinstance(ar_out, pa.Table)
    assert pa.types.is_list(ar_out["embedding"].type) or pa.types.is_fixed_size_list(
        ar_out["embedding"].type
    )
    assert ar_out["vec_id"].to_pylist() == pd_out["vec_id"].tolist()
    assert ar_out["embedding"].to_pylist() == [list(e) for e in pd_out["embedding"]]


def test_stratified_sample_matches_reference_and_partitioning(ray_session):
    """Per-group min-(md5, tiebreak) draw must equal the plain pandas
    reference and be independent of block structure; groups smaller than
    n_per_group return exhaustively."""
    import hashlib

    import ray

    from logparser_ray.stages.sample import sample_stratified

    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr", "tiny"][i % 4 if i < 396 else 3], "text": f"doc number {i} body {i % 13}"}
        for i in range(400)
    ]
    # make 'tiny' an under-filled stratum: only ids 396..399 plus i%4==3
    df = pd.DataFrame(rows)
    want = (
        df.assign(_m=[hashlib.md5(t.encode()).hexdigest() for t in df["text"]])
        .sort_values(["lang", "_m", "doc_id"], kind="mergesort")
        .groupby("lang", sort=False)
        .head(30)
        .drop(columns=["_m", "text"])
        .sort_values(["lang", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    for blocks in (3, 11):
        ds = ray.data.from_items(rows).repartition(blocks)
        got = sample_stratified(
            ds, group_col="lang", key_col="text", tiebreak_col="doc_id",
            n_per_group=30,
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "lang"]], want[["doc_id", "lang"]]
        )
    # every stratum is either filled to 30 or exhausted
    sizes = want.groupby("lang").size()
    assert (sizes <= 30).all() and sizes.max() == 30


def test_sampler_plan_has_no_all_to_all(ray_session):
    """The min-k sampler must never plan a global sort/shuffle (the
    round-2 scale-killer it replaced): assert on the executed plan."""
    import ray

    from logparser_ray.stages.sample import sample_min_k_by_hash

    ds = ray.data.from_items(
        [{"text": f"t{i % 40}"} for i in range(2_000)]
    ).repartition(4)
    # run the sampler, then inspect the stats of the LAST executed dataset
    _ = sample_min_k_by_hash(
        ds, cols=["text"], key_col="text", n=25, distinct=True
    )
    # the round-2 scale-killer was a global .sort(); the fixture's own
    # repartition is expected — assert specifically that no Sort ran
    stats = ds.stats()
    assert "sort" not in stats.lower(), stats


def test_pack_sequences_plan_has_no_shuffle(ray_session):
    """pack_sequences is a prefix scan over block refs — no exchange."""
    import ray

    from logparser_ray.stages.pack import pack_sequences

    ds = ray.data.from_items(
        [{"doc_id": i, "text": "a b c"} for i in range(500)]
    )
    out = pack_sequences(ds, budget=16)
    stats = out.stats()
    assert "sort" not in stats.lower()
    assert "shuffle" not in stats.lower()


def test_split_by_hash_deterministic_and_proportional(ray_session):
    """Deterministic splitting: exact md5-rule parity, label fractions near
    the ratios, null keys land in the LAST label (SQL ELSE parity), salt
    re-draws, and block layout changes nothing."""
    import hashlib

    import pyarrow as pa
    import ray

    from logparser_ray.stages.sample import split_by_hash

    texts = [f"document number {i} text" for i in range(2_000)] + [None]
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        got = (
            split_by_hash(ds, key_col="text", ratios=ratios, salt="s")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got["split"].tolist())
    assert outs[0] == outs[1]
    got = outs[0]
    # exact rule parity per row
    t1 = format(int(0.8 * (1 << 32)), "08x")
    t2 = format(int(0.9 * (1 << 32)), "08x")
    for txt, lbl in zip(texts, got):
        if txt is None:
            assert lbl == "test"  # ELSE branch
            continue
        p = hashlib.md5((txt + "s").encode()).hexdigest()[:8]
        want = "train" if p < t1 else ("val" if p < t2 else "test")
        assert lbl == want
    frac = pd.Series(got[:-1]).value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.04
    assert abs(frac["val"] - 0.1) < 0.03
    # a different salt re-draws the assignment
    ds = ray.data.from_arrow(t)
    got2 = (
        split_by_hash(ds, key_col="text", ratios=ratios, salt="other")
        .to_pandas()
        .sort_values("doc_id")["split"]
        .tolist()
    )
    assert got2 != got
