"""Tests for dedup / similarity / textstats / multimodal / evaluator stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logparser_ray import fixtures
from logparser_ray.core.evaluator import evaluate_pandas
from logparser_ray.stages import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 0
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine ten",  # exact dup of 2
        "completely different words appear here now okay yes",
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": base})
    return ray.data.from_arrow(t)


def test_exact_dedup(docs_with_dups):
    out = dedup.exact_dedup_representatives(docs_with_dups).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 4  # 5 docs, one exact dup collapsed
    assert out.loc[out.doc_id == 2, "n_copies"].iloc[0] == 2


def test_minhash_finds_planted_near_dup(docs_with_dups):
    pairs = dedup.minhash_near_dupes(docs_with_dups, k=2, bands=16, rows_per_band=2, threshold=0.5)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got, f"planted near-dup not found: {got}"
    assert (2, 3) in got
    row = pairs[(pairs.a == 2) & (pairs.b == 3)].iloc[0]
    assert row["jaccard"] == 1.0


def test_simhash_near_dupes_exact_vs_brute(ray_session):
    """Banded SimHash near-dup must return EXACTLY the pairs with Hamming
    ≤ max_hamming (pigeonhole recall 1) — checked against a brute-force
    all-pairs pass over the same signatures."""
    import itertools

    import numpy as np
    import ray

    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(80)]
    # plant near-identical docs (1-token edits → small Hamming distance)
    texts[50] = texts[10].replace("alpha", "beta", 1)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)

    got = dedup.simhash_near_dupes(ds, max_hamming=3, bands=4)
    got_pairs = set(zip(got["a"], got["b"]))

    sigs = (
        dedup.SimHasher()(t)["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    )
    want = set()
    for i, j in itertools.combinations(range(len(texts)), 2):
        if int(dedup._popcount64(np.array([sigs[i] ^ sigs[j]]))[0]) <= 3:
            want.add((i, j))
    assert got_pairs == want
    assert len(want) > 0  # the planted edit must actually qualify


def test_ngram_jaccard_math():
    assert dedup.ngram_jaccard("a b c d", "a b c d", 2) == 1.0
    assert dedup.ngram_jaccard("a b c", "x y z", 2) == 0.0


def test_simhash_exact_dup_cluster(docs_with_dups):
    out = dedup.simhash_clusters(docs_with_dups).to_pandas()
    assert len(out) == 1
    assert out["min_doc_id"].iloc[0] == 2
    assert out["n_docs"].iloc[0] == 2


def test_brute_force_topk_and_lsh_subset(ray_session):
    import ray

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    q = emb[7]
    bf = similarity.brute_force_topk(ds, q, k=5)
    assert bf["vec_id"].iloc[0] == 7  # self is most similar
    assert bf["cos"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    # exact reference
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    ref = np.argsort(-(e @ (q / np.linalg.norm(q))))[:5]
    assert set(bf["vec_id"]) == set(ref.tolist())
    # LSH result is a subset of corpus with identical cosines for returned ids
    ann = similarity.lsh_bucketed_topk(ds, q, k=5)
    full = dict(zip(bf["vec_id"], np.round(bf["cos"], 6)))
    for _, r in ann.iterrows():
        if r["vec_id"] in full:
            assert round(r["cos"], 6) == full[r["vec_id"]]


def test_textstats_vectorized_kernels():
    b = pa.table({"text": ["the cat and the dog", "el y la", "xyzzy plugh"]})
    q = textstats.quality_batch(b)
    assert q["n_tok"].to_pylist() == [5, 3, 2]
    assert q["stop_ratio"].to_pylist()[0] == pytest.approx(3 / 5)
    lang = textstats.langid_batch(b)["lang_guess"].to_pylist()
    assert lang[0] == "en"
    assert lang[1] == "es"
    assert lang[2] == "und"
    fp = textstats.fingerprint_batch(b)["fingerprint"].to_pylist()
    fp2 = textstats.fingerprint_batch(
        pa.table({"text": ["the cat and the dog", "the cat and the dg", "xyzzy plugh"]})
    )["fingerprint"].to_pylist()
    assert fp[0] == fp2[0] and fp[1] != fp2[1] and fp[2] == fp2[2]


def test_media_featurizer(ray_session):
    import ray

    ds = ray.data.from_arrow(multimodal.make_media_table(n=32))
    out = multimodal.featurize_media(ds).to_pandas()
    assert len(out) == 32
    assert "payload" not in out.columns
    assert len(out["features"].iloc[0]) == 8


def test_codecs_roundtrip():
    """Pure-numpy PPM/WAV codecs: decode(encode(x)) == x exactly."""
    import numpy as np

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    samples = rng.integers(-32768, 32767, size=997).astype(np.int16)
    got, rate = multimodal.decode_wav(multimodal.encode_wav(samples, 8_000))
    assert rate == 8_000 and (got == samples).all()
    # concatenated-frame stream splits back into the original frames
    frames = [multimodal.encode_ppm(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)) for _ in range(3)]
    assert multimodal.split_ppm_frames(b"".join(frames)) == frames


def test_media_featurizer_real_decode(ray_session):
    """decoder='real' decodes actual PPM/WAV payloads: feature values must
    equal the directly-computed pixel/sample statistics."""
    import numpy as np
    import ray

    tbl = multimodal.make_real_media_table(n=24)
    out = (
        multimodal.featurize_media(
            ray.data.from_arrow(tbl), decoder="real"
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(out) == 24
    df = tbl.to_pandas()
    for i in range(len(df)):
        feats = np.asarray(out["features"].iloc[i])
        if df["kind"][i] == "image":
            img = multimodal.decode_ppm(df["payload"][i])
            assert feats[0] == df["width"][i] and feats[1] == df["height"][i]
            assert feats[2] == 1
            assert feats[3] == pytest.approx(img[..., 0].mean(), rel=1e-5)
        elif df["kind"][i] == "audio":
            samples, rate = multimodal.decode_wav(df["payload"][i])
            assert feats[0] == pytest.approx(len(samples) / rate, rel=1e-5)
            assert feats[2] > 0.1  # sine RMS


def test_media_real_resize_and_frame_sample(ray_session):
    import numpy as np
    import ray

    tbl = multimodal.make_real_media_table(n=24)
    ds = ray.data.from_arrow(tbl)
    resized = multimodal.resize_media(ds, 16, 12, decoder="real").to_pandas()
    vis = resized[resized["kind"] != "audio"]
    for _, row in vis.iterrows():
        frames = multimodal.split_ppm_frames(row["payload"])
        for f in frames:
            img = multimodal.decode_ppm(f)
            assert img.shape == (12, 16, 3)
    sampled = multimodal.sample_frames(ds, n_frames=2, decoder="real").to_pandas()
    vids = sampled[sampled["kind"] == "video"]
    assert (vids.groupby("media_id")["frame_idx"].count() <= 2).all()
    # every sampled frame is independently decodable
    for p in vids["payload"]:
        assert multimodal.decode_ppm(p).ndim == 3


def test_evaluator_fixture_accuracy():
    truth, parsed, want = fixtures.make_evaluator_fixture()
    res = evaluate_pandas(truth.to_pandas(), parsed.to_pandas(), key=["conv_id", "turn_idx"])
    assert res.accuracy == pytest.approx(want)
    # brute-force pairwise reference
    t = truth.to_pandas()
    p = parsed.to_pandas()
    from itertools import combinations

    keys = list(zip(t.conv_id, t.turn_idx))
    tmap = dict(zip(keys, t.event_id))
    pmap = dict(zip(zip(p.conv_id, p.turn_idx), p.event_id))
    tp = sum(
        1
        for a, b in combinations(keys, 2)
        if tmap[a] == tmap[b] and pmap[a] == pmap[b]
    )
    parsed_pairs = sum(1 for a, b in combinations(keys, 2) if pmap[a] == pmap[b])
    truth_pairs = sum(1 for a, b in combinations(keys, 2) if tmap[a] == tmap[b])
    assert res.precision == pytest.approx(tp / parsed_pairs)
    assert res.recall == pytest.approx(tp / truth_pairs)


def test_evaluator_distributed_matches_pandas(ray_session):
    import ray

    truth, parsed, _ = fixtures.make_evaluator_fixture()
    res_pd = evaluate_pandas(truth.to_pandas(), parsed.to_pandas(), key=["conv_id", "turn_idx"])
    from logparser_ray.core.evaluator import evaluate_datasets

    res_ds = evaluate_datasets(
        ray.data.from_arrow(truth), ray.data.from_arrow(parsed), key=["conv_id", "turn_idx"]
    )
    assert res_ds.accuracy == pytest.approx(res_pd.accuracy)
    assert res_ds.f1 == pytest.approx(res_pd.f1)


def test_embedding_near_dupes_exact_vs_lsh_subset(ray_session):
    """LSH-bucketed pairs must be a subset of exact pairs (same threshold),
    with identical cos_bp for shared pairs."""
    import ray

    from logparser_ray.stages.similarity import embedding_near_dupes

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = embedding_near_dupes(ds, threshold=0.35, mode="exact")
    lsh = embedding_near_dupes(ds, threshold=0.35, mode="lsh", n_planes=3)
    ek = {(a, b): c for a, b, c in exact.itertuples(index=False)}
    for a, b, c in lsh.itertuples(index=False):
        assert (a, b) in ek and ek[(a, b)] == c
    # symmetric dedup: every pair once, a < b
    assert (exact["a"] < exact["b"]).all()


def test_media_resize_and_frame_sample(ray_session):
    import ray

    from logparser_ray.stages.multimodal import (
        make_media_table,
        resize_media,
        sample_frames,
    )

    ds = ray.data.from_arrow(make_media_table(n=48))
    resized = resize_media(ds, 64, 64).to_pandas()
    vis = resized[resized["kind"] != "audio"]
    assert (vis["width"] == 64).all() and (vis["height"] == 64).all()
    assert vis["payload"].map(len).eq(64 * 64 * 3).all()
    aud = resized[resized["kind"] == "audio"]
    assert (aud["width"] == -1).all()

    frames = sample_frames(ds, n_frames=3).to_pandas()
    vids = frames[frames["kind"] == "video"]
    per = vids.groupby("media_id")["frame_idx"].agg(["count", "max"])
    assert (per["count"] == 3).all() and (per["max"] == 2).all()
    others = frames[frames["kind"] != "video"]
    assert (others["frame_idx"] == -1).all()


def test_ivf_kmeans_and_search(ray_session):
    import numpy as np
    import ray

    from logparser_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c1 = kmeans_fit(ds, k=8, iters=5)
    c2 = kmeans_fit(ds, k=8, iters=5)
    assert np.allclose(c1, c2), "k-means must be deterministic"
    q = np.asarray(
        ds.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0], dtype=np.float64
    )
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, c1, k=5, n_probe=3)
    # IVF results are a subset of the corpus with identical cosines for
    # returned ids; with generous probes the top-1 must be found
    exact_map = dict(zip(exact["vec_id"], exact["cos"].round(6)))
    for vid, cos in zip(approx["vec_id"], approx["cos"].round(6)):
        if vid in exact_map:
            assert exact_map[vid] == cos
    assert exact["vec_id"].iloc[0] in set(approx["vec_id"])


def test_conv_text_hash_matches_golden_order(ray_session):
    """O1: per-conv ordered text hash equals one computed from the golden
    table sorted by (conv_id, turn_idx)."""
    import hashlib

    from logparser_ray.queries import q_transcripts_conv_text_hash

    got = q_transcripts_conv_text_hash("/root/testdata/sf0.001").to_pandas()
    tbl, _ = fixtures.make_transcripts(n_turns=6_000)
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"])
    want = (
        df.groupby("conv_id")["text"]
        .apply(lambda s: hashlib.md5("\n".join(s).encode()).hexdigest()[:16])
        .reset_index(name="text_hash")
    )
    merged = got.merge(want, on="conv_id", suffixes=("", "_want"))
    assert len(merged) == len(want)
    assert (merged["text_hash"] == merged["text_hash_want"]).all()


def test_asof_join_strict_backward(ray_session):
    """Hand-checked strict-backward as-of: latest right row strictly before
    each left row in (ts, id) order, per key; no prior row → null."""
    import pyarrow as pa
    import ray

    from logparser_ray.stages.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": [10, 20, 20, 5],
        "id": [100, 101, 103, 104],
    }))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": [10, 15, 20, 9],
        "id": [1, 2, 102, 3],
        "val": ["r10", "r15", "r20", "rb"],
    }))
    out = (
        asof_join(left, right, on="ts", by="k", tiebreak="id",
                  right_cols=["id", "val"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # left(10,100): prior right = (10,1) since (10,1)<(10,100) → r10
    # left(20,101): prior = (15,2)? no — (20,102)? (20,102) > (20,101)? yes
    #               (20,102) sorts after (20,101) → latest strictly before
    #               is (15,2) → r15
    # left(20,103): (20,102) < (20,103) → r20
    # left(5,104):  no right before in key b (9 > 5) → null
    assert out.loc[0, "val_r"] == "r10"
    assert out.loc[1, "val_r"] == "r15"
    assert out.loc[2, "val_r"] == "r20"
    assert pd.isna(out.loc[3, "val_r"])


def test_enrich_actor_pool_path(ray_session):
    """The stateful actor-pool variant of the enrichment stage (north-star:
    'dictionary lookup-enrichment hosted in a stateful actor pool') — dims
    resolved once per actor in __init__, identical output to the task path."""
    import ray

    from logparser_ray.stages.enrich import enrich_stage
    from logparser_ray.stages.parse import match_stage

    tdir, _ = fixtures.ensure_transcripts(2_000)
    base = match_stage(
        ray.data.read_parquet(tdir), fixtures.pattern_bank(), with_params=False
    )
    pooled = enrich_stage(
        base,
        roles_dim=fixtures.roles_dim(),
        tools_dim=fixtures.tools_dim(),
        concurrency=(1, 2),
    ).to_pandas()
    tasked = enrich_stage(
        base, roles_dim=fixtures.roles_dim(), tools_dim=fixtures.tools_dim()
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = pooled.sort_values(key).reset_index(drop=True)
    b = tasked.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_heavy_hitters_bounds_and_coverage(ray_session):
    """SpaceSaving-style merge: count_min <= true <= count_max for every
    reported key, and the true top-k are all reported (Zipf-ish stream,
    multiple blocks)."""
    import numpy as np
    import ray

    from logparser_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(41)
    # Zipf-ish: key i appears ~ 5000/(i+1) times
    vals = np.concatenate(
        [np.full(max(1, 5000 // (i + 1)), f"key{i:04d}") for i in range(400)]
    )
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals.astype(object), pa.string())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=8)

    got = heavy_hitters(ds, "v", k=10, slack=8)
    import collections

    true = collections.Counter(vals)
    for _, row in got.iterrows():
        assert row["count_min"] <= true[row["v"]] <= row["count_max"], row
    top_true = {v for v, _ in true.most_common(10)}
    assert top_true <= set(got["v"])


def test_approx_distinct_error_and_exact_path(ray_session):
    import numpy as np
    import ray

    from logparser_ray.stages.sketch import approx_distinct

    # exact path: fewer distincts than k
    small = pa.table({"v": pa.array([f"x{i}" for i in range(300)] * 3)})
    ds_small = ray.data.from_arrow(small).repartition(num_blocks=4)
    r = approx_distinct(ds_small, "v", k=1024)
    assert r["exact_below_k"] and r["estimate"] == 300

    # estimate path: 50k distincts, k=1024 → ~3% stddev; allow 15%
    big = pa.table(
        {"v": pa.array([f"u{i}" for i in range(50_000)], pa.string())}
    )
    ds_big = ray.data.from_arrow(big).repartition(num_blocks=8)
    r2 = approx_distinct(ds_big, "v", k=1024)
    assert not r2["exact_below_k"]
    assert abs(r2["estimate"] - 50_000) / 50_000 < 0.15, r2


def test_sessionize_bucketed_equals_naive(ray_session):
    """The hot-key-safe bucketed sessionization must equal a naive
    single-pass scan exactly — including sessions spanning bucket
    boundaries and users with gaps across EMPTY buckets. The reference is
    computed HERE with plain pandas (not via any operator under test —
    q_events_sessionize itself routes through sessionize_bucketed, so
    comparing query output to the operator would be circular)."""
    import pyarrow.parquet as pq
    import ray

    from logparser_ray.stages.windows import sessionize_bucketed

    sf = "/root/testdata/sf0.01"
    ev = (
        pq.read_table(sf + "/events.parquet", columns=["user_id", "ts", "event_id"])
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    gap = ev.groupby("user_id", sort=True)["ts"].diff().dt.total_seconds()
    starts = gap.isna() | (gap > 1800.0)
    naive = (
        starts.groupby(ev["user_id"], sort=True)
        .sum()
        .astype("int64")
        .rename("n_sessions")
        .reset_index()
    )
    ds = ray.data.read_parquet(
        sf + "/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    # small bucket (1h) forces many cross-boundary continuations; the
    # default 1-day bucket covers the coarse regime
    for bucket_s in (3600, 86_400):
        got = (
            sessionize_bucketed(ds, gap_s=1800.0, bucket_s=bucket_s)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(naive), bucket_s
        assert (got["user_id"].to_numpy() == naive["user_id"].to_numpy()).all()
        assert (
            got["n_sessions"].to_numpy() == naive["n_sessions"].to_numpy()
        ).all(), bucket_s


def test_simhash_mega_bucket_truncates_not_skips(ray_session):
    """A dup group larger than max_bucket must still yield pairs among the
    kept (smallest-id) members — previously the whole bucket was silently
    skipped and massive dup groups returned ZERO pairs."""
    import ray

    n = 30
    texts = ["same exact duplicated text here okay"] * n
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})
    got = dedup.simhash_near_dupes(
        ray.data.from_arrow(t), max_hamming=3, bands=4, max_bucket=10
    )
    kept = set(range(10))  # smallest ids kept per bucket
    want = {(a, b) for a in kept for b in kept if a < b}
    assert set(zip(got["a"], got["b"])) == want


def test_heavy_hitters_null_values_do_not_collide_with_meta(ray_session):
    import ray

    from logparser_ray.stages.sketch import heavy_hitters

    # a GENUINE "<null>" string value must stay distinct from real nulls
    # (ADVICE r02: the old sentinel merged them)
    t = pa.table(
        {
            "v": pa.array(
                ["x"] * 50 + [None] * 80 + ["y"] * 10 + ["<null>"] * 7, pa.string()
            )
        }
    )
    ds = ray.data.from_arrow(t).repartition(num_blocks=3)
    got = heavy_hitters(ds, "v", k=4, slack=4)
    null_row = got[got["is_null"]]
    assert len(null_row) == 1
    assert null_row["count_min"].iloc[0] <= 80 <= null_row["count_max"].iloc[0]
    lit_row = got[(got["v"] == "<null>") & ~got["is_null"]]
    assert len(lit_row) == 1
    assert lit_row["count_min"].iloc[0] <= 7 <= lit_row["count_max"].iloc[0]


def test_near_dup_clusters_and_drop(docs_with_dups):
    """Pairs → connected components → corpus filtered to one representative
    per cluster (transitive closure included)."""
    import pandas as pd

    pairs = pd.DataFrame({"a": [0, 1, 2], "b": [1, 4, 3]})  # {0,1,4} and {2,3}
    cl = dedup.near_dup_clusters(pairs)
    got = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert got == {0: 0, 1: 0, 4: 0, 2: 2, 3: 2}
    kept = dedup.drop_near_dupes(docs_with_dups, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2]  # representatives only


def test_approx_distinct_excludes_nulls(ray_session):
    """KMV must match COUNT(DISTINCT col) semantics: NULL is not a distinct
    value (review r03: hash_array hashed None like a key, desyncing the
    sketch from its SQL oracle on any fixture with null user_ids)."""
    import ray

    from logparser_ray.stages.sketch import approx_distinct

    t = pa.table(
        {"v": pa.array(["a", None, "b", None, "c", "a"], pa.string())}
    )
    r = approx_distinct(ray.data.from_arrow(t).repartition(num_blocks=3), "v")
    assert r["exact_below_k"] and r["estimate"] == 3


def test_heavy_hitters_empty_string_vs_null_tie_deterministic(ray_session):
    """'' and NULL share v='' in the partial; when they tie exactly on n at
    the cap boundary the (n, v, is_null) sort makes the eviction choice
    canonical — independent of the groupby's emission order and of input
    row order (review r03: sorting on (n, v) alone let incidental order
    pick the survivor). Both orderings of the same multiset must yield
    identical sketches."""
    import ray

    from logparser_ray.stages.sketch import heavy_hitters

    # cap = k*slack = 4; three k* keys (counts 9,8,7) + '' x5 + null x5:
    # the ''/null pair ties exactly at the cap boundary — only one survives
    head = [f"k{i}" for i, c in enumerate((9, 8, 7)) for _ in range(c)]
    tie = [""] * 5 + [None] * 5
    outs = []
    for vals in (head + tie, head + tie[::-1]):
        t = pa.table({"v": pa.array(vals, pa.string())})
        got = heavy_hitters(
            ray.data.from_arrow(t).repartition(num_blocks=1), "v", k=4, slack=1
        )
        outs.append(got.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # canonical winner: is_null=False sorts before True at equal (n, v)
    surv = set(zip(outs[0]["v"], outs[0]["is_null"]))
    assert ("", False) in surv and ("", True) not in surv


def test_binned_quantiles_rank_semantics(ray_session):
    """The q-quantile bin must contain the exact rank-ceil(q·n) element
    (true discrete quantile at bin resolution), independent of block
    structure; nulls are excluded like SQL aggregates."""
    import math

    import ray

    from logparser_ray.stages.sketch import binned_quantiles

    rng = np.random.default_rng(23)
    vals = np.concatenate(
        [rng.exponential(40.0, 5000), rng.uniform(0, 400, 2000)]
    )
    col = list(vals) + [None] * 50
    t = pa.table({"value": pa.array(col, pa.float64())})
    outs = []
    for blocks in (2, 9):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        got = binned_quantiles(ds, "value", width=10.0, qs=(0.5, 0.95, 0.99))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    srt = np.sort(vals)
    for _, row in outs[0].iterrows():
        q = float(row["q"])
        assert row["n_total"] == len(vals)  # nulls excluded
        exact = srt[math.ceil(q * len(vals)) - 1]  # rank-ceil(q·n) element
        assert row["bin"] == int(np.floor(exact / 10.0)), q


def test_lag_lead_bucketed_equals_naive(ray_session):
    """lag_lead_bucketed must equal the single-partition window scan for
    hot keys, cross-bucket adjacency, singleton buckets, and ts ties."""
    import ray

    from logparser_ray.stages.windows import lag_lead_bucketed

    rng = np.random.default_rng(7)
    n = 3000
    user = rng.integers(0, 5, n)
    user[:1500] = 0  # hot user: half of all events
    ts_us = rng.integers(0, 10 * 86_400 * 1_000_000, n)
    ts_us[:50] = 123_456  # ts ties → id tiebreak must decide order
    # singleton bucket: user 4 gets one isolated far-future event
    user[n - 1], ts_us[n - 1] = 4, 400 * 86_400 * 1_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(user.astype(np.int64)),
            "ts": pa.array(ts_us.astype(np.int64)),
        }
    )
    out = (
        lag_lead_bucketed(
            ray.data.from_arrow(tbl), bucket_s=3600  # many boundaries
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    naive = (
        tbl.to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .assign(
            prev_id=lambda d: d.groupby("user_id")["event_id"].shift(1),
            next_id=lambda d: d.groupby("user_id")["event_id"].shift(-1),
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    for c in ("prev_id", "next_id"):
        got = out[c].astype("float64")  # None → NaN for comparison
        want = naive[c].astype("float64")
        pd.testing.assert_series_equal(got, want, check_names=False)


def test_random_projection_jl_properties(ray_session):
    """Seeded JL projection: deterministic across runs/block structure,
    right shape, and pairwise cosine distortion bounded on a real sample."""
    import ray

    from logparser_ray.stages.similarity import _emb_matrix, random_projection

    rng = np.random.default_rng(3)
    n, dim, out_dim = 200, 64, 24
    emb = rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), dim
            ),
        }
    )
    outs = []
    for blocks in (2, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = (
            random_projection(ds, out_dim=out_dim)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(out) == n and len(out["embedding_rp"][0]) == out_dim
        outs.append(np.asarray(out["embedding_rp"].tolist()))
    # block-independent up to BLAS kernel ULPs (dot-product summation order
    # varies with matrix shape, so bit-equality across batch sizes is not a
    # matmul guarantee)
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-12)

    a = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    r = outs[0]
    cos_hi = a @ a.T
    cos_lo = r @ r.T
    pairs = np.triu_indices(n, k=1)
    # JL at out_dim=24 adds ~1/sqrt(out_dim) cosine noise — bound the mean
    assert np.abs(cos_hi[pairs] - cos_lo[pairs]).mean() < 1.5 / np.sqrt(24)
    # the property dedup needs: planted near-identical pairs STAY similar
    twin = emb[:10] + 0.05 * rng.standard_normal((10, dim))
    tbl2 = pa.table(
        {
            "vec_id": pa.array(np.arange(10, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(twin.reshape(-1), pa.float64()), dim
            ),
        }
    )
    tds = ray.data.from_arrow(tbl2)
    tp = (
        random_projection(tds, out_dim=out_dim)
        .to_pandas()
        .sort_values("vec_id")
    )
    tr = np.asarray(tp["embedding_rp"].tolist())
    twin_cos = (r[:10] * tr).sum(axis=1)
    assert (twin_cos > 0.85).all()


def test_dedup_against_prior_broadcast_and_join(ray_session):
    import ray

    from logparser_ray.stages.dedup import dedup_against_prior

    prior_texts = [f"old doc {i}" for i in range(50)]
    new_texts = (
        [f"old doc {i}" for i in range(0, 20)]  # 20 already ingested
        + [f"new doc {i}" for i in range(30)]  # 30 fresh
        + ["new doc 0", "new doc 1"]  # internal dups of fresh docs
    )
    prior = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(prior_texts)]
    )
    new = ray.data.from_items(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(new_texts)]
    )
    for max_bytes in (64 << 20, 0):  # broadcast path, then anti-join path
        out = (
            dedup_against_prior(new, prior, prior_max_bytes=max_bytes)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # 30 fresh texts survive; already-ingested and internal dups drop
        assert len(out) == 30, max_bytes
        assert out["doc_id"].min() == 120  # first fresh doc
        assert out["n_copies"].sum() == 32  # 30 + the 2 internal dups


def test_unigram_xent_hand_computed(ray_session):
    import ray

    from logparser_ray.stages.textstats import unigram_xent

    # corpus: 4 'a', 2 'b', 2 'c' → p(a)=.5, p(b)=.25, p(c)=.25
    docs = ["a a b", "a a c", "b c"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": docs})
    )
    out = (
        unigram_xent(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import math

    def bp(*ps):
        return int(np.floor(-(sum(math.log(p) for p in ps) / len(ps)) * 10_000 + 0.5))

    assert out["xent_bp"].tolist() == [
        bp(0.5, 0.5, 0.25),
        bp(0.5, 0.5, 0.25),
        bp(0.25, 0.25),
    ]
    # rarer-token docs score HIGHER xent (lower quality signal)
    assert out["xent_bp"][2] > out["xent_bp"][0]


def test_dedup_against_prior_empty_prior_bootstrap(ray_session):
    """First-ingestion bootstrap: an EMPTY prior must pass everything
    through (internally deduped), not crash on concat."""
    import ray

    from logparser_ray.stages.dedup import dedup_against_prior

    prior = ray.data.from_items([{"doc_id": 0, "text": "x"}]).filter(
        expr="doc_id > 100"
    )  # empty after filter
    new = ray.data.from_items(
        [{"doc_id": i, "text": f"t{i % 3}"} for i in range(6)]
    )
    out = dedup_against_prior(new, prior).to_pandas()
    assert len(out) == 3
    assert out["n_copies"].sum() == 6


def test_curation_stats_null_text_safe():
    from logparser_ray.stages.curation import curation_stats_batch, pii_redact_batch

    batch = pa.table({"text": pa.array(["a b", None], pa.string())})
    out = curation_stats_batch(batch)
    assert out["n_symbol"].to_pylist() == [0, 0]  # not int64-min garbage
    red = pii_redact_batch(batch)
    assert red["n_email"].to_pylist() == [0, 0]
    assert red["text_redacted"].to_pylist() == ["a b", None]


def test_unigram_xent_block_layout_independent(ray_session):
    """The integer xent score must not depend on batch composition."""
    import ray

    from logparser_ray.stages.textstats import unigram_xent

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 40))) for _ in range(300)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    outs = []
    for blocks in (1, 13):
        ds = ray.data.from_items(rows).repartition(blocks)
        outs.append(
            unigram_xent(ds).to_pandas().sort_values("doc_id")["xent_bp"].tolist()
        )
    assert outs[0] == outs[1]


def test_avg_gap_bucketed_equals_naive(ray_session):
    """The hot-key-safe (user, time-bucket) gap statistics must equal a
    plain pandas per-user scan exactly — including boundary gaps between
    present buckets separated by EMPTY buckets (the merge adds one gap per
    consecutive pair of PRESENT buckets, floored independently)."""
    import pyarrow.parquet as pq
    import ray

    from logparser_ray.stages.windows import avg_gap_bucketed

    sf = "/root/testdata/sf0.01"
    ev = (
        pq.read_table(sf + "/events.parquet", columns=["user_id", "ts", "event_id"])
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    gaps = np.floor(
        ev.groupby("user_id", sort=True)["ts"].diff().dt.total_seconds()
    )
    naive = (
        pd.DataFrame({"user_id": ev["user_id"], "gap": gaps})
        .groupby("user_id", sort=True)
        .agg(n_gaps=("gap", "count"), sum_gap_s=("gap", "sum"))
        .astype({"n_gaps": "int64", "sum_gap_s": "int64"})
        .reset_index()
    )
    ds = ray.data.read_parquet(
        sf + "/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    # 1h buckets force many boundary gaps; 1d covers the coarse regime
    for bucket_s in (3600, 86_400):
        got = (
            avg_gap_bucketed(ds, bucket_s=bucket_s)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(naive), bucket_s
        assert (got["user_id"].to_numpy() == naive["user_id"].to_numpy()).all()
        assert (got["n_gaps"].to_numpy() == naive["n_gaps"].to_numpy()).all()
        assert (
            got["sum_gap_s"].to_numpy() == naive["sum_gap_s"].to_numpy()
        ).all(), bucket_s


def test_rolling_sum_bucketed_equals_naive(ray_session):
    """The bucketed rolling sum must equal pandas' per-user rolling window
    exactly, including windows spanning SEVERAL tiny buckets (bucket span
    smaller than the window, so every row is both edge and carrier)."""
    import pyarrow.parquet as pq
    import ray

    from logparser_ray.stages.windows import rolling_sum_bucketed

    sf = "/root/testdata/sf0.01"
    cols = ["user_id", "ts", "event_id", "value"]
    ev = (
        pq.read_table(sf + "/events.parquet", columns=cols)
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ds = ray.data.read_parquet(sf + "/events.parquet", columns=cols)
    for w, bucket_s in ((3, 3600), (3, 86_400), (4, 600)):
        roll = (
            pd.Series(cents)
            .groupby(ev["user_id"].to_numpy())
            .rolling(window=w, min_periods=1)
            .sum()
            .astype(np.int64)
            .to_numpy()
        )
        naive = pd.DataFrame(
            {"event_id": ev["event_id"].to_numpy(), "want": roll}
        )
        got = rolling_sum_bucketed(ds, window=w, bucket_s=bucket_s).to_pandas()
        m = naive.merge(got, on="event_id")
        assert len(m) == len(ev) == len(got), (w, bucket_s)
        assert (m["want"] == m[f"roll{w}_cents"]).all(), (w, bucket_s)


def test_asof_join_bucketed_equals_naive(ray_session):
    """The two-phase bucketed as-of join must equal the per-key reference
    implementation exactly — at a bucket width small enough that most
    matches cross bucket boundaries (carrier handoff), and at the default
    width. Includes duplicate timestamps (tiebreak order) via the fixture
    events table."""
    import ray

    from logparser_ray.stages.joins import asof_join, asof_join_naive

    sf = "/root/testdata/sf0.01"
    ev = ray.data.read_parquet(
        sf + "/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    kw = dict(
        on="ts", by="user_id", tiebreak="event_id", right_cols=["event_id", "ts"]
    )
    want = (
        asof_join_naive(purchases, clicks, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for bucket_width in (3_600 * 1_000_000, None):  # 1h (µs) and default 1d
        got = (
            asof_join(purchases, clicks, bucket_width=bucket_width, **kw)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(want.columns) or set(got.columns) == set(
            want.columns
        )
        got = got[want.columns]
        assert len(got) == len(want), bucket_width
        for c in want.columns:
            a, b = got[c], want[c]
            assert a.isna().equals(b.isna()), (bucket_width, c)
            mask = ~a.isna()
            assert (a[mask].to_numpy() == b[mask].to_numpy()).all(), (
                bucket_width,
                c,
            )


def test_minhash_mega_bucket_truncation_counted(ray_session):
    """A bucket over the 200-id cap must (a) still yield pairs among the
    kept smallest ids and (b) report HOW MANY buckets were truncated via
    the n_truncated_buckets attr — never silently (VERDICT r03 #5)."""
    import ray

    n = 230
    texts = ["same exact duplicated text appears here okay fine"] * n
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})
    for verify in ("inline", "join"):
        got = dedup.minhash_near_dupes(
            ray.data.from_arrow(t), verify=verify, bands=4, rows_per_band=2
        )
        assert got.attrs["n_truncated_buckets"] >= 1, verify
        # identical docs: every kept pair is an exact dup (jaccard 1.0)
        assert (got["a"] >= 0).all() and (got["b"] >= 0).all(), verify
        assert len(got) == 200 * 199 // 2, verify
        assert got["a"].max() < 200 and got["b"].max() < 200, verify


def test_minhash_no_truncation_attr_zero(docs_with_dups):
    """Small buckets: the truncation counter must exist and be zero."""
    got = dedup.minhash_near_dupes(docs_with_dups, threshold=0.5)
    assert got.attrs["n_truncated_buckets"] == 0


def test_bucketed_window_plans_have_no_sort_or_mapgroups(ray_session):
    """The rerouted gap/rolling operators must never plan a global Sort or
    a per-key MapGroups (the round-3 scale-killers they replaced) — only
    keyed Repartition exchanges plus map_batches."""
    import ray

    from logparser_ray.stages.windows import avg_gap_bucketed, rolling_sum_bucketed

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        sf + "/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    g = avg_gap_bucketed(ds)
    stats = g.stats().lower()
    assert "sort" not in stats, stats
    assert "mapgroups" not in stats.replace("_", "").replace(" ", ""), stats
    r = rolling_sum_bucketed(ds, window=3)
    stats = r.stats().lower()
    assert "sort" not in stats, stats
    assert "mapgroups" not in stats.replace("_", "").replace(" ", ""), stats


def test_minhash_against_prior_planted(ray_session):
    """Cross-snapshot near-dup: a new doc that is a 1-token edit of a prior
    doc must surface with that prior as dup_of; unrelated new docs must be
    absent; intra-side dups must NOT be reported (new×new is out of scope
    by design — minhash_near_dupes covers within-batch)."""
    import ray

    prior_texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "totally different prior content sits here quietly okay",
    ]
    new_texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota NEW",  # ~ prior 100
        "fresh unrelated words that match nothing at all here",
        "fresh unrelated words that match nothing at all here",  # intra-new dup
    ]
    prior = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([100, 101, 102], pa.int64()), "text": prior_texts})
    )
    new = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([200, 201, 202], pa.int64()), "text": new_texts})
    )
    got = dedup.minhash_against_prior(new, prior, threshold=0.5)
    assert got.attrs["n_truncated_buckets"] == 0
    assert set(got["doc_id"]) == {200}
    assert got.set_index("doc_id").loc[200, "dup_of"] == 100
    assert got.set_index("doc_id").loc[200, "jaccard"] >= 0.5


def test_minhash_against_prior_matches_cross_side_subset(ray_session):
    """With disjoint id ranges, the incremental matcher's (new, prior)
    pairs must be exactly the cross-side subset of minhash_near_dupes over
    the combined corpus (same params), reduced to each new doc's best —
    the two operators share one LSH construction, so this pins the
    incremental path against the already-verified batch path."""
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    base = [" ".join(rng.choice(vocab, size=12)) for _ in range(30)]
    # prior = originals (ids 0..29); new = edits of half of them + noise
    new_texts = []
    for i, t in enumerate(base[:15]):
        toks = t.split()
        toks[0] = "EDIT"
        new_texts.append(" ".join(toks))
    new_texts += [" ".join(rng.choice(vocab, size=12)) for _ in range(10)]
    prior = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(30), pa.int64()), "text": base})
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1000, 1000 + len(new_texts)), pa.int64()),
                "text": new_texts,
            }
        )
    )
    kw = dict(k=3, bands=8, rows_per_band=2, threshold=0.35)
    got = dedup.minhash_against_prior(new, prior, **kw)

    combined = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(30)) + list(range(1000, 1000 + len(new_texts))),
                    pa.int64(),
                ),
                "text": base + new_texts,
            }
        )
    )
    pairs = dedup.minhash_near_dupes(combined, **kw)
    cross = pairs[(pairs["a"] < 1000) & (pairs["b"] >= 1000)]
    want = (
        cross.rename(columns={"b": "doc_id", "a": "dup_of"})
        .sort_values(["doc_id", "jaccard", "dup_of"], ascending=[True, False, True])
        .drop_duplicates(["doc_id"])
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "dup_of", "jaccard"]]
    )
    got = got.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "dup_of", "jaccard"]
    ]
    pd.testing.assert_frame_equal(got, want)


def test_bucket_jaccard_matrix_equals_pairwise():
    """The vectorized incidence-matrix bucket verifier must emit exactly
    the per-pair _jaccard_packed results — same pairs, bit-identical
    values — including the both-empty convention (jaccard 1.0)."""
    rng = np.random.default_rng(3)
    blobs = []
    for _ in range(17):
        n = int(rng.integers(0, 60))
        vals = np.unique(rng.integers(0, 80, size=n).astype("<u8"))
        blobs.append(vals.tobytes())
    blobs.append(b"")  # two empty docs → jaccard 1.0 by convention
    blobs.append(b"")
    for thr in (0.0, 0.2, 0.8):
        ii, jj, jac = dedup._bucket_jaccard_pairs(blobs, thr)
        got = {(int(i), int(j)): float(v) for i, j, v in zip(ii, jj, jac)}
        want = {}
        for i in range(len(blobs)):
            for j in range(i + 1, len(blobs)):
                v = dedup._jaccard_packed(blobs[i], blobs[j])
                if v >= thr:
                    want[(i, j)] = v
        assert got == want, thr


def test_profile_table_hand_computed(ray_session):
    """Per-column stats vs hand-derived truth on a table with nulls, a
    negative int (the order-preserving key must not break), floats
    (IEEE total-order key: negatives, fractions) and strings — and
    block-layout independence."""
    import ray

    from logparser_ray.stages.profile import profile_table

    t = pa.table(
        {
            "i": pa.array([5, -3, None, 5, 12], pa.int64()),
            "s": pa.array(["b", "a", "c", None, "a"], pa.string()),
            "f": pa.array([1.5, 2.5, 1.5, None, -0.25], pa.float64()),
        }
    )
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        got = profile_table(ds).to_pandas().set_index("col")
        assert (got["n_rows"] == 5).all(), blocks
        assert got.loc["i", "n_null"] == 1
        assert got.loc["i", "n_distinct"] == 3
        assert got.loc["i", "min_repr"] == "-3"
        assert got.loc["i", "max_repr"] == "12"
        assert got.loc["s", "n_distinct"] == 3
        assert got.loc["s", "min_repr"] == "a"
        assert got.loc["s", "max_repr"] == "c"
        assert got.loc["f", "n_distinct"] == 3
        assert got.loc["f", "min_repr"] == "-0.25"
        assert got.loc["f", "max_repr"] == "2.5"


def test_profile_float_key_total_order():
    """The float64→uint64 key is strictly order-preserving across signs,
    magnitudes, ±inf; every NaN pattern keys greater than +inf (DuckDB
    min/max semantics); round-trip repr is exact."""
    from logparser_ray.stages.profile import _float_sortable, _key_to_float

    vals = np.array(
        [-np.inf, -1e300, -2.5, -0.25, -5e-324, -0.0, 0.0, 5e-324, 0.25, 1.5, 1e300, np.inf]
    )
    keys = _float_sortable(vals)
    assert (np.diff(keys.astype(np.uint64).view(np.uint64)) >= 0).all()
    # strict where values differ numerically (only the -0.0/0.0 pair ties
    # numerically but still orders, -0.0 first)
    assert (np.diff(keys) > 0).sum() >= len(vals) - 1 - 1
    for nan_bits in (0x7FF8000000000000, 0xFFF8000000000000, 0x7FF0000000000001):
        nv = np.array([np.uint64(nan_bits)]).view(np.float64)
        assert _float_sortable(nv)[0] > keys[-1]  # > +inf
    for v in vals:
        k = format(int(_float_sortable(np.array([v]))[0]), "016x")
        back = _key_to_float(k)
        assert repr(back) == repr(float(v)), (v, back)


def test_profile_table_approx_distinct(ray_session):
    """KMV mode: exact below k, within ~5% above k (50k distincts,
    k=4096), and count columns identical to the exact mode."""
    import ray

    from logparser_ray.stages.profile import profile_table

    n = 50_000
    t = pa.table(
        {
            "u": pa.array([f"user{i}" for i in range(n)], pa.string()),
            "small": pa.array([i % 40 for i in range(n)], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(num_blocks=6)
    got = profile_table(ds, approx=True, kmv_k=4096).to_pandas().set_index("col")
    assert got.loc["small", "n_distinct"] == 40  # exact below k
    est = got.loc["u", "n_distinct"]
    assert abs(est - n) / n < 0.05, est
    assert (got["n_rows"] == n).all() and (got["n_null"] == 0).all()


def test_binned_quantiles_by_hand_computed(ray_session):
    """Per-group binned ranks vs a hand-derived reference, block-layout
    independent (mergeable (group, bin) partials)."""
    import ray

    from logparser_ray.stages.sketch import binned_quantiles_by

    rng = np.random.default_rng(9)
    vals = rng.uniform(0, 100, size=3000)
    grps = np.where(np.arange(3000) % 3 == 0, "a", "b")
    t = pa.table({"g": pa.array(grps.astype(object), pa.string()), "v": vals})
    want = {}
    import math

    for g in ("a", "b"):
        v = vals[grps == g]
        bins = np.floor(v / 5.0).astype(np.int64)
        ub, cnt = np.unique(bins, return_counts=True)
        cum = np.cumsum(cnt)
        for q in (0.5, 0.95):
            idx = int(np.searchsorted(cum, math.ceil(q * len(v)), side="left"))
            want[(g, f"{q}")] = (int(ub[idx]), int(cum[idx]), len(v))
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        got = binned_quantiles_by(ds, "v", by="g", width=5.0, qs=(0.5, 0.95))
        assert len(got) == 4, blocks
        for _, r in got.iterrows():
            wb, wle, wtot = want[(r["grp"], r["q"])]
            assert (r["bin"], r["n_le"], r["n_total"]) == (wb, wle, wtot), (
                blocks,
                r.to_dict(),
            )


def test_pq_fit_and_search(ray_session):
    """Product quantization: deterministic codebooks, the query vector
    finds itself first with a near-1 reconstructed score, and recall@10
    against brute force stays useful at 32x compression."""
    import ray

    from logparser_ray.stages.similarity import brute_force_topk, pq_fit, pq_topk

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    b1 = pq_fit(ds, m=8, nbits=6, iters=8)
    b2 = pq_fit(ds, m=8, nbits=6, iters=8)
    assert np.allclose(b1, b2), "PQ fit must be deterministic"
    assert b1.shape == (8, 64, 8)
    q = np.asarray(
        ds.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0],
        dtype=np.float64,
    )
    exact = brute_force_topk(ds, q, k=10)
    approx = pq_topk(ds, q, b1, k=10)
    assert approx["vec_id"].iloc[0] == 0  # self-hit ranks first
    assert approx["score"].iloc[0] > 0.7  # quantized self-sim stays high
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 4, overlap  # recall@10 ≥ 0.4 at 32x compression
    # block-layout independence of the encode+LUT scan
    approx2 = pq_topk(ds.repartition(num_blocks=7), q, b1, k=10)
    assert approx.equals(approx2)


def test_ivf_pq_composition(ray_session):
    """IVF-PQ: results are a SUBSET of the probed partitions scored with
    PQ — every returned id must appear in the plain PQ scan of the pruned
    corpus with the identical score, and the self-query still finds
    itself with generous probes."""
    import ray

    from logparser_ray.stages.similarity import (
        ivf_pq_topk,
        kmeans_fit,
        pq_fit,
        pq_topk,
    )

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents = kmeans_fit(ds, k=8, iters=5)
    books = pq_fit(ds, m=8, nbits=6, iters=8)
    q = np.asarray(
        ds.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0],
        dtype=np.float64,
    )
    full_pq = pq_topk(ds, q, books, k=50)
    got = ivf_pq_topk(ds, q, cents, books, k=5, n_probe=4)
    assert got["vec_id"].iloc[0] == 0
    pq_scores = dict(zip(full_pq["vec_id"], full_pq["score"]))
    for vid, sc in zip(got["vec_id"], got["score"]):
        if vid in pq_scores:
            assert pq_scores[vid] == sc, vid


def test_binned_quantiles_by_all_null_and_null_groups(ray_session):
    """All-null values → empty frame (not a crash); null group keys are
    excluded by contract (mirroring the oracle's IS NOT NULL filters)."""
    import ray

    from logparser_ray.stages.sketch import binned_quantiles_by

    allnull = pa.table(
        {
            "g": pa.array(["a", "b"], pa.string()),
            "v": pa.array([None, None], pa.float64()),
        }
    )
    out = binned_quantiles_by(
        ray.data.from_arrow(allnull), "v", by="g", width=1.0
    )
    assert len(out) == 0
    mixed = pa.table(
        {
            "g": pa.array(["a", None, "a"], pa.string()),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = binned_quantiles_by(
        ray.data.from_arrow(mixed), "v", by="g", width=1.0, qs=(0.5,)
    )
    assert set(out["grp"]) == {"a"}
    assert out["n_total"].iloc[0] == 2  # the null-group row is excluded


def test_dedup_spans_planted_and_fallback(ray_session):
    """C4-style span dedup: a chunk repeated later in the corpus keeps only
    its first (doc_id, chunk_idx) occurrence; a doc made entirely of
    earlier chunks vanishes; reassembly preserves chunk order; the
    broadcast and semi-join fallback paths agree; block layout changes
    nothing."""
    import ray

    k = 4  # span_tokens
    a = "a1 a2 a3 a4"  # doc0 chunk0
    b = "b1 b2 b3 b4"  # doc0 chunk1
    c = "c1 c2 c3 c4"
    docs = [
        f"{a} {b}",        # doc 0: both chunks first occurrences
        f"{c} {a}",        # doc 1: c kept, a dropped (dup of doc0 chunk0)
        f"{b} {a}",        # doc 2: both chunks duplicate doc0 → vanishes
        "x1 x2",           # doc 3: one short unique chunk
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": docs})

    def run(ds, **kw):
        return (
            dedup.dedup_spans(ds, span_tokens=k, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        got = run(ds)
        assert got["doc_id"].tolist() == [0, 1, 3], blocks
        assert got.set_index("doc_id").loc[0, "text_dedup"] == f"{a} {b}"
        assert got.set_index("doc_id").loc[1, "text_dedup"] == c
        assert got.set_index("doc_id").loc[1, "n_dropped"] == 1
        assert got.set_index("doc_id").loc[3, "text_dedup"] == "x1 x2"
    # force the 100 TB semi-join fallback and require identical output
    ds = ray.data.from_arrow(t).repartition(num_blocks=2)
    fb = run(ds, winners_max_bytes=0)
    pd.testing.assert_frame_equal(
        run(ds)[["doc_id", "text_dedup", "n_kept", "n_dropped"]],
        fb[["doc_id", "text_dedup", "n_kept", "n_dropped"]],
    )
