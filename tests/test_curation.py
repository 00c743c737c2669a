"""Curation-stage tests: PII redaction, Gopher-style repetition gate,
TF-IDF top-k (stages/curation.py). Kernel tests run batch-level (no Ray);
operator tests use the session Ray fixture."""

import numpy as np
import pyarrow as pa
import ray

from logparser_ray.stages.curation import (
    GATE_DEFAULTS,
    curation_gate,
    curation_stats_batch,
    md5_col_batch,
    pii_redact_batch,
    tfidf_topk,
)


def test_pii_redact_planted():
    batch = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail me at alice.smith+dev@corp.example.org thanks",
                "server 192.168.10.254 and 10.0.0.1 rebooted",
                "acct 123456789012 ref 987654321 but keep 12345 and v1.2",
                "no pii here at all",
            ],
        }
    )
    out = pii_redact_batch(batch)
    red = out["text_redacted"].to_pylist()
    assert red[0] == "mail me at <EMAIL> thanks"
    assert red[1] == "server <IP> and <IP> rebooted"
    # 9+ digit runs are IDs; short numbers and dotted versions are not
    assert red[2] == "acct <ID> ref <ID> but keep 12345 and v1.2"
    assert red[3] == "no pii here at all"
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0, 0]
    assert out["n_idnum"].to_pylist() == [0, 0, 2, 0]


def test_pii_email_redacted_before_ipv4_sees_text():
    # the dotted digits inside an email's domain must not count as an IP
    batch = pa.table({"text": ["ping 1.2.3.4@10.0.0.1.example.com now"]})
    out = pii_redact_batch(batch)
    assert out["n_email"].to_pylist() == [1]
    assert out["n_ipv4"].to_pylist() == [0]
    assert out["text_redacted"].to_pylist() == ["ping <EMAIL> now"]


def test_curation_stats_modal_counts_and_boundaries():
    batch = pa.table(
        {
            "text": [
                "a b a b a x",  # modal word 'a'×3, modal bigram 'a b'×2
                "z z z",  # modal word 'z'×3, modal bigram 'z z'×2
                "solo",  # single token → no bigram
                "",  # empty → one empty token (string_split parity)
            ]
        }
    )
    out = curation_stats_batch(batch)
    assert out["n_words"].to_pylist() == [6, 3, 1, 1]
    assert out["n_distinct"].to_pylist() == [3, 1, 1, 1]
    assert out["max_word_n"].to_pylist() == [3, 3, 1, 1]
    assert out["top_bigram_n"].to_pylist() == [2, 2, 0, 0]
    # stopword 'a' counted; boundary: last token of doc0 ('x') must not
    # pair with doc1's first token ('z') — 'x z' would otherwise appear
    assert out["n_stop"].to_pylist() == [3, 0, 0, 0]


def test_curation_gate_keep_flag(ray_session):
    texts = [
        " ".join(f"w{i}" for i in range(20)),  # diverse → keep
        " ".join(["dup"] * 20),  # modal word 20/20 → drop
        "too short",  # n_words 2 < min → drop
    ]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    out = curation_gate(ds).to_pandas().sort_values("n_distinct", ascending=False)
    assert out["keep"].tolist() == [1, 0, 0]
    assert GATE_DEFAULTS["min_words"] > 2


def test_md5_col_matches_hashlib():
    import hashlib

    batch = pa.table({"t": ["abc", "", None]})
    out = md5_col_batch(batch, "t", "h")
    assert out["h"].to_pylist() == [
        hashlib.md5(b"abc").hexdigest(),
        hashlib.md5(b"").hexdigest(),
        None,
    ]


def test_tfidf_topk_hand_computed(ray_session):
    # corpus of 4 docs; 'rare' appears only in doc 0 → highest idf there
    docs = [
        "common rare common",
        "common common",
        "common other",
        "common other other",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(4)), "text": docs})
    )
    out = (
        tfidf_topk(ds, k=2, n_docs=4)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    assert d0.iloc[0]["term"] == "rare"
    assert d0.iloc[0]["df"] == 1
    assert d0.iloc[0]["score_bp"] == int(
        np.floor(1 * np.log(4 / 1) * 10_000 + 0.5)
    )
    # 'common' has df=4 → idf ln(1)=0 → score 0 everywhere
    assert (out[out["term"] == "common"]["score_bp"] == 0).all()
    # k=2 respected, ranks are 1..k
    assert out.groupby("doc_id")["rnk"].max().le(2).all()
    assert out.groupby("doc_id")["rnk"].min().eq(1).all()


def test_tfidf_target_expr_restricts_docs_not_df(ray_session):
    docs = ["x y", "x z", "x z"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(3)), "text": docs})
    )
    out = tfidf_topk(ds, k=3, target_expr="doc_id == 0").to_pandas()
    assert set(out["doc_id"]) == {0}
    # df computed on the FULL corpus: 'y' df=1, 'x' df=3
    assert out.set_index("term")["df"]["y"] == 1
    assert out.set_index("term")["df"]["x"] == 3


def test_decontaminate_planted_overlap(ray_session):
    from logparser_ray.stages.curation import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog near the old barn today"]
    span = " ".join(bench[0].split()[:13])  # exact 13-gram from the benchmark
    docs = [
        "prefix words here " + span + " suffix words",  # contaminated
        "completely unrelated text with enough tokens to form many grams "
        "but none shared with the benchmark set at all here",  # clean
        "too short to have grams",  # < 13 tokens → never contaminated
    ]
    import ray

    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": docs}))
    out = decontaminate(ds, bench, n=13).to_pandas().sort_values("doc_id")
    assert out["contaminated"].tolist() == [1, 0, 0]
    assert out["n_hits"].iloc[0] >= 1
    assert out["n_hits"].iloc[1] == 0


def test_ngram_strings_do_not_cross_doc_boundary():
    from logparser_ray.stages.curation import _ngram_strings

    texts = pa.array(["a b c", "d e f"], pa.string())
    grams, di = _ngram_strings(texts, 3)
    assert grams.to_pylist() == ["a b c", "d e f"]
    assert di.tolist() == [0, 1]
    # bigrams: 'c d' (crossing) must be absent
    g2, _ = _ngram_strings(texts, 2)
    assert "c d" not in g2.to_pylist()


def test_sample_by_rates_deterministic_and_thresholded(ray_session):
    import hashlib

    import ray
    from logparser_ray.stages.sample import sample_by_rates

    texts = [f"text number {i}" for i in range(200)]
    groups = ["g0" if i % 2 == 0 else "g1" for i in range(200)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(200)), "source": groups, "text": texts})
    )
    rates = {"g0": 1.0, "g1": 0.3}
    kept = (
        sample_by_rates(
            ds, group_col="source", key_col="text", rates=rates, default_rate=0.0
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # rate 1.0 keeps every g0 row
    assert (kept["source"] == "g0").sum() == 100
    # g1 rows match the manual md5-prefix rule exactly
    thr = format(int(0.3 * (1 << 32)), "08x")
    expect_g1 = {
        i
        for i in range(200)
        if groups[i] == "g1"
        and hashlib.md5(texts[i].encode()).hexdigest()[:8] < thr
    }
    assert set(kept[kept["source"] == "g1"]["doc_id"]) == expect_g1
    assert 0 < len(expect_g1) < 100  # the threshold actually splits


def test_tfidf_join_fallback_matches_broadcast(ray_session):
    import ray
    from logparser_ray.stages.curation import tfidf_topk

    docs = [f"w{i % 7} w{(i + 1) % 7} shared token{i % 3}" for i in range(40)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": docs})
    )
    a = (
        tfidf_topk(ds, k=2, n_docs=40)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": docs})
    )
    b = (
        tfidf_topk(ds2, k=2, n_docs=40, broadcast_max_bytes=0)  # force join
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    pd_cols = ["doc_id", "term", "tf", "df", "score_bp", "rnk"]
    import pandas as pd

    pd.testing.assert_frame_equal(a[pd_cols], b[pd_cols])


def test_pack_sequences_hand_computed_and_block_independent(ray_session):
    import ray
    from logparser_ray.stages.pack import pack_sequences

    # token counts 4,3,5,2,6 with budget 8 → exclusive prefixes
    # 0,4,7,12,14 → bins 0,0,0,1,1
    texts = ["a b c d", "a b c", "a b c d e", "a b", "a b c d e f"]
    want_bins = [0, 0, 0, 1, 1]
    for blocks in (1, 3, 5):
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ).repartition(blocks)
        out = (
            pack_sequences(ds, budget=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_tok"].tolist() == [4, 3, 5, 2, 6]
        assert out["seq_id"].tolist() == want_bins, f"blocks={blocks}"


def test_pack_sequences_rejects_interleaved_ids(ray_session):
    import pytest
    import ray
    from logparser_ray.stages.pack import pack_sequences

    # two blocks with overlapping id ranges — the scan must refuse
    b1 = pa.table({"doc_id": [0, 2], "text": ["a", "b"]})
    b2 = pa.table({"doc_id": [1, 3], "text": ["c", "d"]})
    ds = ray.data.from_arrow([b1, b2])
    with pytest.raises(ValueError, match="disjoint"):
        pack_sequences(ds, budget=8).materialize()


def test_prep_corpus_write_and_metrics(ray_session, tmp_path):
    import glob

    import ray

    from logparser_ray.pipelines.prep import prep_corpus

    out = str(tmp_path / "prep_out")
    res = prep_corpus(
        "/root/testdata/sf0.001/documents.parquet",
        out_dir=out,
        budget=512,
        seq_per_part=4,
    )
    m = res["metrics"]
    assert m["rows_in"] > 0
    assert 0 < m["rows_deduped"] <= m["rows_in"]
    assert m["n_sequences"] >= 1
    parts = glob.glob(f"{out}/seq_part=*")
    assert len(parts) >= 1  # partitioned output, never one giant file
    back = ray.data.read_parquet(out)
    assert back.count() == m["rows_deduped"]
    # every doc fits in exactly one sequence; bins are dense from 0
    seqs = sorted(set(back.to_pandas()["seq_id"]))
    assert seqs[0] == 0 and seqs[-1] == m["n_sequences"] - 1


def test_prep_corpus_pin_and_spill_paths_identical(ray_session, tmp_path):
    """dedup_exec size guard (round 5): the fast "pin" path (corpus under
    pin_max_rows) and the 100 TB "spill" path must produce the identical
    packed corpus — and "auto" must route a small corpus to pin."""
    from logparser_ray.pipelines.prep import prep_corpus

    def run(**kw):
        res = prep_corpus(
            "/root/testdata/sf0.001/documents.parquet", budget=512, **kw
        )
        df = (
            res["dataset"]
            .select_columns(["doc_id", "n_tok", "seq_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return df, res["metrics"]

    pin_df, pin_m = run(dedup_exec="pin")
    spill_df, spill_m = run(
        dedup_exec="spill", spill_dir=str(tmp_path / "spill")
    )
    auto_df, _ = run()  # 500 rows ≤ pin_max_rows → pin branch
    import pandas as pd

    pd.testing.assert_frame_equal(pin_df, spill_df)
    pd.testing.assert_frame_equal(pin_df, auto_df)
    assert pin_m["rows_deduped"] == spill_m["rows_deduped"]


def test_tfidf_straddle_detector():
    """The broadcast path's completeness census: whole docs pass, a doc
    whose term rows straddle a block boundary raises instead of silently
    mis-ranking (ADVICE r03 — Ray splits blocks over
    target_max_block_size, so per-batch top-k needs a loud guard)."""
    import pytest

    from logparser_ray.stages.curation import _assert_complete_docs

    whole = pa.table(
        {
            "doc_id": [1, 1, 2],
            "term": ["a", "b", "a"],
            "_n_terms": [2, 2, 1],
        }
    )
    _assert_complete_docs(whole, "doc_id")  # must not raise

    # doc 1 claims 3 terms but only 2 landed in this batch → straddle
    split = pa.table(
        {
            "doc_id": [1, 1, 2],
            "term": ["a", "b", "a"],
            "_n_terms": [3, 3, 1],
        }
    )
    with pytest.raises(RuntimeError, match="straddle"):
        _assert_complete_docs(split, "doc_id")


def test_decontaminate_bloom_no_false_negatives(ray_session):
    """Bloom mode must dominate exact mode hit-for-hit (a Bloom filter has
    NO false negatives): every exact hit is a bloom hit, every exactly
    contaminated doc is bloom-contaminated, and on this tiny gram space
    the flags coincide."""
    import ray
    from logparser_ray.stages.curation import decontaminate

    bench = [
        "the quick brown fox jumps over the lazy dog near the old barn today",
        "pack my box with five dozen liquor jugs right now please thanks a lot",
    ]
    span = " ".join(bench[0].split()[:13])
    docs = [
        "prefix words " + span + " suffix",
        "completely unrelated text with enough tokens to form many grams "
        "but none shared with the benchmark set at all here today okay",
        "x " + " ".join(bench[1].split()[1:14]),
    ]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": docs}))
    exact = decontaminate(ds, bench, n=13).to_pandas().sort_values("doc_id")
    bloom = (
        decontaminate(ds, bench, n=13, mode="bloom")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (bloom["n_hits"].to_numpy() >= exact["n_hits"].to_numpy()).all()
    assert (
        bloom["contaminated"].to_numpy() >= exact["contaminated"].to_numpy()
    ).all()
    assert bloom["contaminated"].tolist() == exact["contaminated"].tolist()
    assert exact["contaminated"].tolist() == [1, 0, 1]


def test_bloom_fpr_bounded():
    """Probing 50k grams absent from a 1k-gram filter must false-positive
    at ≲ the design rate (~1e-7 at the default 24 bits/gram with
    splitmix-mixed probes; assert a generous < 0.05%)."""
    import pyarrow as pa

    from logparser_ray.stages.curation import _bloom_build, _bloom_probe

    members = pa.array([f"in gram number {i}" for i in range(1000)], pa.string())
    bits, mask, k = _bloom_build(members)
    inside = _bloom_probe(bits, mask, k, members.to_numpy(zero_copy_only=False))
    assert inside.all()  # zero false negatives by construction
    probes = np.array([f"out gram number {i}" for i in range(50_000)], dtype=object)
    hits = _bloom_probe(bits, mask, k, probes)
    assert hits.mean() < 0.0005, hits.mean()
