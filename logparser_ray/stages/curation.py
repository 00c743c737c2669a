"""Corpus-curation stages for LLM training-data pipelines (build-brief
extras): Gopher-style repetition/quality gating, PII redaction, and TF-IDF
keyword scoring.

Scale shapes (the part that matters at 100 TB):

- **Repetition stats + gate** (`curation_stats_batch` / `curation_gate`):
  each document is one row, so every statistic (modal-word count, modal-
  bigram count, stopword/symbol counts) is computable inside ONE
  ``map_batches`` pass with Arrow group_by on batch-local (doc, token)
  pairs — zero shuffle, fully streaming. This is the C4/Gopher filter
  shape: Rae et al. 2021 ("Scaling Language Models: ... Gopher") gate on
  duplicate-line/top-n-gram fractions; Raffel et al. 2020 (C4) on
  heuristic line rules. No reference-repo analogue (upstream logparser
  has no corpus curation); these are the brief's training-data extras.
- **PII redaction** (`pii_redact_batch`): an ordered chain of RE2
  ``replace_substring_regex`` kernels (email → IPv4 → long digit runs),
  each counted before it rewrites, again zero-shuffle per batch. RE2 is
  also DuckDB's regex engine, so the exact rewrite is SQL-oracle-able
  with nested ``regexp_replace(..., 'g')``.
- **TF-IDF top-k terms** (`tfidf_topk`): document frequency is a
  per-batch distinct-(doc, term) partial → one small ``groupby(term)``
  sum (vocabulary-sized, not corpus-sized); the DF table then attaches to
  per-doc term counts via ``attach_dim`` (broadcast when it fits,
  distributed hash join past the size guard). Per-doc top-k runs inside
  the same batch when DF is broadcast (terms of one doc never leave their
  batch) — the only shuffle in the whole operator is the vocab-sized DF
  aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logparser_ray.stages.textstats import STOPWORDS

# Ordered PII rules: (name, RE2 pattern, replacement). Order matters —
# emails contain dotted digit runs, so they are rewritten before the IPv4
# rule sees the text; counts are taken on the text as each rule sees it,
# which is the same left-to-right composition a nested SQL
# regexp_replace chain expresses.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<ID>"),
]


def pii_redact_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_redacted"
) -> pa.Table:
    """Redact PII spans and count them, fully vectorized (RE2 kernels).

    Appends ``n_email``/``n_ipv4``/``n_idnum`` (int64 match counts, each
    computed on the text AFTER the preceding rules rewrote it) and
    ``out_col`` (the redacted text). SQL parity per rule i:
    ``regexp_replace(<prev>, pattern_i, repl_i, 'g')`` and
    ``len(regexp_extract_all(<prev>, pattern_i))``.
    """
    red = batch[text_col].combine_chunks()
    for name, pat, repl in PII_RULES:
        counts = pc.cast(
            pc.count_substring_regex(red, pat).fill_null(0), pa.int64()
        )  # null text → 0 matches (and stays null in out_col)
        batch = batch.append_column(f"n_{name}", counts)
        red = pc.replace_substring_regex(red, pat, repl)
    return batch.append_column(out_col, red)


def md5_col_batch(batch: pa.Table, col: str, out_col: str) -> pa.Table:
    """Hex md5 of a string column (the oracle-pinning digest — DuckDB
    ``md5()`` parity). Per-row hashlib: ~1 µs/row, used on audit outputs,
    not in the redaction hot path itself."""
    import hashlib

    h = [
        hashlib.md5(s.encode()).hexdigest() if s is not None else None
        for s in batch[col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(h, pa.string()))


def _doc_index(offsets: np.ndarray) -> np.ndarray:
    """Flat-token → batch-local doc index, from list offsets."""
    return np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), offsets[1:] - offsets[:-1]
    )


def curation_stats_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-document repetition/quality statistics, one zero-shuffle pass.

    Appends (all int64; SQL parity via unnest(string_split(text,' '))):

    - ``n_words``     — whitespace token count (empty text counts its one
                        empty token, matching string_split semantics)
    - ``n_distinct``  — distinct token count
    - ``max_word_n``  — occurrences of the modal token (Gopher's
                        top-word-fraction numerator)
    - ``top_bigram_n``— occurrences of the modal adjacent-token bigram
                        (Gopher's top-2-gram-fraction numerator); 0 for
                        docs with < 2 tokens
    - ``n_stop``      — tokens in the STOPWORDS list
    - ``n_symbol``    — characters outside ``[A-Za-z0-9 ]``
    """
    texts = batch[text_col].combine_chunks()
    toks = pc.split_pattern(texts, " ")
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.flatten()
    n = len(batch)
    n_words = (offsets[1:] - offsets[:-1]).astype(np.int64)
    di = _doc_index(offsets)

    wf = (
        pa.table({"di": pa.array(di), "tok": flat})
        .group_by(["di", "tok"])
        .aggregate([([], "count_all")])
    )
    per_doc = wf.group_by(["di"]).aggregate(
        [("count_all", "max"), ("count_all", "count")]
    )
    max_word_n = np.zeros(n, np.int64)
    n_distinct = np.zeros(n, np.int64)
    pdi = per_doc["di"].to_numpy()
    max_word_n[pdi] = per_doc["count_all_max"].to_numpy()
    n_distinct[pdi] = per_doc["count_all_count"].to_numpy()

    top_bigram_n = np.zeros(n, np.int64)
    n_flat = len(flat)
    if n_flat >= 2:
        bg = pc.binary_join_element_wise(
            flat.slice(0, n_flat - 1), flat.slice(1, n_flat - 1), " "
        )
        # a bigram starting at a doc's last token would cross into the next
        # doc — mask those positions out
        valid = np.ones(n_flat - 1, dtype=bool)
        last = offsets[1:] - 1
        valid[last[(last >= 0) & (last < n_flat - 1)]] = False
        bt = (
            pa.table(
                {
                    "di": pa.array(di[: n_flat - 1][valid]),
                    "bg": bg.filter(pa.array(valid)),
                }
            )
            .group_by(["di", "bg"])
            .aggregate([([], "count_all")])
        )
        per_doc_bg = bt.group_by(["di"]).aggregate([("count_all", "max")])
        top_bigram_n[per_doc_bg["di"].to_numpy()] = per_doc_bg[
            "count_all_max"
        ].to_numpy()

    from logparser_ray.stages.textstats import _per_list_sum

    is_stop = np.asarray(
        pc.is_in(flat, value_set=pa.array(STOPWORDS)).fill_null(False)
    )
    n_stop = _per_list_sum(is_stop, offsets)
    n_symbol = np.asarray(
        pc.count_substring_regex(texts, r"[^A-Za-z0-9 ]").fill_null(0),
        dtype=np.int64,
    )  # null text → 0, not an int64-min NaN cast

    out = batch.append_column("n_words", pa.array(n_words))
    out = out.append_column("n_distinct", pa.array(n_distinct))
    out = out.append_column("max_word_n", pa.array(max_word_n))
    out = out.append_column("top_bigram_n", pa.array(top_bigram_n))
    out = out.append_column("n_stop", pa.array(n_stop))
    return out.append_column("n_symbol", pa.array(n_symbol))


# Gopher-style gate defaults, expressed as integer cross-multiplications so
# the SQL oracle evaluates the IDENTICAL predicate (no float ratios):
#   min_words <= n_words <= max_words
#   max_word_n * word_ratio_den <= n_words        (modal word ≤ 1/den)
#   top_bigram_n * bigram_ratio_den <= n_words    (modal bigram ≤ 1/den)
GATE_DEFAULTS = {
    "min_words": 10,
    "max_words": 100_000,
    "word_ratio_den": 8,
    "bigram_ratio_den": 16,
}


def curation_gate(ds, text_col: str = "text", **gate):
    """Append curation stats + an integer ``keep`` flag (1 = passes the
    Gopher-style repetition gate). One streaming ``map_batches`` pass."""
    params = {**GATE_DEFAULTS, **gate}

    def fn(b: pa.Table) -> pa.Table:
        out = curation_stats_batch(b, text_col)
        nw = out["n_words"].to_numpy(zero_copy_only=False)
        keep = (
            (nw >= params["min_words"])
            & (nw <= params["max_words"])
            & (out["max_word_n"].to_numpy(zero_copy_only=False) * params["word_ratio_den"] <= nw)
            & (
                out["top_bigram_n"].to_numpy(zero_copy_only=False)
                * params["bigram_ratio_den"]
                <= nw
            )
        )
        return out.append_column("keep", pa.array(keep.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _ngram_strings(texts: pa.Array, n: int) -> tuple[pa.Array, np.ndarray]:
    """All n-token n-grams (space-joined strings) of a batch of texts,
    plus the doc index of each n-gram. Built from the flat token stream
    with n slices + one vectorized join; n-grams that would cross a doc
    boundary are masked out. Docs with < n tokens contribute nothing."""
    toks = pc.split_pattern(texts, " ")
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.flatten()
    n_flat = len(flat)
    if n_flat < n:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    parts = [flat.slice(j, n_flat - n + 1) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    di = _doc_index(offsets)[: n_flat - n + 1]
    # an n-gram starting at position i is valid iff positions i..i+n-1 are
    # in the same doc ⇔ i + n - 1 < end-offset of i's doc
    ends = offsets[1:][di]
    starts_ok = np.arange(n_flat - n + 1, dtype=np.int64) + n - 1 < ends
    return grams.filter(pa.array(starts_ok)), di[starts_ok]


def _bloom_idx(h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
    """Probe i as a splitmix64-finalized mix of the two 64-bit string
    hashes. Plain double hashing (h1 + i*h2) leaves arithmetic-progression
    structure that measured ~1000x the theoretical FPR at k=17 probes into
    a small power-of-two table (2.1e-5 vs 2.4e-8 on random strings); the
    finalizer's avalanche makes the k probes effectively independent."""
    step = np.uint64(((i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = h1 ^ (h2 + step)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _bloom_build(grams: "pa.Array", bits_per_gram: int = 24):
    """Bloom filter over n-gram strings: (bit_bytes, mask, n_hashes).

    ``m`` is the next power of two ≥ bits_per_gram × n_grams (power of two
    → masking, no modulo) and ``k ≈ 0.693 · bits_per_gram`` probes —
    textbook optimum, FPR ≈ 0.5^k (~8·10⁻⁶ at the default 24 bits/gram).
    Each probe is a splitmix64-finalized mix of two independently keyed
    64-bit string hashes (``_bloom_idx`` — NOT plain double hashing, which
    measured ~1000× the theoretical FPR here), all numpy-vectorized."""
    import pandas as pd

    uniq = pc.unique(grams)
    g = uniq.to_numpy(zero_copy_only=False)
    n_grams = max(1, len(g))
    m = 1 << int(np.ceil(np.log2(max(64, bits_per_gram * n_grams))))
    n_hashes = max(1, int(round(0.693 * bits_per_gram)))
    h1 = pd.util.hash_array(g, hash_key="rayparse-bloom-1").astype(np.uint64)
    h2 = pd.util.hash_array(g, hash_key="rayparse-bloom-2").astype(np.uint64)
    bits = np.zeros(m >> 3, dtype=np.uint8)
    mask = np.uint64(m - 1)
    for i in range(n_hashes):
        idx = _bloom_idx(h1, h2, i) & mask
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bits, mask, n_hashes


def _bloom_probe(bits: np.ndarray, mask: np.uint64, n_hashes: int, g: np.ndarray):
    """Vectorized membership test of gram strings against the bit array."""
    import pandas as pd

    if len(g) == 0:
        return np.zeros(0, dtype=bool)
    h1 = pd.util.hash_array(g, hash_key="rayparse-bloom-1").astype(np.uint64)
    h2 = pd.util.hash_array(g, hash_key="rayparse-bloom-2").astype(np.uint64)
    hit = np.ones(len(g), dtype=bool)
    for i in range(n_hashes):
        idx = _bloom_idx(h1, h2, i) & mask
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        if not hit.any():
            break
    return hit


def decontaminate(
    ds,
    benchmark_texts: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    mode: str = "exact",
    bits_per_gram: int = 24,
):
    """Benchmark decontamination: flag training documents sharing any
    n-token n-gram with an evaluation/benchmark set (the GPT-3 appendix-C
    / PaLM method — Brown et al. 2020, Chowdhery et al. 2022; n=13 is
    GPT-3's choice).

    ``mode="exact"`` (default, the oracle-able path): the benchmark
    n-gram set is built once on the driver, broadcast via ``ray.put``,
    and each batch does one vectorized n-gram build + ``pc.is_in`` —
    zero shuffle, fully streaming. Returns per-doc ``(id_col, n_hits,
    contaminated)`` where ``n_hits`` counts the doc's n-gram OCCURRENCES
    present in the benchmark set (SQL parity: join doc n-grams against
    benchmark n-grams, count matches).

    ``mode="bloom"`` (the memory-scale path): the gram set is folded into
    a Bloom bit array (``bits_per_gram`` bits per distinct gram — 24 bits
    = 3 B/gram vs tens of bytes for the strings, FPR ≈ 8·10⁻⁶) so a
    full-eval-suite set broadcasts in tens of MB per worker instead of
    GB. NO false negatives ever (every truly contaminated doc is flagged);
    ``n_hits`` may overcount by the FPR — a Bloom hit marks a doc for the
    cheap exact recheck, it never clears one.
    """
    import ray

    if mode not in ("exact", "bloom"):
        raise ValueError(mode)
    bench_tbl = pa.array(benchmark_texts, pa.string())
    bench_grams, _ = _ngram_strings(bench_tbl, n)
    if mode == "bloom":
        bloom_ref = ray.put(_bloom_build(bench_grams, bits_per_gram))
    else:
        bench_set = ray.put(pc.unique(bench_grams))

    def flag(b: pa.Table) -> pa.Table:
        grams, di = _ngram_strings(b[text_col].combine_chunks(), n)
        if mode == "bloom":
            bits, mask, n_hashes = ray.get(bloom_ref)
            hit = _bloom_probe(
                bits, mask, n_hashes, grams.to_numpy(zero_copy_only=False)
            )
        else:
            bset = ray.get(bench_set)
            hit = np.asarray(pc.is_in(grams, value_set=bset).fill_null(False))
        # per-doc hit counts via bincount over the doc index
        n_hits = np.bincount(di[hit], minlength=len(b)).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array((n_hits > 0).astype(np.int64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )


def _assert_complete_docs(b: pa.Table, id_col: str) -> None:
    """Raise iff any doc in this batch carries fewer rows than its
    ``_n_terms`` census says it owns — i.e. the doc straddles a block
    boundary. Used by the tfidf broadcast path, whose per-batch top-k is
    exact ONLY over whole docs (the silent-wrong-results hazard a split
    oversized block would otherwise introduce)."""
    ids_np = b[id_col].to_numpy(zero_copy_only=False)
    want = b["_n_terms"].to_numpy(zero_copy_only=False)
    uniq, first_idx, got = np.unique(ids_np, return_index=True, return_counts=True)
    if not (want[first_idx] == got).all():
        bad = uniq[want[first_idx] != got]
        raise RuntimeError(
            f"tfidf_topk broadcast path: doc(s) {bad[:5].tolist()} straddle "
            "a block boundary (Ray split an oversized block); lower "
            "batch/block size or force the join fallback with "
            "broadcast_max_bytes=0"
        )


def tfidf_topk(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    target_expr: str | None = None,
    n_docs: int | None = None,
    broadcast_max_bytes: int | None = None,
):
    """Top-``k`` TF-IDF terms per document (ties: higher score first, then
    term ascending — fully deterministic).

    ``score_bp = floor(tf * ln(N / df) * 10000 + 0.5)`` as int64 basis
    points, where N is the CORPUS document count and df the number of
    corpus documents containing the term; ranking happens on the integer
    score so engine float formatting can't reorder ties. ``target_expr``
    optionally restricts which documents get scored (DF and N always come
    from the full corpus). Pass ``n_docs`` when ``ds`` is a derived
    lineage (``count()`` would re-execute it).

    Returns a Dataset of ``(doc_id, term, tf, df, score_bp, rnk)``.
    """
    import ray
    from ray.data.aggregate import Sum

    from logparser_ray.stages.joins import attach_dim

    if n_docs is None:
        n_docs = ds.count()

    def df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col].combine_chunks(), " ")
        di = _doc_index(np.asarray(toks.offsets, dtype=np.int64))
        pairs = (
            pa.table({"di": pa.array(di), "term": toks.flatten()})
            .group_by(["di", "term"])
            .aggregate([])
        )
        return (
            pairs.group_by(["term"])
            .aggregate([([], "count_all")])
            .rename_columns(["term", "df_part"])
        )

    df_ds = (
        ds.select_columns([text_col])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
    )

    target = ds.filter(expr=target_expr) if target_expr else ds

    def tf_batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col].combine_chunks(), " ")
        di = _doc_index(np.asarray(toks.offsets, dtype=np.int64))
        ids = b[id_col].to_numpy(zero_copy_only=False)[di]
        pairs = (
            pa.table({id_col: pa.array(ids), "term": toks.flatten()})
            .group_by([id_col, "term"])
            .aggregate([([], "count_all")])
            .rename_columns([id_col, "term", "tf"])
        )
        # carry each doc's TOTAL distinct-term count on every row: the
        # broadcast path's per-batch top-k is only exact while a doc's
        # terms stay in ONE block, and Ray splits blocks over
        # target_max_block_size — the count lets the consumer DETECT a
        # straddle and raise instead of silently mis-ranking (ADVICE r03)
        per_doc = pairs.group_by([id_col]).aggregate([([], "count_all")])
        idx = pc.index_in(pairs[id_col], value_set=per_doc[id_col].combine_chunks())
        return pairs.append_column(
            "_n_terms", per_doc["count_all"].combine_chunks().take(idx)
        )

    tf_ds = target.select_columns([id_col, text_col]).map_batches(
        tf_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def score_topk(b: pa.Table, require_complete_docs: bool = False) -> pa.Table:
        if require_complete_docs and b.num_rows:
            # broadcast-path precondition: every doc wholly inside this
            # batch. A block split between tf_batch and here would halve a
            # doc's term set and silently corrupt its top-k — raise loudly
            # instead (callers then rerun with the join fallback, whose
            # per-doc re-rank tolerates scattered terms).
            _assert_complete_docs(b, id_col)
        if "_n_terms" in b.column_names:
            b = b.drop_columns(["_n_terms"])
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.floor(tf * np.log(float(n_docs) / df) * 10_000 + 0.5).astype(
            np.int64
        )
        b = b.append_column("score_bp", pa.array(score))
        import pandas as pd

        pdf = b.to_pandas()
        pdf = pdf.sort_values(
            [id_col, "score_bp", "term"], ascending=[True, False, True]
        )
        pdf["rnk"] = pdf.groupby(id_col).cumcount() + 1
        return pa.Table.from_pandas(pdf[pdf["rnk"] <= k], preserve_index=False)

    # The DF table is vocabulary-sized (bounded, not corpus-sized): pin it
    # once so the size probe and the broadcast don't each re-execute the
    # aggregation lineage.
    from logparser_ray.stages.joins import BROADCAST_MAX_BYTES

    if broadcast_max_bytes is None:
        broadcast_max_bytes = BROADCAST_MAX_BYTES
    df_mat = df_ds.materialize()
    if df_mat.size_bytes() <= broadcast_max_bytes:
        # broadcast path: one map_batches does lookup + score + EXACT
        # per-doc top-k. tf_batch emits each doc's terms inside one block
        # and carries the doc's term count, and score_topk RAISES if a
        # block split ever breaks that precondition (no silent mis-rank);
        # zero extra exchanges on the happy path
        from logparser_ray.stages.joins import collect_dim_table

        ref = ray.put(collect_dim_table(df_mat))

        def lookup_score(b: pa.Table) -> pa.Table:
            d = ray.get(ref)
            idx = pc.index_in(b["term"], value_set=d["term"].combine_chunks())
            b = b.append_column("df", d["df"].combine_chunks().take(idx))
            return score_topk(b, require_complete_docs=True)

        return tf_ds.map_batches(
            lookup_score, batch_format="pyarrow", zero_copy_batch=True
        )

    # join fallback (vocab too big to broadcast): a doc's terms scatter
    # across partitions, so per-batch top-k is a partial — finalize with a
    # per-doc re-rank over the tiny (≤ k·partitions per doc) survivors
    joined = attach_dim(
        tf_ds,
        df_mat,
        fact_key="term",
        dim_key="term",
        dim_cols=["df"],
        dim_bytes_hint=df_mat.size_bytes(),
    )
    topk = joined.map_batches(score_topk, batch_format="pyarrow")

    # finalize with ONE keyed exchange on doc_id (each doc's ≤ k·partitions
    # surviving rows land in one block) + the same vectorized sort/cumcount
    # re-rank score_topk already does per batch — one pandas call per BLOCK,
    # not per doc (a per-doc map_groups is billions of Python group
    # invocations at corpus scale, VERDICT r04 #2).
    from logparser_ray.stages.exchange import hash_shuffle
    from logparser_ray.stages.joins import join_num_partitions

    def refine_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        import pandas as pd

        pdf = b.to_pandas()
        pdf = pdf.sort_values(
            [id_col, "score_bp", "term"], ascending=[True, False, True]
        )
        pdf["rnk"] = (pdf.groupby(id_col).cumcount() + 1).astype(np.int64)
        return pa.Table.from_pandas(pdf[pdf["rnk"] <= k], preserve_index=False)

    with hash_shuffle(topk):
        return (
            topk.repartition(
                num_blocks=join_num_partitions(n_docs), keys=[id_col]
            )
            .map_batches(refine_block, batch_format="pyarrow", zero_copy_batch=True)
            # execute INSIDE the hash_shuffle scope (a lazily-returned plan
            # would run after the strategy restore); survivors are k·docs
            # rows — output-scale, safe to pin
            .materialize()
        )
