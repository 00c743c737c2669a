"""Text-analysis stages for training-data pipelines (build-brief extras):

language-ID (stopword/n-gram heuristic), quality scoring, token counting,
and document fingerprinting (rolling hash). All vectorized per Arrow batch;
no Python loop over rows in any hot path.

These operate on the driver ``documents`` table (``doc_id, text, lang,
source, n_chars``) but are generic over any string column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword markers for the heuristic language-ID; the
# fixture corpus is synthetic so this is a deterministic toy, not linguistics
LANG_MARKERS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "a", "to", "in"},
    "es": {"el", "la", "de", "y", "que", "a"},
    "de": {"der", "die", "und", "das", "zu", "in"},
    "fr": {"le", "la", "et", "de", "un", "en"},
    "zh": {"的", "是", "了", "在", "和"},
}

STOPWORDS = sorted({w for s in LANG_MARKERS.values() for w in s})


def _tokens(texts: pa.Array) -> pa.ListArray:
    return pc.split_pattern(texts, " ")


def _per_list_sum(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum a flat boolean/num array per list row given list offsets."""
    if len(offsets) <= 1:
        return np.zeros(0, dtype=np.int64)
    cums = np.concatenate([[0], np.cumsum(mask.astype(np.int64))])
    return cums[offsets[1:]] - cums[offsets[:-1]]


# BPE-ish pre-tokenizer: word pieces OR single non-word-non-space marks —
# the split most byte-pair tokenizers apply before merges (kept RE2- and
# DuckDB-compatible; GPT-2's exact pattern needs lookaheads RE2 lacks)
BPE_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counts per row: whitespace (``n_tok`` — SQL parity:
    len(string_split(text,' '))) and BPE-ish regex pieces (``n_tok_bpe`` —
    SQL parity: len(regexp_extract_all(text, BPE_RE)))."""
    texts = batch[text_col].combine_chunks()
    toks = _tokens(texts)
    out = batch.append_column(
        "n_tok", pc.cast(pc.list_value_length(toks), pa.int64())
    )
    return out.append_column(
        "n_tok_bpe", pc.cast(pc.count_substring_regex(texts, BPE_RE), pa.int64())
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: token count, mean token length, stopword ratio.

    ``stop_ratio`` SQL parity: len(list_filter(string_split(text,' '),
    x -> x IN (<STOPWORDS>))) / len(string_split(text,' ')).
    """
    texts = batch[text_col].combine_chunks()
    toks = _tokens(texts)
    offsets = np.asarray(toks.offsets)
    flat = toks.flatten()
    n_tok = (offsets[1:] - offsets[:-1]).astype(np.int64)
    is_stop = np.asarray(pc.is_in(flat, value_set=pa.array(STOPWORDS)).fill_null(False))
    n_stop = _per_list_sum(is_stop, offsets)
    denom = np.maximum(n_tok, 1)
    stop_ratio = n_stop / denom
    total_chars = _per_list_sum(
        np.asarray(pc.utf8_length(flat), dtype=np.int64), offsets
    )
    mean_tok_len = total_chars / denom
    n_chars = np.asarray(pc.utf8_length(texts), dtype=np.int64)
    n_punct = np.asarray(
        pc.count_substring_regex(texts, r"[^\w\s]"), dtype=np.int64
    )
    punct_ratio = n_punct / np.maximum(n_chars, 1)
    # integer half-up basis points of the stop ratio: exact int64, so
    # distributed partial sums are order-independent and SQL-reproducible
    # ((n_stop*20000 + denom) // (2*denom) == round_half_up(ratio * 1e4))
    stop_bp = (n_stop * 20000 + denom) // (2 * denom)
    out = batch.append_column("n_tok", pa.array(n_tok))
    out = out.append_column("stop_bp", pa.array(stop_bp.astype(np.int64)))
    out = out.append_column("stop_ratio", pa.array(np.round(stop_ratio, 4)))
    out = out.append_column("mean_tok_len", pa.array(np.round(mean_tok_len, 4)))
    out = out.append_column("punct_ratio", pa.array(np.round(punct_ratio, 4)))
    return out


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: argmax of per-language marker-token hit counts.

    Deterministic tie-break: languages tried in sorted order, first max wins;
    rows with zero hits → 'und'.
    """
    texts = batch[text_col].combine_chunks()
    toks = _tokens(texts)
    offsets = np.asarray(toks.offsets)
    flat = toks.flatten()
    langs = sorted(LANG_MARKERS)
    n = len(batch)
    scores = np.zeros((len(langs), n), dtype=np.int64)
    for i, lang in enumerate(langs):
        hit = np.asarray(
            pc.is_in(flat, value_set=pa.array(sorted(LANG_MARKERS[lang]))).fill_null(False)
        )
        scores[i] = _per_list_sum(hit, offsets)
    best = np.argmax(scores, axis=0)  # first max wins (sorted lang order)
    guess = np.array(langs, dtype=object)[best]
    guess[scores.max(axis=0) == 0] = "und"
    return batch.append_column("lang_guess", pa.array(guess, pa.string()))


_FP_BASE = np.uint64(1099511628211)
_FP_SEED = np.uint64(14695981039346656037)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Order-sensitive rolling (FNV-style) fingerprint over token hashes.

    Two documents share a fingerprint iff their token sequences are equal —
    the cheap exact-dup key (SURVEY.md extras: document fingerprinting).
    """
    import pandas as pd

    texts = batch[text_col].combine_chunks()
    toks = _tokens(texts)
    offsets = np.asarray(toks.offsets)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    th = pd.util.hash_array(flat, hash_key="rayparse-fp-0001").astype(np.uint64)
    n = len(batch)
    fps = np.empty(n, dtype=np.uint64)
    # rolling hash is inherently sequential per doc, but vectorized across
    # docs of equal position: iterate max_len times over a (n,) state vector
    state = np.full(n, _FP_SEED, dtype=np.uint64)
    lengths = offsets[1:] - offsets[:-1]
    max_len = int(lengths.max()) if n else 0
    for j in range(max_len):
        active = lengths > j
        idx = offsets[:-1][active] + j
        state[active] = (state[active] ^ th[idx]) * _FP_BASE
    fps = state
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64).view(np.int64))
    )


def add_textstats(ds, text_col: str = "text", which: str = "quality"):
    fn = {
        "tokens": token_count_batch,
        "quality": quality_batch,
        "langid": langid_batch,
        "fingerprint": fingerprint_batch,
    }[which]
    return ds.map_batches(
        lambda b: fn(b, text_col), batch_format="pyarrow", zero_copy_batch=True
    )


def unigram_xent(ds, *, id_col: str = "doc_id", text_col: str = "text", scale: int = 10_000):
    """Per-document unigram cross-entropy against the CORPUS unigram
    distribution — the classic cheap perplexity proxy for quality scoring
    (documents whose token mix diverges from the corpus read as noise).

    ``xent = -(1/n_tok) Σ ln p(tok)`` with ``p`` from one vocab-sized
    ``groupby(token)`` count (the only shuffle); the log-prob table is
    materialized once, broadcast via ``ray.put``, and each batch does a
    vectorized ``index_in`` + ``take`` + segment-mean — the same
    broadcast-dictionary shape as every other small-side lookup here.
    Returned as ``xent_bp`` = floor(xent·scale + 0.5) int64 so downstream
    thresholds are engine-exact.
    """
    import ray
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        flat = _tokens(b[text_col].combine_chunks()).flatten()
        t = pa.table({"tok": flat})
        return (
            t.group_by(["tok"]).aggregate([([], "count_all")])
            .rename_columns(["tok", "n"])
        )

    vocab = (
        ds.select_columns([text_col])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab-sized; consumed once but pinned for clarity
    )
    from logparser_ray.stages.joins import collect_dim_table

    tbl = collect_dim_table(vocab)
    n_arr = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = n_arr.sum()
    logp = np.log(n_arr / total) if total else n_arr
    ref = ray.put((tbl["tok"].combine_chunks(), logp))

    def score(b: pa.Table) -> pa.Table:
        toks_list, lp = ray.get(ref)
        toks = _tokens(b[text_col].combine_chunks())
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.flatten()
        idx = pc.index_in(flat, value_set=toks_list).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)  # nulls (unseen tokens) → NaN uniformly
        # every token exists in the corpus vocab by construction; guard
        # anyway (e.g. scoring a DIFFERENT corpus against this model):
        # unseen tokens take the rarest-token log-prob
        floor_lp = lp.min() if len(lp) else 0.0
        tok_lp = np.where(np.isnan(idx), floor_lp, lp[np.nan_to_num(idx).astype(np.int64)])
        # per-doc DIRECT sums (reduceat), not cumsum prefix-differences: a
        # whole-batch cumsum makes a doc's float sum depend on the docs
        # before it, so the floored basis-point score could flip by 1 with
        # block layout — breaking the engine-exact integer contract
        n_flat = len(tok_lp)
        starts = offsets[:-1]
        valid = starts < n_flat
        sums = np.zeros(len(starts), dtype=np.float64)
        if n_flat and valid.any():
            red = np.add.reduceat(tok_lp, starts[valid])
            # reduceat wraps when consecutive starts are equal (empty docs):
            # zero those out explicitly
            lens = (offsets[1:] - starts)[valid]
            red[lens == 0] = 0.0
            sums[valid] = red
        n_tok = np.maximum(offsets[1:] - offsets[:-1], 1)
        xent = -(sums / n_tok)
        bp = np.floor(xent * scale + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], "xent_bp": pa.array(bp)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_counts_batch(
    batch: pa.Table, text_col: str = "text", n: int = 2
) -> pa.Table:
    """Per-batch n-gram count partials (the combiner): whitespace tokens,
    space-joined n-grams, never crossing a document boundary.

    Vectorized end to end: one ``split_pattern`` pass, n shifted slices of
    the flat token array joined with ``binary_join_element_wise``, and a
    numpy mask (list-id equality between the first and last token of each
    candidate window) drops the windows that straddle two documents. SQL
    parity (n=2): ``toks[i] || ' ' || toks[i+1]`` for i in 1..len-1.
    """
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    toks = _tokens(batch[text_col].combine_chunks())
    offs = np.asarray(toks.offsets, dtype=np.int64)
    empty = pa.table(
        {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if len(offs) <= 1:
        return empty
    base = offs[0]
    flat = toks.values.slice(base, offs[-1] - base)
    nf = len(flat)
    if nf < n:
        return empty
    sizes = offs[1:] - offs[:-1]
    listid = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    valid = listid[: nf - n + 1] == listid[n - 1 :]
    slices = [flat.slice(i, nf - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*slices, " ")
    grams = grams.filter(pa.array(valid))
    if len(grams) == 0:
        return empty
    agg = pa.table({"gram": grams}).group_by(["gram"]).aggregate(
        [([], "count_all")]
    )
    return agg.rename_columns(["gram", "n"])


def ngram_freq_topk(ds, *, text_col: str = "text", n: int = 2, k: int = 20):
    """Global top-k n-gram frequency: per-batch count partials → one
    vocabulary-sized ``groupby(gram).sum`` (the only shuffle) → top-k by
    ``(n desc, gram asc)``. The same partial-then-tiny-groupby shape as
    ``grouped_count`` — the fact table is scanned once and only distinct
    (gram, count) partials enter the exchange."""
    from ray.data.aggregate import Sum

    partial = ds.select_columns([text_col]).map_batches(
        lambda b: ngram_counts_batch(b, text_col, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = partial.groupby("gram").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "gram"], descending=[True, False]).limit(k)
