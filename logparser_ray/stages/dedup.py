"""Deduplication stages (build-brief extras): exact, MinHash+LSH, SimHash.

Scale notes (the part that matters at 100 TB):

- **Exact**: hash-partition on a content hash, keep first per group — one
  shuffle of (hash, id) pairs, not full rows.
- **MinHash+LSH**: per-batch vectorized shingle→minhash signatures, explode
  to (band_id, band_hash, doc_id) rows (``flat_map`` shape), hash-partition
  by bucket, emit candidate pairs per bucket (vectorized per block), verify
  exact n-gram Jaccard distributed with broadcast shingle-hash arrays. At
  100 TB the broadcast becomes a hash-partitioned join of pairs against the
  shingle table — noted inline.
- **SimHash**: 64-bit signature from token hashes; exact-signature groups
  are dup clusters; near-dup via 16-bit band buckets + Hamming verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Min, Sum

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup_representatives(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "hash",
    num_partitions: int | None = None,
):
    """One representative (min id) + copy count per distinct text value.

    SQL parity: ``SELECT min(id), count(*) FROM t GROUP BY text``.

    ``by="hash"`` (default, the 100 TB path): group on a 128-bit content
    hash (two independent 64-bit keyed hashes) with a per-batch combiner, so
    the shuffle ships ~24 B/row instead of the full text (collision odds at
    10¹² rows ≈ 10²⁴/2¹²⁹ ≈ 10⁻¹⁵ — far below hardware error rates).
    ``by="text"`` groups on the raw text (byte-exact, ships the text).
    ``num_partitions`` right-sizes the aggregation exchange — callers with
    a row hint should pass a small count for small inputs (measured r4:
    the default-width groupby costs ~2 s of pure spin-up on a tiny corpus,
    2–4 partitions cost ~1.3 s).
    """
    if by == "text":
        out = ds.groupby(text_col, num_partitions=num_partitions).aggregate(
            Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
        )
        return out.drop_columns([text_col])

    def hash_partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks().to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(texts, hash_key="rayparse-dedup-1")  # 16-byte keys
        h2 = pd.util.hash_array(texts, hash_key="rayparse-dedup-2")
        t = pa.table(
            {
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
                id_col: b[id_col],
                "n_copies": pa.array(np.ones(len(texts), np.int64)),
            }
        )
        agg = t.group_by(["_h1", "_h2"]).aggregate(
            [(id_col, "min"), ("n_copies", "sum")]
        )
        return agg.rename_columns(["_h1", "_h2", id_col, "n_copies"])

    out = (
        ds.select_columns([id_col, text_col])
        .map_batches(hash_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_h1", "_h2"], num_partitions=num_partitions)
        .aggregate(
            Min(id_col, alias_name=id_col), Sum("n_copies", alias_name="n_copies")
        )
    )
    return out.drop_columns(["_h1", "_h2"])


_SHINGLE_P = np.uint64(1099511628211)  # FNV prime — Horner combine multiplier


def _shingle_hashes(texts, k: int) -> list[np.ndarray]:
    """Per-doc arrays of hashed k-token shingles, built from the FLAT token
    stream: one ``split_pattern`` + one ``hash_array`` over all tokens in the
    batch, then a k-step Horner rolling combine (``h[i] = ((th[i]·P + th[i+1])
    ·P + …)``) gives every k-shingle hash in k vector ops — no per-shingle
    string joins, no per-doc Python beyond slicing. ``texts`` is an Arrow
    string array (or ChunkedArray). Shingle IDENTITY is the hash value:
    equal token sequences hash equal, distinct ones collide with 2⁻⁶⁴ odds —
    set semantics (Jaccard) are unchanged vs hashing the joined strings.

    Docs with fewer than ``k`` tokens contribute one whole-doc shingle
    (Horner over all their tokens); null/empty texts hash like a single
    empty token, matching ``split``'s one-empty-token result on ``""``."""
    if isinstance(texts, np.ndarray):  # accept legacy numpy input
        texts = pa.array(texts.tolist(), pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    th = pd.util.hash_array(flat, hash_key="rayparse-shingle").astype(np.uint64)
    n_flat = len(th)
    if n_flat >= k:
        acc = th[: n_flat - k + 1].copy()
        for j in range(1, k):
            acc = acc * _SHINGLE_P + th[j : n_flat - k + 1 + j]
    else:
        acc = np.empty(0, np.uint64)
    empty_sentinel = pd.util.hash_array(
        np.array([""], dtype=object), hash_key="rayparse-shingle"
    ).astype(np.uint64)
    out: list[np.ndarray] = []
    for i in range(len(offsets) - 1):
        s, e = offsets[i], offsets[i + 1]
        n_tok = e - s
        if n_tok >= k:
            # acc[s : e-k+1] never crosses into the next doc's tokens
            out.append(acc[s : e - k + 1])
        elif n_tok == 0:  # null text (split_pattern yields no tokens)
            out.append(empty_sentinel)
        else:  # short doc → one whole-doc shingle (mod-2⁶⁴ Horner, as above)
            v = int(th[s])
            for j in range(s + 1, e):
                v = (v * 1099511628211 + int(th[j])) & 0xFFFFFFFFFFFFFFFF
            out.append(np.array([v], np.uint64))
    return out


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """map_batches actor: text → (doc_id, band_id, band_hash) rows.

    ``num_perm = bands * rows_per_band``; two docs land in the same bucket
    for a band iff their signature agrees on that band — the standard LSH
    construction, tuned so Jaccard ≥ ``threshold`` pairs are likely caught.
    """

    def __init__(
        self,
        k: int = 3,
        bands: int = 16,
        rows_per_band: int = 4,
        seed: int = 1,
        emit_shingles: bool = False,
    ):
        self.k = k
        self.bands = bands
        self.r = rows_per_band
        self.emit_shingles = emit_shingles
        self.a, self.b = _minhash_params(bands * rows_per_band, seed)

    def signature(self, sh: np.ndarray) -> np.ndarray:
        # (num_perm, n_shingles) universal hash, min over shingles
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # downstream bucket blocks mark truncation with sentinel ids
        # (-1 - band_id) filtered by id >= 0 — negative real ids would be
        # silently dropped as sentinels, so refuse them at signature time
        assert (np.asarray(ids) >= 0).all(), (
            "MinHasher: doc ids must be non-negative (negative values are "
            "reserved for truncation sentinels in the LSH bucket exchange)"
        )
        shingles = _shingle_hashes(batch["text"], self.k)
        n = len(ids)
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for i, sh in enumerate(shingles):
            sig = self.signature(sh).reshape(self.bands, self.r)
            # collapse each band's rows to one bucket hash
            band_hash[i] = (
                sig * np.uint64(1099511628211) ** np.arange(self.r, dtype=np.uint64)
            ).sum(axis=1)
        cols = {
            "doc_id": pa.array(np.repeat(ids, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
        }
        if self.emit_shingles:
            # packed sorted-unique shingle hashes (uint64 LE bytes), repeated
            # per band row — lets the bucket block verify exact Jaccard
            # in-place with no second shuffle (see minhash_near_dupes)
            blobs = [np.unique(sh).astype("<u8").tobytes() for sh in shingles]
            cols["sh"] = pa.array(
                [blobs[i] for i in range(n) for _ in range(self.bands)], pa.binary()
            )
        return pa.table(cols)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(zip(*[text_a.split(" ")[i:] for i in range(k)])) if text_a else set()
    sb = set(zip(*[text_b.split(" ")[i:] for i in range(k)])) if text_b else set()
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _jaccard_packed(sa_blob: bytes, sb_blob: bytes) -> float:
    sa = np.frombuffer(sa_blob, dtype="<u8")
    sb = np.frombuffer(sb_blob, dtype="<u8")
    if not len(sa) and not len(sb):
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def _bucket_jaccard_pairs(blobs: list, threshold: float):
    """ALL-PAIRS exact Jaccard inside one LSH bucket, vectorized: build the
    (m docs × v distinct shingles) 0/1 incidence matrix and one BLAS matmul
    yields every pairwise intersection at once — the per-pair
    ``np.intersect1d`` loop cost ~5 µs × O(m²) pairs and dominated the
    whole operator on dup-heavy corpora (measured r4: 4.7 s for a 540 k-
    pair sf0.1 run, ~3 s of it in the loop). Intersections stay ≤ 2²⁴ so
    the float32 matmul is exact; the division happens in float64 on the
    integer values, bit-identical to ``_jaccard_packed``.

    Returns ``(ii, jj, jac)`` index pairs (ii < jj, positions into
    ``blobs``) with Jaccard ≥ threshold."""
    m = len(blobs)
    arrs = [np.frombuffer(b, dtype="<u8") for b in blobs]
    sizes = np.array([a.size for a in arrs], dtype=np.int64)
    if m * max(1, int(sizes.sum())) > 32_000_000 or sizes.max(initial=0) >= 1 << 24:
        # memory/exactness guard: m×v cells bound the incidence matrix
        # (32 M float32 cells = 128 MB) and intersections must stay < 2²⁴
        # for the float32 matmul to be exact — past either bound, fall
        # back to the O(1)-memory per-pair kernel (review r4: a
        # low-threshold bucket of 200 long mostly-dissimilar docs would
        # otherwise allocate a multi-GB matrix)
        ii_l, jj_l, jv_l = [], [], []
        for i in range(m):
            for j in range(i + 1, m):
                v = _jaccard_packed(blobs[i], blobs[j])
                if v >= threshold:
                    ii_l.append(i)
                    jj_l.append(j)
                    jv_l.append(v)
        return (
            np.asarray(ii_l, np.int64),
            np.asarray(jj_l, np.int64),
            np.asarray(jv_l, np.float64),
        )
    allv = np.concatenate(arrs) if sizes.sum() else np.empty(0, np.uint64)
    uniq_v, inv = np.unique(allv, return_inverse=True)
    M = np.zeros((m, max(1, uniq_v.size)), dtype=np.float32)
    M[np.repeat(np.arange(m), sizes), inv] = 1.0
    inter = (M @ M.T).astype(np.int64)
    union = sizes[:, None] + sizes[None, :] - inter
    jac = inter / np.maximum(union, 1)
    # both-empty pairs are identical by convention (mirrors _jaccard_packed)
    empty = sizes == 0
    if empty.any():
        jac[np.ix_(empty, empty)] = 1.0
    ii, jj = np.triu_indices(m, k=1)
    ok = jac[ii, jj] >= threshold
    return ii[ok], jj[ok], jac[ii, jj][ok]


def minhash_near_dupes(
    ds,
    *,
    k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    verify: str = "inline",
    n_docs: int | None = None,
):
    """Full MinHash-LSH near-dup pipeline → pandas DataFrame of verified pairs
    ``(a, b, jaccard)`` sorted by (a, b). Fully distributed — nothing
    row-scale touches the driver, and no stage executes twice.

    ``verify`` selects how exact n-gram Jaccard is confirmed:

    - ``"inline"`` (default): each doc's packed sorted-unique shingle hashes
      ride along with its ``(band_id, band_hash)`` rows through the ONE
      bucket shuffle, so each bucket block emits *verified* pairs directly;
      a ``groupby(a, b)`` dedups pairs that agree on several bands. Shuffle
      payload is ``bands × |shingles| × 8 B`` per doc (~7 KB at 16 bands /
      50 tokens) — the classic LSH dup-shipping trade, and still one
      all-to-all instead of three.
    - ``"join"``: ids-only bucket shuffle → candidate-pair ``groupby``
      dedup → two ``Dataset.join``s against the per-doc shingle table.
      Minimum shuffle bytes, but three all-to-all exchanges and join
      aggregator actor pools — needs a cluster with CPUs to spare (it can
      starve a ≤4-CPU local cluster; measured 2026-08-17).
    """
    if verify not in ("inline", "join"):
        raise ValueError(verify)
    # size the bucket shuffle from the input row count (parquet metadata /
    # in-memory — cheap), NOT from bands_ds.count(), which would execute the
    # MinHasher stage a second time just to size blocks. Counted BEFORE the
    # strategy flip so an exception here can't leak HASH_SHUFFLE. Callers
    # holding a DERIVED dataset (count() would re-execute its lineage) pass
    # the size as the n_docs hint instead.
    if n_docs is None:
        n_docs = ds.count()

    def minhash_batch(b: pa.Table) -> pa.Table:
        # stateless task, not an actor pool: MinHasher's only state is the
        # (a, b) permutation vectors — microseconds to rebuild per batch —
        # and plain tasks scale to every free CPU with zero pool spin-up
        # (the (1, 4) pool's startup dominated the stage at bench scale)
        return MinHasher(
            k=k,
            bands=bands,
            rows_per_band=rows_per_band,
            emit_shingles=verify == "inline",
        )(b)

    bands_ds = ds.select_columns(["doc_id", "text"]).map_batches(
        minhash_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    n_blocks = max(4, min(64, (n_docs * bands) // 50_000 + 4))

    from logparser_ray.stages.exchange import hash_shuffle

    with hash_shuffle(ds):
        if verify == "inline":
            out = _near_dupes_inline(bands_ds, n_blocks, threshold)
        else:
            out = _near_dupes_join(ds, bands_ds, n_blocks, n_docs, k, threshold)
    n_trunc = int(out.attrs.get("n_truncated_buckets", 0))
    if n_trunc:  # no silent caps: the pair list under-reports these buckets
        import logging

        logging.getLogger(__name__).warning(
            "minhash_near_dupes: %d LSH bucket(s) exceeded the 200-id cap "
            "and were truncated to their 200 smallest ids; the pair list "
            "under-reports those mega-dup clusters (use clusters/"
            "representatives for them)",
            n_trunc,
        )
    if len(out) == 0:
        out = pd.DataFrame({"a": [], "b": [], "jaccard": []})
    else:
        out = out.sort_values(["a", "b"]).reset_index(drop=True)
    out.attrs["n_truncated_buckets"] = n_trunc
    return out


def _near_dupes_inline(bands_ds, n_blocks: int, threshold: float) -> pd.DataFrame:
    """One bucket shuffle; per-block group_by + in-place Jaccard verify.
    Candidate pairs agreeing on several bands are verified once per band
    (identical values — intersect1d on ~50-element arrays is µs) and
    collapsed by a drop_duplicates on the *returned* frame: the verified
    pair list IS the result handed to the caller, so deduping it driver-side
    adds no scale cost beyond returning it (duplicate factor ≤ bands;
    measured 1.16× at sf0.1 — a distributed groupby here cost 12 s of
    hash-shuffle overhead on a 5 MB result)."""

    def verified_pairs_in_block(b: pa.Table) -> pa.Table:
        agg = b.group_by(["band_id", "band_hash"]).aggregate(
            [("doc_id", "list"), ("sh", "list")]
        )
        out_a, out_b, out_j = [], [], []
        for band_id, band_hash, ids, blobs in zip(
            agg["band_id"].to_pylist(),
            agg["band_hash"].to_pylist(),
            agg["doc_id_list"].to_pylist(),
            agg["sh_list"].to_pylist(),
        ):
            if len(ids) < 2:
                continue
            by_id = dict(zip(ids, blobs))
            # deterministic truncation of pathological buckets (smallest ids
            # kept) — a mega dup group implies O(m²) pairs no pair listing
            # avoids; truncating beats silently dropping the whole bucket.
            # Truncation is COUNTED, not silent (VERDICT r03 #5): one
            # sentinel row per truncated bucket, a = -1 - band_id (< 0,
            # impossible for a doc id) and b = the bucket's band hash —
            # unique per bucket, so driver-side pair dedup can't collapse
            # counts from different buckets.
            if len(by_id) > 200:
                out_a.append(-1 - int(band_id))
                out_b.append(int(band_hash))
                out_j.append(0.0)
            u = sorted(by_id)[:200]
            if len(u) < 2:
                continue
            if len(u) <= 4:  # tiny bucket: the pair loop beats matrix setup
                for i in range(len(u)):
                    for j in range(i + 1, len(u)):
                        jac = _jaccard_packed(by_id[u[i]], by_id[u[j]])
                        if jac >= threshold:
                            out_a.append(u[i])
                            out_b.append(u[j])
                            out_j.append(jac)
            else:
                ii, jj, jac = _bucket_jaccard_pairs(
                    [by_id[x] for x in u], threshold
                )
                ua = np.asarray(u, dtype=np.int64)
                out_a.extend(ua[ii].tolist())
                out_b.extend(ua[jj].tolist())
                out_j.extend(jac.tolist())
        return pa.table(
            {
                "a": pa.array(np.asarray(out_a, np.int64)),
                "b": pa.array(np.asarray(out_b, np.int64)),
                "jaccard": pa.array(np.round(np.asarray(out_j, np.float64), 4)),
            }
        )

    out = (
        bands_ds.repartition(num_blocks=n_blocks, keys=["band_id", "band_hash"])
        .map_batches(verified_pairs_in_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = out.drop_duplicates(["a", "b"]).reset_index(drop=True)
    n_trunc = int((out["a"] < 0).sum())
    out = out[out["a"] >= 0].reset_index(drop=True)
    out.attrs["n_truncated_buckets"] = n_trunc
    return out


def _near_dupes_join(
    ds, bands_ds, n_blocks: int, n_docs: int, k: int, threshold: float
) -> pd.DataFrame:
    """Ids-only buckets + pair⋈shingle hash joins (see minhash_near_dupes)."""

    def pairs_in_block(b: pa.Table) -> pa.Table:
        agg = b.group_by(["band_id", "band_hash"]).aggregate([("doc_id", "list")])
        out_a, out_b = [], []
        for band_id, band_hash, ids in zip(
            agg["band_id"].to_pylist(),
            agg["band_hash"].to_pylist(),
            agg["doc_id_list"].to_pylist(),
        ):
            uniq = set(ids)
            if len(uniq) > 200:  # counted truncation — sentinel per bucket
                out_a.append(-1 - int(band_id))
                out_b.append(int(band_hash))
            u = sorted(uniq)[:200]  # deterministic mega-bucket truncation
            if len(u) < 2:
                continue
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    out_a.append(u[i])
                    out_b.append(u[j])
        return pa.table(
            {
                "a": pa.array(np.asarray(out_a, np.int64)),
                "b": pa.array(np.asarray(out_b, np.int64)),
            }
        )

    n_join = max(2, min(32, n_docs // 25_000 + 2))
    pairs_all = (
        bands_ds.repartition(num_blocks=n_blocks, keys=["band_id", "band_hash"])
        .map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)
        # distributed dedup (a pair repeats once per agreeing band); the
        # sentinel rows are unique per truncated bucket so they survive
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()  # consumed twice: sentinel count + join input
    )
    n_trunc = pairs_all.filter(expr="a < 0").count()
    # sentinels must not reach the doc_id joins below (no doc has id < 0,
    # an inner join would drop them silently — count them first instead)
    pairs_ds = pairs_all.filter(expr="a >= 0")

    def shingles_of(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        hs = [np.unique(h) for h in _shingle_hashes(b["text"], k)]
        # packed as binary (uint64 LE bytes): Arrow's hash join rejects
        # list<> payload columns but carries var-len binary fine
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array([h.astype("<u8").tobytes() for h in hs], pa.binary()),
            }
        )

    # materialize the (small: id + packed-hash) shingle table ONCE — both
    # joins consume it, and separate lineages would scan + hash the corpus
    # twice for identical results
    sh = ds.select_columns(["doc_id", "text"]).map_batches(
        shingles_of, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # the join drops the right key column (doc_id) from its output
    j = pairs_ds.join(
        sh, "inner", num_partitions=n_join, on=("a",), right_on=("doc_id",)
    ).rename_columns({"sh": "sh_a"})
    j = j.join(
        sh, "inner", num_partitions=n_join, on=("b",), right_on=("doc_id",)
    ).rename_columns({"sh": "sh_b"})

    def verify_batch(b: pa.Table) -> pa.Table:
        a_ids = b["a"].to_numpy(zero_copy_only=False)
        b_ids = b["b"].to_numpy(zero_copy_only=False)
        sh_a = b["sh_a"].to_pylist()
        sh_b = b["sh_b"].to_pylist()
        jac = np.array(
            [_jaccard_packed(sh_a[i], sh_b[i]) for i in range(len(a_ids))],
            dtype=np.float64,
        )
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a_ids[keep]),
                "b": pa.array(b_ids[keep]),
                "jaccard": pa.array(np.round(jac[keep], 4)),
            }
        )

    out = j.map_batches(
        verify_batch, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    out.attrs["n_truncated_buckets"] = int(n_trunc)
    return out


def minhash_against_prior(
    new_ds,
    prior_ds,
    *,
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    n_new: int | None = None,
    n_prior: int | None = None,
    max_bucket: int = 200,
) -> pd.DataFrame:
    """Incremental NEAR-dup: for each doc of ``new_ds`` whose exact k-gram
    Jaccard against some ``prior_ds`` doc is ≥ ``threshold``, report the
    best prior match — the continuous-ingestion counterpart of
    ``dedup_against_prior`` (which only catches byte-exact repeats; a
    re-crawled page with a new timestamp needs this one).

    Returns a pandas DataFrame ``(doc_id, dup_of, jaccard)``, one row per
    MATCHED new doc (``dup_of`` = the prior doc with the highest verified
    Jaccard, ties → smallest prior id); unmatched new docs are absent.
    Ids may overlap between snapshots — sides are discriminated by a tag
    column, never by id value.

    Scale shape (same discipline as ``minhash_near_dupes``): both sides
    band-hash with the SAME seed, so a new/prior pair collides in a band
    bucket with the standard LSH probability; ONE bucket exchange of
    ``(band_id, band_hash, id, side, shingles)`` rows; each bucket block
    verifies ONLY new×prior candidates in place (intra-side pairs are
    deliberately out of scope — run ``minhash_near_dupes`` within a batch
    for those) and emits its per-new best. The driver reduces
    per-(new, bucket) bests to one row per new doc — output-scale, bounded
    by the number of matched new docs, never by corpus size. Mega buckets
    cap the PRIOR side at ``max_bucket`` smallest ids (counted via
    ``n_truncated_buckets`` attr, never silent); the new side is never
    capped — every new doc keeps its chance to match.
    """
    if n_new is None:
        n_new = new_ds.count()
    if n_prior is None:
        n_prior = prior_ds.count()

    def bander(side: int):
        def fn(b: pa.Table) -> pa.Table:
            if id_col != "doc_id":  # MinHasher reads the canonical id name
                b = b.rename_columns(
                    ["doc_id" if c == id_col else c for c in b.column_names]
                )
            t = MinHasher(
                k=k, bands=bands, rows_per_band=rows_per_band, emit_shingles=True
            )(b)
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    new_bands = new_ds.select_columns([id_col, "text"]).map_batches(
        bander(0), batch_format="pyarrow", zero_copy_batch=True
    )
    prior_bands = prior_ds.select_columns([id_col, "text"]).map_batches(
        bander(1), batch_format="pyarrow", zero_copy_batch=True
    )
    both = new_bands.union(prior_bands)
    n_blocks = max(4, min(64, ((n_new + n_prior) * bands) // 50_000 + 4))

    def best_in_block(b: pa.Table) -> pa.Table:
        agg = b.group_by(["band_id", "band_hash"]).aggregate(
            [("doc_id", "list"), ("sh", "list"), ("_side", "list")]
        )
        out_id, out_of, out_j = [], [], []
        for band_id, band_hash, ids, blobs, sides in zip(
            agg["band_id"].to_pylist(),
            agg["band_hash"].to_pylist(),
            agg["doc_id_list"].to_pylist(),
            agg["sh_list"].to_pylist(),
            agg["_side_list"].to_pylist(),
        ):
            if len(ids) < 2:
                continue
            news = {i: s for i, s, sd in zip(ids, blobs, sides) if sd == 0}
            priors = {i: s for i, s, sd in zip(ids, blobs, sides) if sd == 1}
            if not news or not priors:
                continue
            if len(priors) > max_bucket:  # counted truncation — prior side
                out_id.append(-1 - int(band_id))
                out_of.append(int(band_hash))
                out_j.append(0.0)
                priors = {i: priors[i] for i in sorted(priors)[:max_bucket]}
            p_ids = sorted(priors)
            for ni, nsh in news.items():
                best_j, best_p = 0.0, None
                for pi in p_ids:
                    jac = _jaccard_packed(nsh, priors[pi])
                    if jac >= threshold and (
                        best_p is None or jac > best_j
                    ):  # ties keep the SMALLEST prior id (p_ids is sorted)
                        best_j, best_p = jac, pi
                if best_p is not None:
                    out_id.append(ni)
                    out_of.append(best_p)
                    out_j.append(best_j)
        # UNROUNDED jaccard: the driver reduce below picks each new doc's
        # best across buckets, and reducing on rounded values could prefer
        # a lower-true-Jaccard prior whose rounded value ties (review r4)
        return pa.table(
            {
                id_col: pa.array(np.asarray(out_id, np.int64)),
                "dup_of": pa.array(np.asarray(out_of, np.int64)),
                "jaccard": pa.array(np.asarray(out_j, np.float64)),
            }
        )

    from logparser_ray.stages.exchange import hash_shuffle

    # flip the UNION's context: execution plans under the combined
    # lineage's DataContext copy, not either input's
    with hash_shuffle(both):
        out = (
            both.repartition(num_blocks=n_blocks, keys=["band_id", "band_hash"])
            .map_batches(best_in_block, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
    n_trunc = int((out[id_col] < 0).sum()) if len(out) else 0
    if n_trunc:
        import logging

        logging.getLogger(__name__).warning(
            "minhash_against_prior: %d bucket(s) exceeded max_bucket=%d on "
            "the prior side and were truncated to the %d smallest ids; "
            "matches against the dropped priors are not reported",
            n_trunc,
            max_bucket,
            max_bucket,
        )
    out = out[out[id_col] >= 0]
    if len(out) == 0:
        out = pd.DataFrame({id_col: [], "dup_of": [], "jaccard": []}).astype(
            {id_col: np.int64, "dup_of": np.int64, "jaccard": np.float64}
        )
    else:
        # one row per new doc: max EXACT jaccard, ties → smallest prior id;
        # round once at the end (display convention shared with
        # minhash_near_dupes)
        out = (
            out.sort_values(
                [id_col, "jaccard", "dup_of"], ascending=[True, False, True]
            )
            .drop_duplicates([id_col])
            .reset_index(drop=True)
        )
        out["jaccard"] = np.round(out["jaccard"].to_numpy(), 4)
    out.attrs["n_truncated_buckets"] = n_trunc
    return out


def near_dup_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over near-dup pairs → ``(doc_id, cluster_id)``
    with ``cluster_id`` = the component's smallest doc id.

    Runs driver-side union-find: the pair list is OUTPUT-scale (bounded by
    the verified near-dup count), orders of magnitude below corpus scale —
    the standard final step of every MinHash dedup pipeline. Only docs that
    appear in some pair are returned (singletons are their own implicit
    cluster)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["a"].astype(int), pairs["b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = sorted(set(pairs["a"].astype(int)) | set(pairs["b"].astype(int)))
    return pd.DataFrame(
        {"doc_id": ids, "cluster_id": [find(i) for i in ids]}, dtype=np.int64
    )


def drop_near_dupes(ds, pairs: pd.DataFrame, id_col: str = "doc_id"):
    """Filter a corpus to one representative (smallest id) per near-dup
    cluster — the dedup pipeline's actual deliverable.

    The drop-set (non-representative member ids) is broadcast once via
    ``ray.put`` and applied as a vectorized anti-membership filter per
    batch; the corpus itself streams."""
    clusters = near_dup_clusters(pairs)
    drop_ids = clusters.loc[
        clusters["doc_id"] != clusters["cluster_id"], "doc_id"
    ].to_numpy(np.int64)
    drop_ref = ray.put(pa.array(drop_ids))

    def keep(b: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        member = pc.is_in(b[id_col], value_set=drop)
        return b.filter(pc.invert(member))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


class SimHasher:
    """map_batches fn: 64-bit simhash over token hashes → ``simhash`` column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        offsets = np.asarray(toks.offsets)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        th = pd.util.hash_array(flat, hash_key="rayparse-simhash").astype(np.uint64)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1
        cums = np.concatenate([np.zeros((1, 64), np.int64), np.cumsum(bits, axis=0)])
        per_doc = cums[offsets[1:]] - cums[offsets[:-1]]  # (n, 64) bit votes
        sig = (per_doc > 0).astype(np.uint64)
        val = (sig << np.arange(64, dtype=np.uint64)).sum(axis=1)
        _ = texts
        return batch.append_column("simhash", pa.array(val.view(np.int64)))


def simhash_clusters(ds):
    """Exact-simhash dup clusters: ``(simhash, n_docs, min_doc_id)`` with n>1."""
    sh = ds.select_columns(["doc_id", "text"]).map_batches(
        SimHasher(), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = sh.groupby("simhash").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="min_doc_id")
    )
    return agg.filter(expr="n_docs > 1")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_near_dupes(
    ds,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket: int = 500,
    n_docs: int | None = None,
):
    """All pairs with simhash Hamming distance ≤ ``max_hamming`` — the
    banded SimHash near-dup path.

    Pigeonhole: with ``bands`` equal 64/bands-bit bands and
    ``max_hamming < bands``, any qualifying pair agrees exactly on ≥ 1 band
    — so candidate generation (bucket shuffle on (band_id, band_value)) has
    recall 1 and the output is the EXACT qualifying pair set, deterministic
    **as long as every bucket fits ``max_bucket``**. Buckets beyond that are
    truncated to their ``max_bucket`` smallest ids (deterministic, NOT
    silently skipped): a dup group of size m implies O(m²) output pairs, so
    no exact pair LISTING can avoid the quadratic blowup — for massive
    exact-dup groups use ``simhash_clusters`` (group representation) instead.
    Same one-shuffle shape as the MinHash inline verify: the full signature
    rides with each band row; buckets verify Hamming in place (vectorized
    XOR + SWAR popcount); the returned frame is deduped driver-side.
    Returns pandas ``(a, b, hamming)`` sorted by (a, b).
    """
    if not 64 % bands == 0:
        raise ValueError("bands must divide 64")
    if max_hamming >= bands:
        raise ValueError("max_hamming must be < bands for exact recall")
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        t = SimHasher()(batch)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # same sentinel scheme as MinHash buckets: negative ids reserved
        assert (np.asarray(ids) >= 0).all(), (
            "simhash_near_dupes: doc ids must be non-negative (negative "
            "values are reserved for truncation sentinels)"
        )
        sig = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band_val = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            band_val[:, b] = ((sig >> np.uint64(b * width)) & mask).view(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_val": pa.array(band_val.reshape(-1)),
                "sig": pa.array(np.tile(sig.view(np.int64), (bands, 1)).T.reshape(-1)),
            }
        )

    if n_docs is None:  # hint avoids re-executing a derived lineage
        n_docs = ds.count()  # before the strategy flip — can't leak on failure

    def pairs_in_block(b: pa.Table) -> pa.Table:
        agg = b.group_by(["band_id", "band_val"]).aggregate(
            [(id_col, "list"), ("sig", "list")]
        )
        out_a, out_b, out_h = [], [], []
        for band_id, band_val, ids, sigs in zip(
            agg["band_id"].to_pylist(),
            agg["band_val"].to_pylist(),
            agg[f"{id_col}_list"].to_pylist(),
            agg["sig_list"].to_pylist(),
        ):
            if len(ids) < 2:
                continue
            order = np.argsort(ids)
            u_ids = np.asarray(ids, np.int64)[order]
            u_sig = np.asarray(sigs, np.int64).view(np.uint64)[order]
            keep = np.concatenate([[True], u_ids[1:] != u_ids[:-1]])
            u_ids, u_sig = u_ids[keep], u_sig[keep]
            if len(u_ids) > max_bucket:
                # deterministic truncation (smallest ids) — see docstring.
                # Counted, not silent: sentinel row per truncated bucket
                # (a < 0 is impossible for a doc id; b = band value keeps
                # sentinels unique per bucket across the pair dedup)
                out_a.append(-1 - int(band_id))
                out_b.append(int(band_val))
                out_h.append(0)
                u_ids, u_sig = u_ids[:max_bucket], u_sig[:max_bucket]
            m = len(u_ids)
            if m < 2:
                continue
            ham = _popcount64(u_sig[:, None] ^ u_sig[None, :])
            ii, jj = np.nonzero(np.triu(ham <= max_hamming, k=1))
            out_a.extend(u_ids[ii])
            out_b.extend(u_ids[jj])
            out_h.extend(ham[ii, jj])
        return pa.table(
            {
                "a": pa.array(np.asarray(out_a, np.int64)),
                "b": pa.array(np.asarray(out_b, np.int64)),
                "hamming": pa.array(np.asarray(out_h, np.int64)),
            }
        )

    from logparser_ray.stages.exchange import hash_shuffle

    with hash_shuffle(ds):
        n_blocks = max(4, min(64, (n_docs * bands) // 50_000 + 4))
        out = (
            ds.select_columns([id_col, "text"])
            .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=["band_id", "band_val"])
            .map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
    out = out.drop_duplicates(["a", "b"]).reset_index(drop=True)
    n_trunc = int((out["a"] < 0).sum()) if len(out) else 0
    if n_trunc:
        import logging

        logging.getLogger(__name__).warning(
            "simhash_near_dupes: %d band bucket(s) exceeded max_bucket=%d "
            "and were truncated; the pair list under-reports those "
            "mega-dup clusters",
            n_trunc,
            max_bucket,
        )
    if len(out) == 0:
        out = pd.DataFrame({"a": [], "b": [], "hamming": []})
    else:
        out = (
            out[out["a"] >= 0]
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
    out.attrs["n_truncated_buckets"] = n_trunc
    return out


def dedup_against_prior(
    ds,
    prior,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_max_bytes: int = 64 << 20,
):
    """Incremental exact dedup: keep only rows of ``ds`` whose content
    hash is NOT present in ``prior`` (a previously-ingested snapshot) —
    the continuous-ingestion shape where each new batch of crawl data
    dedups against the existing corpus without reprocessing it.

    Both sides reduce to the same 128-bit keyed content hash as
    ``exact_dedup_representatives``. The prior side ships only hashes
    (~16 B/doc): broadcast via ``ray.put`` + ``pc.is_in`` per batch when
    it fits ``prior_max_bytes``, else a distributed ANTI join (left join
    on hash, keep misses) — same semantics, no per-worker copy. Within
    ``ds`` itself, first-per-hash wins (min id), so the result is also
    internally deduped.
    """

    def hashes(b: pa.Table, keep_cols: bool) -> pa.Table:
        texts = b[text_col].combine_chunks().to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(texts, hash_key="rayparse-dedup-1").view(np.int64)
        h2 = pd.util.hash_array(texts, hash_key="rayparse-dedup-2").view(np.int64)
        t = pa.table({"_h1": pa.array(h1), "_h2": pa.array(h2)})
        if keep_cols:
            for c in b.column_names:
                t = t.append_column(c, b[c])
        return t

    prior_h = (
        prior.select_columns([text_col])
        .map_batches(
            lambda b: hashes(b, False).group_by(["_h1", "_h2"]).aggregate([]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # consumed twice below (size probe + broadcast/join)
    )
    new_h = ds.map_batches(
        lambda b: hashes(b, True), batch_format="pyarrow", zero_copy_batch=True
    )

    if prior_h.size_bytes() <= prior_max_bytes:
        from logparser_ray.stages.joins import collect_dim_table

        tbl = collect_dim_table(prior_h)  # empty-prior-safe (bootstrap run)
        # premix the prior's two 64-bit halves into ONE uint64 key on the
        # driver — done once, halves the broadcast bytes, and avoids every
        # batch re-mixing the whole prior (collision odds 2^-64 on top of
        # matching h1)
        _MIX = np.uint64(0x9E3779B97F4A7C15)
        if tbl.num_rows:
            mix_p = (
                tbl["_h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * _MIX
                ^ tbl["_h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        else:  # bootstrap: nothing ingested yet, everything is fresh
            mix_p = np.empty(0, np.uint64)
        seen = ray.put(np.sort(mix_p))

        def keep_new(b: pa.Table) -> pa.Table:
            p_sorted = ray.get(seen)
            mix_b = (
                b["_h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                ^ b["_h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            # sorted membership: np.isin would re-sort the prior per batch
            pos = np.searchsorted(p_sorted, mix_b)
            pos = np.clip(pos, 0, max(len(p_sorted) - 1, 0))
            hit = (
                (p_sorted[pos] == mix_b) if len(p_sorted) else
                np.zeros(len(mix_b), dtype=bool)
            )
            return b.filter(pa.array(~hit)).drop_columns(["_h1", "_h2"])

        filtered = new_h.map_batches(
            keep_new, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        marked = prior_h.map_batches(
            lambda b: b.append_column(
                "_seen", pa.array(np.ones(len(b), np.int8))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        from logparser_ray.stages.joins import join_num_partitions

        j = new_h.join(
            marked,
            "left_outer",
            num_partitions=join_num_partitions(),
            on=("_h1", "_h2"),
        )
        filtered = j.map_batches(
            lambda b: b.filter(pc.is_null(b["_seen"])).drop_columns(
                ["_h1", "_h2", "_seen"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # internal first-per-hash dedup of the survivors (min id wins) — reuse
    # the existing representative aggregation on the already-filtered rows
    return exact_dedup_representatives(filtered, id_col=id_col, text_col=text_col)


# chunk occurrence keys are doc_id * _SPAN_KEY_SCALE + chunk_idx; a doc with
# >= _SPAN_KEY_SCALE chunks would collide with the next doc's key space, so
# _span_chunks refuses such inputs (raise, not silent corruption)
_SPAN_KEY_SCALE = 1_000_000


def _span_chunks(texts, span_tokens: int):
    """Vectorized non-overlapping ``span_tokens``-token chunking of a batch:
    one split, then ``ceil(max_len/k)`` ``list_slice`` + ``binary_join``
    vector ops — no per-row Python. Returns (per-chunk-index list of
    (chunk_strings, row_mask), tokens_per_row)."""
    toks = pc.split_pattern(texts, " ")
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    lengths = offsets[1:] - offsets[:-1]
    max_chunks = int(np.ceil(lengths.max() / span_tokens)) if len(lengths) else 0
    if max_chunks >= _SPAN_KEY_SCALE:
        raise ValueError(
            f"dedup_spans: a document has {max_chunks} chunks >= "
            f"{_SPAN_KEY_SCALE}; occurrence keys would collide across docs. "
            f"Raise span_tokens or pre-split oversized documents."
        )
    out = []
    for i in range(max_chunks):
        sl = pc.list_slice(toks, i * span_tokens, (i + 1) * span_tokens)
        joined = pc.binary_join(sl, " ")
        mask = lengths > i * span_tokens
        out.append((joined, mask))
    return out, lengths


def dedup_spans(
    ds,
    *,
    span_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    winners_max_bytes: int = 256 << 20,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """C4-style intra-corpus SPAN dedup (Raffel et al. 2020 deduplicate
    repeated three-sentence spans; with no sentence structure the span is a
    fixed ``span_tokens``-token non-overlapping chunk): every chunk keeps
    only its FIRST occurrence in ``(doc_id, chunk_idx)`` order and each doc
    reassembles from its surviving chunks — docs whose every chunk repeats
    earlier text drop out entirely.

    Scale shape (the exact-dedup discipline applied per span): phase 1
    ships 24 B/chunk ``(hash128, occurrence_key)`` partials through one
    grouped Min aggregation — the winner of each distinct chunk is the
    minimum ``doc_id·10⁶ + chunk_idx`` key, so block layout can never
    change the outcome. Phase 2 re-chunks each doc IN ITS OWN BATCH and
    keeps chunks whose key is in the winner set: broadcast ``pc.is_in``
    under ``winners_max_bytes`` (8 B per distinct chunk), distributed
    semi-join + one keyed exchange on ``id_col`` past it. Reassembly is
    batch-local either way (a doc's chunks never leave its row).

    Returns a Dataset ``(id_col, text_dedup, n_kept, n_dropped)`` without
    fully-deduplicated docs. Requires integer ids < 2⁴³ and docs shorter
    than 10⁶ chunks (asserted).
    """
    from ray.data.aggregate import Min

    if n_rows is None:
        n_rows = ds.count()

    KEY_SCALE = _SPAN_KEY_SCALE

    def chunk_partials(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assert (np.abs(ids) < (1 << 43)).all(), "doc ids too large for span keys"
        chunks, lengths = _span_chunks(texts, span_tokens)
        h1s, h2s, keys = [], [], []
        for i, (joined, mask) in enumerate(chunks):
            vals = joined.to_numpy(zero_copy_only=False)[mask]
            if not len(vals):
                continue
            h1s.append(pd.util.hash_array(vals, hash_key="rayparse-span-01"))
            h2s.append(pd.util.hash_array(vals, hash_key="rayparse-span-02"))
            keys.append(ids[mask] * KEY_SCALE + i)
        if not h1s:
            return pa.table(
                {
                    "_h1": pa.array([], pa.int64()),
                    "_h2": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "_h1": pa.array(np.concatenate(h1s).view(np.int64)),
                "_h2": pa.array(np.concatenate(h2s).view(np.int64)),
                "key": pa.array(np.concatenate(keys)),
            }
        )
        # per-batch combiner: one candidate winner per distinct chunk
        agg = t.group_by(["_h1", "_h2"]).aggregate([("key", "min")])
        return agg.rename_columns(["_h1", "_h2", "key"])

    winners = (
        ds.select_columns([id_col, text_col])
        .map_batches(chunk_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_h1", "_h2"], num_partitions=num_partitions)
        .aggregate(Min("key", alias_name="key"))
        .select_columns(["key"])
    )

    def reassemble(b: pa.Table, keep_keys) -> pa.Table:
        # kept-chunk gather is numpy run-length (same shape as the join
        # fallback's rebuild): per chunk index, flatnonzero the keep mask;
        # a stable sort by row then restores (row, chunk_idx) order, and
        # each surviving doc costs ONE " ".join — no per-chunk Python loop
        texts = b[text_col].combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        chunks, lengths = _span_chunks(texts, span_tokens)
        n = len(ids)
        n_total = np.zeros(n, np.int64)
        n_kept = np.zeros(n, np.int64)
        kept_rows, kept_vals = [], []
        for i, (joined, mask) in enumerate(chunks):
            keys = pa.array(ids * KEY_SCALE + i)
            keep = np.asarray(
                pc.and_(
                    pc.is_in(keys, value_set=keep_keys), pa.array(mask)
                ).fill_null(False)
            )
            n_total += mask.astype(np.int64)
            n_kept += keep.astype(np.int64)
            idx = np.flatnonzero(keep)
            if len(idx):
                kept_rows.append(idx)
                kept_vals.append(joined.to_numpy(zero_copy_only=False)[idx])
        rows = np.flatnonzero(n_kept > 0)
        if not len(rows):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        r_all = np.concatenate(kept_rows)
        v_all = np.concatenate(kept_vals)
        order = np.argsort(r_all, kind="stable")  # chunk order kept within row
        v_all = v_all[order]
        counts = np.bincount(r_all, minlength=n)[rows]
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        return pa.table(
            {
                id_col: pa.array(ids[rows]),
                "text_dedup": pa.array(
                    [" ".join(v_all[f : f + c]) for f, c in zip(first, counts)],
                    pa.string(),
                ),
                "n_kept": pa.array(n_kept[rows]),
                "n_dropped": pa.array((n_total - n_kept)[rows]),
            }
        )

    w_mat = winners.materialize()  # consumed once per branch below
    if w_mat.count() * 8 <= winners_max_bytes:
        keep_ref = ray.put(
            pc.cast(
                pa.concat_tables(ray.get(w_mat.to_arrow_refs()))["key"]
                .combine_chunks(),
                pa.int64(),
            )
        )

        def keep_batch(b: pa.Table) -> pa.Table:
            return reassemble(b, ray.get(keep_ref))

        return ds.select_columns([id_col, text_col]).map_batches(
            keep_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    # 100 TB fallback: winner keys too big to broadcast — semi-join the
    # exploded (id, cidx, chunk) rows against winners, one keyed exchange
    # on id_col, then the same batch-local reassembly per id-complete block
    from logparser_ray.stages.exchange import hash_shuffle
    from logparser_ray.stages.joins import join_num_partitions
    from logparser_ray.stages.windows import _exchange_blocks

    _EMPTY_EXPLODED = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "cidx": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.string()),
            "n_total": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
        }
    )

    def explode(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        chunks, lengths = _span_chunks(texts, span_tokens)
        if not chunks:  # zero rows, or all texts null/empty
            return _EMPTY_EXPLODED
        rows_id, rows_c, rows_chunk, rows_tot = [], [], [], []
        n_total = np.ceil(lengths / span_tokens).astype(np.int64)
        for i, (joined, mask) in enumerate(chunks):
            vals = joined.to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(mask)
            rows_id.append(ids[idx])
            rows_c.append(np.full(len(idx), i, np.int64))
            rows_chunk.append(vals[idx])
            rows_tot.append(n_total[idx])
        return pa.table(
            {
                id_col: pa.array(np.concatenate(rows_id)),
                "cidx": pa.array(np.concatenate(rows_c)),
                "chunk": pa.array(
                    np.concatenate(rows_chunk).astype(object), pa.string()
                ),
                "n_total": pa.array(np.concatenate(rows_tot)),
                "key": pa.array(
                    np.concatenate(rows_id) * KEY_SCALE
                    + np.concatenate(rows_c)
                ),
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = exploded.join(
        w_mat,
        "inner",
        num_partitions=join_num_partitions(n_rows * 8),
        on=("key",),
    )

    def rebuild(b: pa.Table) -> pa.Table:
        t = b.take(
            pc.sort_indices(
                b, sort_keys=[(id_col, "ascending"), ("cidx", "ascending")]
            )
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        chunks = t["chunk"].to_numpy(zero_copy_only=False)
        tot = t["n_total"].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        first = np.flatnonzero(new)
        counts = np.diff(np.append(first, n))
        texts = [
            " ".join(chunks[f : f + c]) for f, c in zip(first, counts)
        ]
        return pa.table(
            {
                id_col: pa.array(ids[first]),
                "text_dedup": pa.array(texts, pa.string()),
                "n_kept": pa.array(counts.astype(np.int64)),
                "n_dropped": pa.array(tot[first] - counts),
            }
        )

    with hash_shuffle(kept):
        return (
            kept.repartition(
                num_blocks=_exchange_blocks(n_rows), keys=[id_col]
            )
            .map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
