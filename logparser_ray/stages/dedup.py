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
from ray.data.aggregate import Count, Min

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup_representatives(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One representative (min id) + copy count per distinct text value.

    SQL parity: ``SELECT min(id), count(*) FROM t GROUP BY text``.
    """
    out = ds.groupby(text_col).aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )
    return out.drop_columns([text_col])


def _shingle_hashes(texts: np.ndarray, k: int) -> list[np.ndarray]:
    """Per-doc arrays of hashed k-token shingles (vectorized over the flat
    token stream; the only per-doc work is slicing)."""
    split = [t.split(" ") if t else [] for t in texts]
    out: list[np.ndarray] = []
    for toks in split:
        if len(toks) < k:
            sh = np.array([" ".join(toks)], dtype=object)
        else:
            sh = np.array(
                [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)],
                dtype=object,
            )
        out.append(pd.util.hash_array(sh, hash_key="rayparse-shingle").astype(np.uint64))
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
        texts = batch["text"].to_numpy(zero_copy_only=False)
        shingles = _shingle_hashes(texts, self.k)
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


def minhash_near_dupes(
    ds,
    *,
    k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    concurrency=None,
    verify: str = "inline",
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
    # The shuffle strategy lives in the context captured by the ROOT dataset
    # at creation, so flip it there (restored in finally).
    from ray.data.context import ShuffleStrategy

    root_ctx = ds.context
    prev_strategy = root_ctx.shuffle_strategy
    root_ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    # size the bucket shuffle from the input row count (parquet metadata /
    # in-memory — cheap), NOT from bands_ds.count(), which would execute the
    # MinHasher stage a second time just to size blocks
    n_docs = ds.count()
    bands_ds = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "k": k,
            "bands": bands,
            "rows_per_band": rows_per_band,
            "emit_shingles": verify == "inline",
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or (1, 4),  # autoscaling: a FIXED pool of 4 can
        # reserve every CPU of a small cluster and starve the upstream read
        # task (deadlock); min=1 always leaves room
    )
    n_blocks = max(4, min(64, (n_docs * bands) // 50_000 + 4))

    try:
        if verify == "inline":
            out = _near_dupes_inline(bands_ds, n_blocks, threshold)
        else:
            out = _near_dupes_join(ds, bands_ds, n_blocks, n_docs, k, threshold)
    finally:
        root_ctx.shuffle_strategy = prev_strategy
    if len(out) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


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
        for ids, blobs in zip(
            agg["doc_id_list"].to_pylist(), agg["sh_list"].to_pylist()
        ):
            if len(ids) < 2 or len(ids) > 200:  # cap pathological buckets
                continue
            by_id = dict(zip(ids, blobs))
            u = sorted(by_id)
            if len(u) < 2:
                continue
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    jac = _jaccard_packed(by_id[u[i]], by_id[u[j]])
                    if jac >= threshold:
                        out_a.append(u[i])
                        out_b.append(u[j])
                        out_j.append(jac)
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
    return out.drop_duplicates(["a", "b"]).reset_index(drop=True)


def _near_dupes_join(
    ds, bands_ds, n_blocks: int, n_docs: int, k: int, threshold: float
) -> pd.DataFrame:
    """Ids-only buckets + pair⋈shingle hash joins (see minhash_near_dupes)."""

    def pairs_in_block(b: pa.Table) -> pa.Table:
        agg = b.group_by(["band_id", "band_hash"]).aggregate([("doc_id", "list")])
        out_a, out_b = [], []
        for ids in agg["doc_id_list"].to_pylist():
            u = sorted(set(ids))
            if len(u) < 2 or len(u) > 200:  # cap pathological buckets
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
    pairs_ds = (
        bands_ds.repartition(num_blocks=n_blocks, keys=["band_id", "band_hash"])
        .map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)
        # distributed dedup (a pair repeats once per agreeing band)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )

    def shingles_of(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_numpy(zero_copy_only=False)
        hs = [np.unique(h) for h in _shingle_hashes(texts, k)]
        # packed as binary (uint64 LE bytes): Arrow's hash join rejects
        # list<> payload columns but carries var-len binary fine
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array([h.astype("<u8").tobytes() for h in hs], pa.binary()),
            }
        )

    def sh_ds():
        return ds.select_columns(["doc_id", "text"]).map_batches(
            shingles_of, batch_format="pyarrow", zero_copy_batch=True
        )

    # the join drops the right key column (doc_id) from its output
    j = pairs_ds.join(
        sh_ds(), "inner", num_partitions=n_join, on=("a",), right_on=("doc_id",)
    ).rename_columns({"sh": "sh_a"})
    j = j.join(
        sh_ds(), "inner", num_partitions=n_join, on=("b",), right_on=("doc_id",)
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

    return j.map_batches(verify_batch, batch_format="pyarrow", batch_size=None).to_pandas()


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
