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

    def __init__(self, k: int = 3, bands: int = 16, rows_per_band: int = 4, seed: int = 1):
        self.k = k
        self.bands = bands
        self.r = rows_per_band
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
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
            }
        )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(zip(*[text_a.split(" ")[i:] for i in range(k)])) if text_a else set()
    sb = set(zip(*[text_b.split(" ")[i:] for i in range(k)])) if text_b else set()
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_near_dupes(
    ds,
    *,
    k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    concurrency=None,
):
    """Full MinHash-LSH near-dup pipeline → pandas DataFrame of verified pairs
    ``(a, b, jaccard)`` sorted by (a, b). Candidate generation and the exact
    Jaccard verify both run distributed; only the (small) pair list and
    shingle-hash arrays of candidate docs touch the driver.
    """
    # candidate pairs: hash-partition the (band, bucket, doc) rows so each
    # bucket lands whole in one block, then ONE vectorized pyarrow group_by
    # per block with a "list" aggregate — python touches only multi-member
    # buckets (vs map_groups' per-bucket pandas call: measured ~5s → ~1s at
    # sf0.1's ~70k buckets). The shuffle strategy lives in the context
    # captured by the ROOT dataset at creation, so flip it there.
    from ray.data.context import ShuffleStrategy

    root_ctx = ds.context
    prev_strategy = root_ctx.shuffle_strategy
    root_ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    bands_ds = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "bands": bands, "rows_per_band": rows_per_band},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or (1, 4),  # autoscaling: a FIXED pool of 4 can
        # reserve every CPU of a small cluster and starve the upstream read
        # task (deadlock); min=1 always leaves room
    )

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

    try:
        n_blocks = max(4, min(64, bands_ds.count() // 50_000 + 4))
        pairs = (
            bands_ds.repartition(num_blocks=n_blocks, keys=["band_id", "band_hash"])
            .map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
    finally:
        root_ctx.shuffle_strategy = prev_strategy
    if len(pairs) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    pairs = pairs.drop_duplicates(["a", "b"]).reset_index(drop=True)

    # distributed verify: candidate docs' sorted-unique shingle-hash arrays
    # are small (ids × ~tokens × 8B) — broadcast once, then exact Jaccard per
    # pair via np.intersect1d inside map_batches (vs a driver-side Python
    # loop: measured ~8s → ~1s at sf0.1's 534k candidates). At 100 TB the
    # broadcast becomes a hash-partitioned join of pairs against shingles,
    # same semantics.
    need = np.unique(np.concatenate([pairs["a"], pairs["b"]])).astype(np.int64)
    need_arr = pa.array(need)

    def shingles_of(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["doc_id"], value_set=need_arr))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_numpy(zero_copy_only=False)
        hs = [np.unique(h) for h in _shingle_hashes(texts, k)]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array(
                    [h.astype(np.uint64) for h in hs], pa.list_(pa.uint64())
                ),
            }
        )

    sh_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in ds.select_columns(["doc_id", "text"])
            .map_batches(shingles_of, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    lut_ref = ray.put(
        dict(
            zip(
                sh_tbl["doc_id"].to_pylist(),
                [np.asarray(v, dtype=np.uint64) for v in sh_tbl["sh"].to_pylist()],
            )
        )
    )

    def verify(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        a_ids = b["a"].to_numpy(zero_copy_only=False)
        b_ids = b["b"].to_numpy(zero_copy_only=False)
        jac = np.empty(len(a_ids), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a_ids, b_ids)):
            sa, sb = lut[x], lut[y]
            if not len(sa) and not len(sb):
                jac[i] = 1.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a_ids[keep]),
                "b": pa.array(b_ids[keep]),
                "jaccard": pa.array(np.round(jac[keep], 4)),
            }
        )

    import ray.data as rd

    n_blocks = max(1, min(64, len(pairs) // 4_000))
    out = (
        rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
        .repartition(num_blocks=n_blocks)
        .map_batches(verify, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


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
