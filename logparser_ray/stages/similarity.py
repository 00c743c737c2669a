"""Similarity search over an embedding column (build-brief extras).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul and emits only its local
top-k rows (a combiner), and the global top-k reduction happens over the
tiny per-batch partials. Scale path: ``lsh_bucketed_topk`` applies a
random-hyperplane LSH so each batch only scores against queries sharing a
bucket — the IVF/LSH-style pruning described in the brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy when the lists
    are equal-length (flatten + reshape — no per-row Python)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        offsets = np.asarray(arr.offsets)
    except AttributeError:  # FixedSizeListArray
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(arr), -1)
    lengths = offsets[1:] - offsets[:-1]
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if len(lengths) and (lengths == lengths[0]).all():
        return flat.reshape(len(lengths), int(lengths[0]))
    return np.asarray(arr.to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)


# per-worker cache of seeded JL projection matrices (module-level, same
# discipline as the parse-state cache in stages/parse.py): generating from
# the seed is deterministic, so workers never ship the matrix — they just
# avoid regenerating it per batch
_RP_CACHE: dict[tuple, np.ndarray] = {}

RP_DEFAULT_SEED = 23  # shared by random_projection and project_query


def project_query(
    q: np.ndarray, out_dim: int, seed: int = RP_DEFAULT_SEED
) -> np.ndarray:
    """Project a query vector with the SAME seeded matrix
    ``random_projection`` applies to the corpus — the public pairing
    helper, so callers never duplicate the seed or reach into the cache."""
    q = np.asarray(q, dtype=np.float64)
    return q @ _rp_matrix(seed, len(q), out_dim)


def _rp_matrix(seed: int, dim: int, out_dim: int) -> np.ndarray:
    key = (seed, dim, out_dim)
    if key not in _RP_CACHE:
        rng = np.random.default_rng(seed)
        _RP_CACHE[key] = rng.standard_normal((dim, out_dim)) / np.sqrt(out_dim)
    return _RP_CACHE[key]


def random_projection(
    ds,
    *,
    out_dim: int,
    dim: int | None = None,
    seed: int = RP_DEFAULT_SEED,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    out_col: str = "embedding_rp",
    normalize: bool = True,
):
    """Johnson–Lindenstrauss random projection of an embedding column to
    ``out_dim`` dimensions (Gaussian projection matrix / sqrt(out_dim),
    seeded — every worker regenerates the IDENTICAL matrix from the seed,
    so nothing is shipped at all). One vectorized matmul per batch, zero
    shuffle, streaming; pairwise distances are preserved within the JL
    distortion bound, which is what downstream ANN/near-dup stages need
    from a cheaper vector.

    ``dim`` (input dimensionality) is read from the first batch when not
    given. Returns ``(id_col, out_col)`` with ``out_col`` a
    ``list<float64>`` of length ``out_dim`` (L2-normalized when
    ``normalize``, so cosine downstream works unchanged).
    """
    if dim is None:
        first = ds.limit(1).take_batch(1, batch_format="pyarrow")
        dim = _emb_matrix(first[emb_col]).shape[1]

    def project(batch: pa.Table) -> pa.Table:
        proj = _rp_matrix(seed, dim, out_dim)  # per-worker cache
        emb = _emb_matrix(batch[emb_col])
        red = emb @ proj
        if normalize:
            red = _normalize(red)
        flat = pa.array(red.reshape(-1), pa.float64())
        lists = pa.FixedSizeListArray.from_arrays(flat, out_dim)
        return pa.table({id_col: batch[id_col], out_col: lists})

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


class BatchTopK:
    """map_batches actor: per-batch cosine vs broadcast query matrix → local top-k."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch["embedding"]))
        sims = emb @ self.q.T  # (n, nq)
        k = min(self.k, len(ids))
        out_ids, out_q, out_cos = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            out_ids.append(ids[top])
            out_q.append(np.full(len(top), qi, dtype=np.int32))
            out_cos.append(col[top])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_ids)),
                "cos": pa.array(np.concatenate(out_cos).astype(np.float64)),
            }
        )


def brute_force_topk(ds, query: np.ndarray, k: int = 5):
    """Global cosine top-k per query row of ``query`` (2-D: nq × d).

    Returns a pandas DataFrame (query_idx, vec_id, cos rounded 4), sorted by
    (query_idx, -cos, vec_id). Only per-batch top-k partials leave the
    workers, so the driver reduction is O(num_batches · k).
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qref = ray.put(query)

    def scan(batch: pa.Table) -> pa.Table:
        # stateless task (not an actor pool): the only per-call state is the
        # tiny broadcast query matrix, and plain tasks scale to every free
        # CPU instead of a pool cap (the (1, 4) pool left 7/8 of a 32-cpu
        # box idle — VERDICT r01)
        return BatchTopK(qref, k)(batch)

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = (
        partials.sort_values(["query_idx", "cos", "vec_id"], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class HyperplaneLSH:
    """Random-hyperplane bucketing: ``bucket = signbits(emb @ planes)``.

    Vectors (and queries) hash to an int bucket; ANN search only scores
    within the query's bucket (plus optionally neighboring buckets by
    flipping one bit) — the scale path that avoids scoring all N vectors.
    """

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    def bucket(self, emb: np.ndarray) -> np.ndarray:
        bits = (np.asarray(emb, np.float64) @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)


def lsh_bucketed_topk(ds, query: np.ndarray, k: int = 5, n_planes: int = 6, dim: int | None = None):
    """ANN top-k: prune to the query's LSH bucket, then exact cosine there.

    Approximate by construction — results are a subset of brute force with
    identical cosines for returned ids (asserted in tests).
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    if dim is None:
        dim = query.shape[1]
    lsh = HyperplaneLSH(dim, n_planes)
    qbuckets = set(lsh.bucket(query).tolist())

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        b = lsh.bucket(emb)
        keep = np.isin(b, list(qbuckets))
        return batch.filter(pa.array(keep))

    pruned = ds.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(pruned, query, k=k)


def embedding_near_dupes(
    ds,
    *,
    threshold: float = 0.4,
    mode: str = "exact",
    n_planes: int = 4,
    id_col: str = "vec_id",
):
    """All vector pairs with cosine ≥ ``threshold`` (embedding-cosine
    near-dup detection, build-brief extras).

    - ``mode="exact"``: the full normalized matrix is broadcast once
      (``ray.put``) and every batch does one matmul against it, emitting
      only its above-threshold pairs with ``a < b`` — distributed compute,
      O(N·d) broadcast. Exact, so DuckDB-oracle-checkable.
    - ``mode="lsh"``: the 100 TB path — random-hyperplane bucketing, then
      pairwise cosine only WITHIN each bucket (`groupby(bucket).map_groups`);
      recall < 1 by construction (pairs split across buckets are missed),
      so it is a rows-only check.

    Returns a pandas DataFrame ``(a, b, cos_bp)`` with cosine in integer
    basis points, sorted by (a, b).
    """
    import pandas as pd

    cols = ds.select_columns([id_col, "embedding"])

    def emb_of(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return ids, _normalize(_emb_matrix(batch["embedding"]))

    if mode == "exact":
        full = cols.to_pandas()
        all_ids = full[id_col].to_numpy()
        all_emb = _normalize(
            np.asarray(full["embedding"].tolist(), dtype=np.float64)
        )
        ref_ids, ref_emb = ray.put(all_ids), ray.put(all_emb)

        def pairs_fn(batch: pa.Table) -> pa.Table:
            ids, emb = emb_of(batch)
            oids, oemb = ray.get(ref_ids), ray.get(ref_emb)
            sims = emb @ oemb.T
            bi, oj = np.nonzero(sims >= threshold)
            a, b = ids[bi], oids[oj]
            keep = a < b
            cos_bp = np.floor(sims[bi, oj][keep] * 10_000 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "a": pa.array(a[keep].astype(np.int64)),
                    "b": pa.array(b[keep].astype(np.int64)),
                    "cos_bp": pa.array(cos_bp),
                }
            )

        out = cols.map_batches(
            pairs_fn, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
    elif mode == "lsh":
        dim = len(ds.take(1)[0]["embedding"])
        lsh = HyperplaneLSH(dim, n_planes)

        def bucketize(batch: pa.Table) -> pa.Table:
            _ids, emb = emb_of(batch)
            return batch.append_column("bucket", pa.array(lsh.bucket(emb)))

        def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
            ids = g[id_col].to_numpy()
            emb = _normalize(np.asarray(g["embedding"].tolist(), dtype=np.float64))
            sims = emb @ emb.T
            i, j = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b = ids[i], ids[j]
            swap = a > b
            a[swap], b[swap] = b[swap], a[swap]
            return pd.DataFrame(
                {
                    "a": a.astype(np.int64),
                    "b": b.astype(np.int64),
                    "cos_bp": np.floor(sims[i, j] * 10_000 + 0.5).astype(np.int64),
                }
            )

        out = (
            cols.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas()
            .drop_duplicates(["a", "b"])
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer, the classic scale path
# ---------------------------------------------------------------------------


def kmeans_fit(
    ds,
    k: int = 16,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    n_fit: int = 65_536,
):
    """IVF coarse-quantizer fit: Lloyd's k-means on a BOUNDED deterministic
    sample of the embedding column.

    Standard IVF practice — the coarse quantizer only needs a representative
    sample, so the fit draws the ``n_fit`` rows with the smallest keyed id
    hash (``sample_min_k_by_hash``: per-batch k-smallest combiner + tiny
    driver merge — no global sort, no full-dataset ``materialize()``; the
    round-2 version pinned the corpus-scale projection in the object store)
    and runs vectorized Lloyd's in memory on the ``n_fit × d`` sample
    matrix. Full-data assignment (``ivf_topk``) stays streaming.
    Deterministic: the sample is a pure function of row values; centroids
    init from the ``k`` smallest sampled ids' vectors.
    """
    from logparser_ray.stages.sample import sample_min_k_by_hash

    samp = sample_min_k_by_hash(
        ds, cols=[id_col, "embedding"], key_col=id_col, n=n_fit, seed=seed,
        as_arrow=True,
    )
    ids = samp[id_col].to_numpy(zero_copy_only=False)
    emb = _normalize(_emb_matrix(samp["embedding"]))
    k = min(k, len(ids))
    centroids = _normalize(emb[np.argsort(ids)[:k]].copy())

    for _ in range(iters):
        assign = np.argmax(emb @ centroids.T, axis=1)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, emb)
        counts = np.bincount(assign, minlength=k)
        new = centroids.copy()
        nz = counts > 0  # empty cluster keeps its centroid (deterministic)
        new[nz] = sums[nz] / counts[nz, None]
        new = _normalize(new)
        if np.allclose(new, centroids, atol=1e-9):
            centroids = new
            break
        centroids = new
    return centroids


def _ivf_prune(ds, query: np.ndarray, centroids: np.ndarray, n_probe: int, id_col: str):
    """Shared IVF coarse-quantizer prune: keep only vectors whose nearest
    centroid is among the query's ``n_probe`` closest (one vectorized
    assignment matmul per batch; centroids broadcast once). Both IVF
    searches compose with this — one copy of the subtle bits (argmax on
    normalized embeddings, argsort ties, sorted probe array)."""
    qn = _normalize(np.atleast_2d(np.asarray(query, dtype=np.float64)))
    probe = set(
        np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe].reshape(-1).tolist()
    )
    cref = ray.put(centroids)
    probe_arr = np.array(sorted(probe))

    def prune(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        emb = _normalize(_emb_matrix(batch["embedding"]))
        assign = np.argmax(emb @ c.T, axis=1)
        keep = np.isin(assign, probe_arr)
        return batch.filter(pa.array(keep))

    return ds.select_columns([id_col, "embedding"]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )


def ivf_topk(
    ds,
    query: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
):
    """IVF search: score only vectors whose nearest centroid is among the
    query's ``n_probe`` closest centroids — the coarse-quantizer pruning
    that bounds scanned vectors to ~n_probe/k of the corpus at 100 TB."""
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    pruned = _ivf_prune(ds, query, centroids, n_probe, id_col)
    return brute_force_topk(pruned, query, k=k)


def pq_fit(
    ds,
    *,
    m: int = 8,
    nbits: int = 5,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    n_fit: int = 65_536,
) -> np.ndarray:
    """Product-quantization codebooks: the (normalized) embedding splits
    into ``m`` contiguous subvectors, each quantized by its own Lloyd's
    k-means with ``2**nbits`` codes — the classic 100 TB vector-store
    compression (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): a vector stores as ``m`` code bytes instead of
    ``4·d`` floats (32× at d=64, m=8, nbits≤8).

    Fits on the same bounded deterministic min-k-by-hash sample the IVF
    quantizer uses (nothing corpus-scale materializes; centroids init from
    the smallest sampled ids' subvectors → fully deterministic). Returns
    ``(m, 2**nbits, d//m)`` float64. ``d % m == 0`` required.
    """
    from logparser_ray.stages.sample import sample_min_k_by_hash

    samp = sample_min_k_by_hash(
        ds, cols=[id_col, "embedding"], key_col=id_col, n=n_fit, seed=seed,
        as_arrow=True,
    )
    ids = samp[id_col].to_numpy(zero_copy_only=False)
    emb = _normalize(_emb_matrix(samp["embedding"]))
    d = emb.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ncodes = min(1 << nbits, len(ids))
    order = np.argsort(ids)
    books = np.empty((m, ncodes, sub), dtype=np.float64)
    for s in range(m):
        x = emb[:, s * sub : (s + 1) * sub]
        c = x[order[:ncodes]].copy()
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||² = argmin (||c||² - 2 x·c)
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=ncodes)
            new = c.copy()
            nz = counts > 0  # empty code keeps its centroid (deterministic)
            new[nz] = sums[nz] / counts[nz, None]
            if np.allclose(new, c, atol=1e-9):
                c = new
                break
            c = new
        books[s] = c
    return books


def pq_topk(
    ds,
    query: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
):
    """Asymmetric-distance PQ search: per batch, each vector encodes to its
    ``m`` nearest sub-centroids (pure matmuls) and scores against the query
    through a tiny per-query lookup table of partial inner products
    (``m × 2**nbits`` floats) — the query stays full-precision, vectors are
    code-compressed, which is ADC in the PQ literature. Only per-batch
    top-k partials leave the workers (same driver reduction as
    ``brute_force_topk``). Returns (query_idx, vec_id, score) with
    ``score`` the PQ-approximate cosine, rounded to 4.
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qn = _normalize(query)
    m, ncodes, sub = codebooks.shape
    # LUT[qi, s, code] = q_sub · c — score(x) = Σ_s LUT[qi, s, code_s(x)]
    lut = np.einsum("qsd,scd->qsc", qn.reshape(qn.shape[0], m, sub), codebooks)
    cref = ray.put((codebooks, lut))

    def scan(batch: pa.Table) -> pa.Table:
        books, lut_ = ray.get(cref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch["embedding"]))
        n = emb.shape[0]
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            x = emb[:, s * sub : (s + 1) * sub]
            c = books[s]
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            codes[:, s] = np.argmin(d2, axis=1)
        nq = lut_.shape[0]
        out_q, out_ids, out_s = [], [], []
        for qi in range(nq):
            score = lut_[qi][np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(k, n)
            if kk < n:
                # keep EVERY row tied with the kk-th score: PQ ties are
                # common (code-identical vectors score bit-identically),
                # and dropping an arbitrary tied candidate here would make
                # the driver's (score desc, id asc) pick depend on block
                # layout (review r4)
                thresh = np.partition(score, n - kk)[n - kk]
                top = np.flatnonzero(score >= thresh)
            else:
                top = np.arange(n)
            out_q.append(np.full(len(top), qi, dtype=np.int32))
            out_ids.append(ids[top])
            out_s.append(score[top])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_ids)),
                "score": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    partials = ds.select_columns([id_col, "embedding"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = (
        partials.sort_values(
            ["query_idx", "score", id_col], ascending=[True, False, True]
        )
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["score"] = np.round(out["score"].to_numpy(), 4)
    return out


def ivf_pq_topk(
    ds,
    query: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
):
    """IVF-PQ — the classic billion-scale pairing (Jégou et al. 2011,
    faiss's default shape): the IVF coarse quantizer prunes the scan to
    ~n_probe/n_centroids of the corpus, and the survivors score through
    the PQ asymmetric-distance LUT instead of full-precision dot products.
    At 100 TB that is the difference between streaming 4·d bytes/vector
    and m bytes/vector over 1/8th of the data. Pure composition of the
    two audited stages — the prune is ``ivf_topk``'s filter, the scan is
    ``pq_topk``; returns (query_idx, vec_id, score)."""
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    pruned = _ivf_prune(ds, query, centroids, n_probe, id_col)
    return pq_topk(pruned, query, codebooks, k=k, id_col=id_col)
