"""The training-corpus prep pipeline — the LLM-data counterpart of the
flagship (SURVEY.md training-data extras, composed end to end):

    read_parquet(documents)
      → curation_gate      (Gopher-style repetition stats + keep flag,
                            zero shuffle)
      → pii_redact         (ordered RE2 rewrite chain, zero shuffle)
      → mixture sample     (per-source md5-threshold rates, zero shuffle)
      → exact dedup        (128-bit content-hash first-per-hash keep —
                            one hash exchange)
      → sort(doc_id)       (restores the total order packing needs — the
                            pipeline's second and last exchange)
      → pack_sequences     (token-budget bins via the ordered prefix scan)
      → write_parquet      (partitioned by sequence bucket → resumable,
                            bounded files; never one giant file)

Everything except the dedup exchange is a streaming ``map_batches`` chain;
the dedup keeps the first (min doc_id) copy of each distinct redacted
text, exchanging only hash+id-sized rows per the dedup module's design.
Returns corpus-level metrics (rows in/kept at each gate) computed from
tiny aggregates — nothing row-scale ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def prep_corpus(
    input_dir_or_ds,
    *,
    out_dir: str | None = None,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    budget: int = 2048,
    seq_per_part: int = 64,
    gate: dict | None = None,
):
    """Run the full corpus-prep chain over a ``documents``-shaped input
    (``doc_id, text, lang, source``). Returns ``{"dataset": Dataset,
    "metrics": dict}``; with ``out_dir`` the packed corpus is also written
    as parquet partitioned by ``seq_part`` (``seq_id // seq_per_part`` —
    bounded partition count that a failed run can resume by skipping)."""
    from logparser_ray.stages.curation import curation_gate, pii_redact_batch
    from logparser_ray.stages.pack import pack_sequences
    from logparser_ray.stages.sample import sample_by_rates

    if isinstance(input_dir_or_ds, str):
        ds = ray.data.read_parquet(
            input_dir_or_ds, columns=["doc_id", "text", "lang", "source"]
        )
    else:
        ds = input_dir_or_ds
    n_in = ds.count()

    gated = curation_gate(ds, **(gate or {}))
    kept = gated.filter(expr="keep == 1").drop_columns(
        [
            "n_words",
            "n_distinct",
            "max_word_n",
            "top_bigram_n",
            "n_stop",
            "n_symbol",
            "keep",
        ]
    )

    def redact(b: pa.Table) -> pa.Table:
        out = pii_redact_batch(b)
        # the redacted text becomes THE text downstream (train on redacted)
        out = out.drop_columns(["text"])
        idx = out.schema.get_field_index("text_redacted")
        return out.set_column(idx, "text", out["text_redacted"])

    redacted = kept.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)

    mixed = (
        sample_by_rates(
            redacted,
            group_col="source",
            key_col="text",
            rates=rates or {},
            default_rate=default_rate,
        )
        if (rates or default_rate < 1.0)
        else redacted
    )

    # exact dedup, corpus-filtering form: first (min doc_id) copy of each
    # distinct text survives. ONE keyed exchange of the full rows on the
    # 128-bit content hash; per-block winners are exact because the
    # repartition co-locates each hash's rows.
    def add_hash(b: pa.Table) -> pa.Table:
        import pandas as pd

        texts = b["text"].combine_chunks().to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(texts, hash_key="rayparse-dedup-1").view(np.int64)
        h2 = pd.util.hash_array(texts, hash_key="rayparse-dedup-2").view(np.int64)
        return b.append_column("_h1", pa.array(h1)).append_column(
            "_h2", pa.array(h2)
        )

    def first_per_hash(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["_h1", "_h2"])
        t = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    ("_h1", "ascending"),
                    ("_h2", "ascending"),
                    ("doc_id", "ascending"),
                ],
            )
        )
        h1 = t["_h1"].to_numpy(zero_copy_only=False)
        h2 = t["_h2"].to_numpy(zero_copy_only=False)
        first = np.ones(len(h1), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return t.filter(pa.array(first)).drop_columns(["_h1", "_h2"])

    from ray.data.context import ShuffleStrategy

    n_blocks = max(2, min(int(ray.cluster_resources().get("CPU", 4)),
                          max(n_in // 50_000, 1) + 1))
    prev = mixed.context.shuffle_strategy
    mixed.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        deduped = (
            mixed.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(num_blocks=n_blocks, keys=["_h1", "_h2"])
            .map_batches(
                first_per_hash, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()  # consumed twice: metrics count + pack scan
        )
    finally:
        mixed.context.shuffle_strategy = prev

    n_dedup = deduped.count()
    # packing assigns docs to sequences in a TOTAL id order, which the hash
    # dedup just destroyed — the range sort here is the pipeline's second
    # (and last) exchange, inherent to any reproducible packing rule
    packed = pack_sequences(
        deduped.select_columns(["doc_id", "text", "lang", "source"]).sort(
            "doc_id"
        ),
        budget=budget,
    )

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.divide(b["seq_id"], seq_per_part)
        return b.append_column("seq_part", pc.cast(part, pa.int64()))

    packed = packed.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    if out_dir is not None:
        packed.write_parquet(out_dir, partition_cols=["seq_part"])

    metrics = {
        "rows_in": int(n_in),
        "rows_deduped": int(n_dedup),
        "n_sequences": None,  # filled below from a tiny aggregate
    }
    from ray.data.aggregate import Max

    mx = packed.aggregate(Max("seq_id", alias_name="m"))
    metrics["n_sequences"] = int(mx["m"]) + 1 if mx and mx["m"] is not None else 0
    return {"dataset": packed, "metrics": metrics}
