"""JSONL transcript source (S3 variant): newline-delimited JSON → the
canonical transcript schema ``(conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us])``.

LLM training-data pipelines commonly land transcripts as JSONL before any
columnar conversion; this source makes the engine ingest them directly —
``ray.data.read_json`` streams files as blocks, one vectorized cast per
batch, no Python per row. The reference has no JSONL reader (its inputs are
raw log text); this is an engine extra, schema-pinned by test.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def read_transcripts_jsonl(path: str | list[str]):
    """``Dataset`` of transcript turns from JSONL file(s).

    ``ts`` accepts ISO-8601 strings (fractional seconds and a trailing
    ``Z``/UTC-offset are handled; offsets are DROPPED — timestamps are
    treated as UTC wall time) or epoch seconds/millis (numbers); missing
    ``tool`` stays null. Extra JSON keys are dropped — the canonical schema
    is the contract downstream stages compile against.
    """
    import ray

    ds = ray.data.read_json(path)

    def to_canonical(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in zip(TRANSCRIPT_SCHEMA.names, TRANSCRIPT_SCHEMA.types):
            if name not in b.column_names:
                cols[name] = pa.nulls(b.num_rows, typ)
                continue
            col = b[name].combine_chunks()
            if name == "ts" and not pa.types.is_timestamp(col.type):
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    # strip zone suffix, then Arrow's ISO cast (accepts
                    # fractional seconds; strptime's fixed format does not)
                    bare = pc.replace_substring_regex(
                        col, r"(Z|[+-]\d{2}:?\d{2})$", ""
                    )
                    col = pc.cast(bare, pa.timestamp("us"))
                else:
                    # epoch seconds (float/int); millis if implausibly large
                    secs = pc.cast(col, pa.float64())
                    big = pc.greater(secs, 1e11)
                    secs = pc.if_else(big, pc.divide(secs, 1000.0), secs)
                    col = pc.cast(
                        pc.cast(pc.multiply(secs, 1_000_000.0), pa.int64()),
                        pa.timestamp("us"),
                    )
            cols[name] = pc.cast(col, typ)
        return pa.table(cols, schema=TRANSCRIPT_SCHEMA)

    return ds.map_batches(to_canonical, batch_format="pyarrow", zero_copy_batch=True)
