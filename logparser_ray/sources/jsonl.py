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


def read_transcripts_jsonl(path: str | list[str], *, ts_unit: str = "auto"):
    """``Dataset`` of transcript turns from JSONL file(s).

    ``ts`` accepts ISO-8601 strings or epoch numbers; either way the stored
    value is the UTC INSTANT. ISO strings with a ``Z``/UTC-offset suffix are
    parsed timezone-aware and converted (``12:00:00+05:00`` → 07:00 UTC);
    offset-less strings are assumed UTC wall time. Epoch numbers are
    interpreted per ``ts_unit``: ``"s"``, ``"ms"``, or ``"auto"`` (heuristic:
    > 1e11 means millis — misreads millisecond stamps before 1973-03, so pass
    an explicit unit for historical data); fractional parts are ROUNDED to
    the microsecond, not truncated. Missing ``tool`` stays null. Extra JSON
    keys are dropped — the canonical schema is the contract downstream
    stages compile against.
    """
    import ray

    if ts_unit not in ("auto", "s", "ms"):
        raise ValueError(f"ts_unit must be 'auto', 's' or 'ms', got {ts_unit!r}")
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
                    # normalize: offset-less strings get an explicit Z (UTC
                    # wall time), then ONE tz-aware cast converts every
                    # offset to the UTC instant; the final naive cast keeps
                    # that instant (Arrow ISO cast accepts fractional
                    # seconds and both ±hh:mm / ±hhmm offsets)
                    col = pc.cast(col, pa.string())
                    has_off = pc.match_substring_regex(
                        col, r"(Z|[+-]\d{2}:?\d{2})$"
                    )
                    norm = pc.if_else(
                        has_off, col, pc.binary_join_element_wise(col, "Z", "")
                    )
                    col = pc.cast(
                        pc.cast(norm, pa.timestamp("us", tz="UTC")),
                        pa.timestamp("us"),
                    )
                else:
                    secs = pc.cast(col, pa.float64())
                    if ts_unit == "ms":
                        secs = pc.divide(secs, 1000.0)
                    elif ts_unit == "auto":
                        big = pc.greater(secs, 1e11)
                        secs = pc.if_else(big, pc.divide(secs, 1000.0), secs)
                    # round, don't truncate, the microsecond fraction
                    col = pc.cast(
                        pc.cast(pc.round(pc.multiply(secs, 1_000_000.0)), pa.int64()),
                        pa.timestamp("us"),
                    )
            cols[name] = pc.cast(col, typ)
        return pa.table(cols, schema=TRANSCRIPT_SCHEMA)

    return ds.map_batches(to_canonical, batch_format="pyarrow", zero_copy_batch=True)
