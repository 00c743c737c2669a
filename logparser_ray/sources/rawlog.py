"""Raw-log compatibility source + CSV-compat sinks (SURVEY.md S1, S2, S4, S5).

``read_raw_log`` is the reference's input path re-expressed Ray-Data-first:
``ray.data.read_text`` over newline-delimited log files, then one vectorized
``map_batches`` applying the compiled header DSL († ``load_data()`` /
``log_to_dataframe()`` in each ``logparser/<Algo>/<Algo>.py``). A ``LineId``
column reproduces upstream's 1-based line ids; non-matching lines are
quarantined, not dropped (SURVEY.md M6 deviation, explicit).

The CSV writers reproduce the reference's two output artifacts
(† ``outputResult()``): ``<name>_structured.csv`` (LineId, headers, Content,
EventId, EventTemplate, ParameterList) and ``<name>_templates.csv``
(EventId, EventTemplate, Occurrences). ``ParameterList`` is serialized as a
Python-list literal, matching upstream's pandas ``to_csv`` of list cells;
Parquet (``list<string>``) remains the native format (SURVEY.md §7.4 #5).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from logparser_ray.core.headerdsl import HeaderFormat


def read_raw_log(path: str | list[str], log_format: str, *, keep_line: bool = False):
    """``Dataset`` of header-parsed log lines with per-file 1-based ``LineId``.

    One fused task per log file: read lines, assign LineId, apply the
    compiled header DSL vectorized. Upstream parses each log file as its own
    job with per-file line ids († ``load_data()``), so (file, LineId) is the
    faithful row identity — and file-granular tasks are exactly the routed
    writer's shard pattern, so this source scales the same way.
    """
    import glob as _glob

    import ray

    hf = HeaderFormat(log_format)
    if isinstance(path, str):
        files = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")
            )
    else:
        files = sorted(path)

    def read_parse(batch: pa.Table, *, hf=hf) -> pa.Table:
        tables = []
        for fpath in batch["path"].to_pylist():
            with open(fpath, "rb") as f:
                lines = f.read().decode("utf-8", errors="replace").splitlines()
            t = pa.table(
                {
                    "file": pa.array([os.path.basename(fpath)] * len(lines)),
                    "LineId": pa.array(range(1, len(lines) + 1), pa.int64()),
                    "text": pa.array(lines, pa.string()),
                }
            )
            tables.append(hf.parse_table(t, line_col="text", keep_line=keep_line))
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    return ray.data.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    ).map_batches(read_parse, batch_format="pyarrow", batch_size=None)


def structured_table(ds_or_table, *, headers: list[str] | None = None) -> pa.Table:
    """Collect a parsed dataset into the reference's ``_structured`` column
    order: LineId, headers…, Content, EventId, EventTemplate, ParameterList."""
    import ray.data

    if isinstance(ds_or_table, ray.data.Dataset):
        tbl = pa.concat_tables(
            [ray.get(r) for r in ds_or_table.to_arrow_refs()]
        )
    else:
        tbl = ds_or_table
    rename = {"template_id": "EventId", "template": "EventTemplate", "params": "ParameterList"}
    for old, new in rename.items():
        if old in tbl.column_names:
            tbl = tbl.rename_columns(
                [new if c == old else c for c in tbl.column_names]
            )
    order = [c for c in ["LineId"] if c in tbl.column_names]
    order += [c for c in (headers or []) if c in tbl.column_names]
    order += [
        c
        for c in tbl.column_names
        if c not in order and c not in ("EventId", "EventTemplate", "ParameterList")
    ]
    order += [c for c in ("EventId", "EventTemplate", "ParameterList") if c in tbl.column_names]
    return tbl.select(order)


def write_structured_csv(ds_or_table, path: str, *, headers: list[str] | None = None) -> str:
    """Write the reference-compatible ``_structured.csv`` (small outputs —
    conformance artifact; big outputs stay Parquet)."""
    tbl = structured_table(ds_or_table, headers=headers)
    df = tbl.to_pandas()
    if "ParameterList" in df.columns:
        df["ParameterList"] = df["ParameterList"].map(
            lambda v: str([str(x) for x in v]) if v is not None else "[]"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df.to_csv(path, index=False)
    return path


def read_structured_csv(path: str | list[str]):
    """Read a reference ``_structured.csv`` back into a ``Dataset`` with the
    engine's native column names (EventId → template_id etc.) — the
    evaluator's upstream input path († the benchmark harness evaluates
    parsers by reading their ``_structured.csv`` against the ground-truth
    one). ``ParameterList`` stays a string literal (CSV has no list type).
    """
    import ray

    ds = ray.data.read_csv(path)

    def rename(b: pa.Table) -> pa.Table:
        back = {
            "EventId": "template_id",
            "EventTemplate": "template",
            "ParameterList": "params_literal",
        }
        return b.rename_columns([back.get(c, c) for c in b.column_names])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def write_templates_csv(ds, path: str) -> str:
    """Write ``_templates.csv``: EventId, EventTemplate, Occurrences sorted
    by occurrences desc († ``outputResult()``; SURVEY.md S5, O2).

    ``ds`` is a parsed dataset carrying template_id/template columns."""
    from logparser_ray.stages.aggregate import template_occurrences

    counts = template_occurrences(ds).to_pandas()
    counts = counts.rename(
        columns={
            "template_id": "EventId",
            "template": "EventTemplate",
            "occurrences": "Occurrences",
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    counts.to_csv(path, index=False)
    return path
