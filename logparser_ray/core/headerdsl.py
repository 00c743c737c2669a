"""The log-format header DSL: ``'<Date> <Time> <Pid> <Level> <Component>: <Content>'``.

Reproduces the reference's header-schema compiler († every parser's
``generate_logformat_regex(logformat)`` + ``log_to_dataframe()``, e.g.
``logparser/Drain/Drain.py`` — SURVEY.md S2): split the format string on
``(<[^<>]+>)``, escape the literal chunks (any run of spaces becomes
``\\s+``), and turn each ``<Field>`` into a named capture group.

Deviation from upstream, by design: lines that fail the header regex are
*quarantined* (kept, flagged) instead of silently skipped (SURVEY.md M6).

Pure Python + pyarrow; applied vectorized via ``pc.extract_regex`` so a
whole Arrow batch of raw lines is parsed in one C pass.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


class HeaderFormat:
    """Compiled log-format DSL → named-group regex + vectorized applier."""

    def __init__(self, log_format: str):
        self.log_format = log_format
        self.headers: list[str] = []
        parts = re.split(r"(<[^<>]+>)", log_format)
        out = []
        for part in parts:
            if not part:
                continue
            if part.startswith("<") and part.endswith(">"):
                name = part[1:-1]
                self.headers.append(name)
                out.append(f"(?P<{name}>.*?)")
            else:
                out.append(re.sub(r"\\ +", r"\\s+", re.escape(part)))
        self.regex = "^" + "".join(out) + "$"
        self.pattern = re.compile(self.regex)

    def parse_array(self, lines: pa.Array | pa.ChunkedArray) -> pa.Table:
        """Parse a column of raw lines → one column per header + ``_quarantined``.

        Non-matching lines get null header fields and ``_quarantined=True``
        (upstream drops them inside a try/except in † ``log_to_dataframe``).
        """
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        struct = pc.extract_regex(lines, self.regex)
        quarantined = struct.is_null()
        cols: dict[str, pa.Array] = {}
        for name in self.headers:
            cols[name] = struct.field(name)
        cols["_quarantined"] = quarantined
        return pa.table(cols)

    def parse_table(
        self, batch: pa.Table, line_col: str = "text", keep_line: bool = False
    ) -> pa.Table:
        """Vectorized batch form for ``map_batches``: input columns + headers."""
        parsed = self.parse_array(batch[line_col])
        out = batch if keep_line else batch.drop_columns([line_col])
        for name in parsed.column_names:
            out = out.append_column(name, parsed[name])
        return out

    def parse_line(self, line: str) -> dict[str, str] | None:
        """Single-line convenience (tests / driver-side checks only)."""
        m = self.pattern.search(line.strip())
        return m.groupdict() if m else None
