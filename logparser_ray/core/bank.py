"""Template / pattern-bank data model with logparser's template semantics.

Reference semantics reproduced here (see SURVEY.md §1.1, §2.2 — the
reference checkout is empty in this sandbox, so anchors are upstream
structural knowledge, flagged †):

- A *template* is a whitespace-token sequence where variable positions are
  the wildcard ``<*>`` († ``logparser/Drain/Drain.py getTemplate``).
- The event/template id is ``md5(template)[:8]`` († ``outputResult()`` in
  every parser).
- Matching a text against a template aligns token-for-token: a wildcard
  matches exactly one (non-space) token; matching is first-match-wins over
  a priority-ordered bank (FIXTURES.md F2).
- Parameters are the tokens captured at wildcard positions, in slot order
  († ``get_parameter_list`` — upstream uses ``(.*?)`` between ``\\s+``
  separators, which degenerates to one token per slot when token counts
  align; we compile ``(\\S+)`` to keep the regexes backtracking-free).

Deviation from upstream, by design: unmatched rows are routed to an explicit
``_fallthrough`` template id instead of being silently dropped (SURVEY.md M6).

This module is pure Python + pyarrow/numpy — no Ray imports — so the
matcher kernel can be unit-tested and then shipped inside ``map_batches``.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WILDCARD = "<*>"
FALLTHROUGH_ID = "_fallthrough"
FALLTHROUGH_TEMPLATE = ""


def template_id_of(template: str) -> str:
    """``md5(template)[:8]`` — deterministic, reproducible event id."""
    return hashlib.md5(template.encode("utf-8")).hexdigest()[:8]


@dataclass(frozen=True)
class Template:
    """One priority-ordered entry of a pattern bank."""

    tokens: tuple[str, ...]
    priority: int = 0

    @property
    def template(self) -> str:
        return " ".join(self.tokens)

    @property
    def template_id(self) -> str:
        return template_id_of(self.template)

    @property
    def n_tokens(self) -> int:
        return len(self.tokens)

    @property
    def n_slots(self) -> int:
        return sum(1 for t in self.tokens if t == WILDCARD)

    def anchored_regex(self) -> str:
        """Anchored regex: literal tokens escaped, each ``<*>`` → ``(\\S+)``."""
        parts = [
            r"(\S+)" if tok == WILDCARD else re.escape(tok) for tok in self.tokens
        ]
        return "^" + r"\s+".join(parts) + "$"

    def named_regex(self) -> str:
        """Anchored regex with named groups ``p0..pk-1`` (FIXTURES.md F2)."""
        slot = iter(range(self.n_slots))
        parts = [
            f"(?P<p{next(slot)}>\\S+)" if tok == WILDCARD else re.escape(tok)
            for tok in self.tokens
        ]
        return "^" + r"\s+".join(parts) + "$"

    @classmethod
    def from_string(cls, template: str, priority: int = 0) -> "Template":
        return cls(tokens=tuple(template.split()), priority=priority)


class PatternBank:
    """An ordered (priority asc) collection of templates.

    First-match-wins: when two templates both match a text the one with the
    lower ``priority`` value claims it (FIXTURES.md F2 "ordered bank").
    Serializable to/from an Arrow table ``(priority, template_id, template,
    regex, n_tokens)`` so a fitted bank can be broadcast via ``ray.put`` or
    persisted as Parquet.
    """

    def __init__(self, templates: list[Template] | None = None):
        self.templates: list[Template] = sorted(
            templates or [], key=lambda t: (t.priority, t.template)
        )

    def __len__(self) -> int:
        return len(self.templates)

    def __iter__(self):
        return iter(self.templates)

    def add(self, template: str | Template, priority: int | None = None) -> Template:
        if isinstance(template, str):
            template = Template.from_string(
                template, priority if priority is not None else len(self.templates)
            )
        self.templates.append(template)
        self.templates.sort(key=lambda t: (t.priority, t.template))
        return template

    def dedup(self) -> "PatternBank":
        """Collapse identical template strings, keeping the best priority.

        Mirrors the md5-identity dedup implicit in † ``outputResult()``
        (identical templates share an EventId) — SURVEY.md D1.
        """
        best: dict[str, Template] = {}
        for t in self.templates:
            prev = best.get(t.template)
            if prev is None or t.priority < prev.priority:
                best[t.template] = t
        return PatternBank(list(best.values()))

    def to_arrow(self) -> pa.Table:
        ts = self.templates
        return pa.table(
            {
                "priority": pa.array([t.priority for t in ts], pa.int32()),
                "template_id": pa.array([t.template_id for t in ts], pa.string()),
                "template": pa.array([t.template for t in ts], pa.string()),
                "regex": pa.array([t.anchored_regex() for t in ts], pa.string()),
                "n_tokens": pa.array([t.n_tokens for t in ts], pa.int32()),
            }
        )

    @classmethod
    def from_arrow(cls, table: pa.Table) -> "PatternBank":
        return cls(
            [
                Template.from_string(tmpl, prio)
                for prio, tmpl in zip(
                    table["priority"].to_pylist(), table["template"].to_pylist()
                )
            ]
        )

    def save(self, path: str) -> str:
        """Persist the bank as Parquet (atomic) — a fitted bank is the
        shareable artifact between fit jobs and match jobs."""
        import os
        import tempfile

        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(self.to_arrow(), tmp)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return path

    @classmethod
    def load(cls, path: str) -> "PatternBank":
        import pyarrow.parquet as pq

        return cls.from_arrow(pq.read_table(path))

    def compile(self) -> "CompiledBank":
        return CompiledBank(self)


class CompiledBank:
    """Vectorized first-match-wins matcher over a text column.

    The hot path is T (= bank size) passes of ``pc.match_substring_regex``
    over the Arrow column — C-vectorized, zero Python per row — followed by
    one ``pc.extract_regex`` per matched template for parameter capture.
    Compile once (driver or actor ``__init__``), apply per batch.
    """

    # below this bank size the flat first-match-wins scan beats the
    # token-count trie (prune bookkeeping costs more than the extra passes)
    TRIE_MIN_TEMPLATES = 24

    def __init__(self, bank: PatternBank):
        self.bank = bank
        self.templates = list(bank.templates)
        self._regexes = [t.anchored_regex() for t in self.templates]
        self._ids = np.array(
            [t.template_id for t in self.templates] + [FALLTHROUGH_ID], dtype=object
        )
        self._strings = np.array(
            [t.template for t in self.templates] + [FALLTHROUGH_TEMPLATE], dtype=object
        )
        self._n_slots = np.array(
            [t.n_slots for t in self.templates] + [0], dtype=np.int64
        )
        # level-1 pattern trie (the north star's "ordered pattern-trie"):
        # an anchored token template can ONLY match texts with exactly its
        # token count, so candidates group by n_tokens — exact pruning,
        # first-match-wins order preserved within each group
        self._by_ntok: dict[int, list[int]] = {}
        for i, t in enumerate(self.templates):
            self._by_ntok.setdefault(t.n_tokens, []).append(i)

    def _match_indices_flat(self, texts: pa.Array, matched, unmatched) -> None:
        for i, rx in enumerate(self._regexes):
            if not unmatched.any():
                break
            m = pc.match_substring_regex(texts, rx)
            m = np.asarray(m.fill_null(False)) & unmatched
            matched[m] = i
            unmatched &= ~m

    def _match_indices_trie(self, texts: pa.Array, matched, unmatched) -> None:
        ntok = np.asarray(
            pc.count_substring_regex(texts, r"\S+").fill_null(-1),
            dtype=np.int64,
        )
        for k, idxs in self._by_ntok.items():
            rows = np.flatnonzero((ntok == k) & unmatched)
            if rows.size == 0:
                continue
            sub = texts.take(pa.array(rows))
            un = np.ones(rows.size, dtype=bool)
            for i in idxs:
                if not un.any():
                    break
                m = np.asarray(
                    pc.match_substring_regex(sub, self._regexes[i]).fill_null(False)
                ) & un
                matched[rows[m]] = i
                un &= ~m
        unmatched &= matched == len(self.templates)

    def match_array(
        self, texts: pa.Array | pa.ChunkedArray, with_params: bool = True
    ):
        """Return ``(template_id, template, params)`` Arrow arrays for texts.

        ``params`` is ``list<string>`` (slot fills in slot order; empty list
        for slotless templates and fallthrough rows) — or ``None`` with
        ``with_params=False``, which SKIPS the per-template ``extract_regex``
        passes entirely (measured: they cost as much as the match passes, so
        no-params callers were paying ~2× — 0.10 s → 0.05 s per 75k-row
        shard).
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        # index into self.templates; len(templates) == fallthrough sentinel
        matched = np.full(n, len(self.templates), dtype=np.int64)
        unmatched = np.ones(n, dtype=bool)
        if texts.null_count:
            unmatched &= ~np.asarray(texts.is_null())
        if len(self.templates) >= self.TRIE_MIN_TEMPLATES:
            self._match_indices_trie(texts, matched, unmatched)
        else:
            self._match_indices_flat(texts, matched, unmatched)

        template_id = pa.array(self._ids[matched], type=pa.string())
        template = pa.array(self._strings[matched], type=pa.string())
        if not with_params:
            return template_id, template, None

        # params: one vectorized extract_regex per matched template, values
        # scattered into a flat buffer by (template, slot) — no per-row Python.
        counts = self._n_slots[matched]
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        values = np.empty(int(offsets[-1]), dtype=object)
        for i, t in enumerate(self.templates):
            if t.n_slots == 0:
                continue
            rows = np.flatnonzero(matched == i)
            if rows.size == 0:
                continue
            sub = texts.take(pa.array(rows))
            struct = pc.extract_regex(sub, t.named_regex())
            starts = offsets[rows]
            for s in range(t.n_slots):
                col = struct.field(f"p{s}").to_numpy(zero_copy_only=False)
                values[starts + s] = col
        params = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(values, type=pa.string()),
        )
        return template_id, template, params

    def match_table(
        self, batch: pa.Table, text_col: str = "text", with_params: bool = True
    ) -> pa.Table:
        """Append ``template_id``/``template``/``params`` columns to a batch."""
        tid, tmpl, params = self.match_array(
            batch[text_col], with_params=with_params
        )
        out = batch.append_column("template_id", tid).append_column("template", tmpl)
        if with_params:
            out = out.append_column("params", params)
        return out
