"""Aggregations (SURVEY.md A1, A14, S5): partial-aggregate then tiny groupby.

The scale-critical pattern: a bare ``groupby(keys).count()`` shuffles every
row. ``sink_counts`` instead pre-aggregates inside ``map_batches`` (one row
per distinct key per batch — the combiner) and only the partials enter the
all-to-all ``groupby().sum()``. At 10^12 turns with a few hundred sinks the
shuffle moves KBs instead of TBs; hot-key skew (one template dominating)
is absorbed by the combiner for the same reason.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum

SINK_KEYS = ["role", "tool", "template_id"]


def partial_count(keys: list[str], alias: str = "n_turns"):
    """A map_batches fn computing per-batch grouped counts (the combiner)."""

    def fn(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys).aggregate([([], "count_all")])
        return agg.rename_columns(keys + [alias])

    return fn


def grouped_count(ds, keys: list[str], alias: str = "n_turns", batch_size=None):
    """Exact grouped row count via partial-agg → groupby-sum. Returns Dataset.

    ``batch_size=None`` (whole blocks) on purpose: a fixed batch size that
    doesn't divide the upstream block size makes Ray rebatch ACROSS block
    boundaries — concat-copying every wide block — which measured 4-7×
    slower than per-block batches on this stage (blocks are already bounded
    by the source's block sizing, so memory stays bounded without it)."""
    partials = ds.map_batches(
        partial_count(keys, alias),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    out = partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))
    return out


def sink_counts(ds, alias: str = "n_turns"):
    """Per-sink aggregate counts keyed ``(role, tool, template_id)`` (A14)."""
    return grouped_count(ds, SINK_KEYS, alias)


def template_occurrences(ds, alias: str = "occurrences"):
    """The reference's ``_templates.csv`` aggregate: count per template,
    sorted by occurrences desc then template_id asc (S5, O2)."""
    counts = grouped_count(ds, ["template_id", "template"], alias)
    return counts.sort([alias, "template_id"], descending=[True, False])
