"""Grouping-accuracy evaluator (SURVEY.md A15).

Reproduces the reference's evaluation semantics († ``logparser/utils/
evaluator.py`` — ``evaluate`` / ``get_accuracy``): pairwise
precision/recall/F1 over same-group line pairs, plus *grouping accuracy* =
fraction of lines whose parsed event group's line set exactly equals a
ground-truth group's line set.

The distributed wrapper reduces the row-scale join to three small
group-size tables (truth sizes, parsed sizes, intersection sizes) via Ray
groupbys; the combinatorial arithmetic then runs driver-side on those tiny
tables — nothing row-scale ever reaches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


def _comb2(n: pd.Series | int):
    return n * (n - 1) // 2


@dataclass
class EvalResult:
    accuracy: float
    precision: float
    recall: float
    f1: float
    n_lines: int

    def to_table(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "accuracy": [round(self.accuracy, 6)],
                "precision": [round(self.precision, 6)],
                "recall": [round(self.recall, 6)],
                "f1": [round(self.f1, 6)],
                "n_lines": [self.n_lines],
            }
        )


def evaluate_group_sizes(
    truth_sizes: pd.DataFrame,  # (truth_id, n)
    parsed_sizes: pd.DataFrame,  # (parsed_id, n)
    inter_sizes: pd.DataFrame,  # (truth_id, parsed_id, n)
) -> EvalResult:
    """The combinatorial core over (small) group-size tables."""
    total = int(truth_sizes["n"].sum())
    real_pairs = int(_comb2(truth_sizes["n"]).sum())
    parsed_pairs = int(_comb2(parsed_sizes["n"]).sum())
    accurate_pairs = int(_comb2(inter_sizes["n"]).sum())
    precision = accurate_pairs / parsed_pairs if parsed_pairs else 0.0
    recall = accurate_pairs / real_pairs if real_pairs else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    # grouping accuracy: a parsed group is correct iff it has exactly one
    # intersection, covering an entire truth group AND the entire parsed group
    m = inter_sizes.merge(
        truth_sizes.rename(columns={"n": "n_truth"}), on="truth_id"
    ).merge(parsed_sizes.rename(columns={"n": "n_parsed"}), on="parsed_id")
    exact = m[(m["n"] == m["n_truth"]) & (m["n"] == m["n_parsed"])]
    accuracy = float(exact["n"].sum()) / total if total else 0.0
    return EvalResult(accuracy, precision, recall, f1, total)


def evaluate_pandas(
    truth: pd.DataFrame, parsed: pd.DataFrame, key: list[str], event_col: str = "event_id"
) -> EvalResult:
    """Small-data path (unit tests / driver-side conformance)."""
    j = truth.merge(parsed, on=key, suffixes=("_t", "_p"))
    t = (
        truth.groupby(event_col).size().reset_index(name="n").rename(columns={event_col: "truth_id"})
    )
    p = (
        parsed.groupby(event_col).size().reset_index(name="n").rename(columns={event_col: "parsed_id"})
    )
    i = (
        j.groupby([f"{event_col}_t", f"{event_col}_p"])
        .size()
        .reset_index(name="n")
        .rename(columns={f"{event_col}_t": "truth_id", f"{event_col}_p": "parsed_id"})
    )
    return evaluate_group_sizes(t, p, i)


def evaluate_datasets(truth_ds, parsed_ds, key: list[str], event_col: str = "event_id") -> EvalResult:
    """Distributed path: Ray joins/groupbys reduce to group-size tables.

    ``truth_ds``/``parsed_ds`` must expose ``key + [event_col]`` columns.
    The hash join runs on ``key`` (SURVEY.md J2); only group-size tables are
    collected.
    """
    from ray.data.aggregate import Count

    t = (
        truth_ds.groupby(event_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .rename(columns={event_col: "truth_id"})
    )
    p = (
        parsed_ds.groupby(event_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .rename(columns={event_col: "parsed_id"})
    )
    joined = truth_ds.join(
        parsed_ds,
        join_type="inner",
        on=tuple(key),
        num_partitions=8,
        left_suffix="_t",
        right_suffix="_p",
    )
    i = (
        joined.groupby([f"{event_col}_t", f"{event_col}_p"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .rename(
            columns={f"{event_col}_t": "truth_id", f"{event_col}_p": "parsed_id"}
        )
    )
    return evaluate_group_sizes(t, p, i)
