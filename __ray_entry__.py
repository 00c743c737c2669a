"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ``logparser_ray``) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship parse→enrich→aggregate over the sf0.001-scale transcripts
    fixture (6 000 turns — the driver testdata has no transcripts table, so
    the canonical input is synthesized deterministically per FIXTURES.md F1).

    Returns the per-sink aggregate counts Dataset (stable schema:
    role, tool, template_id, n_turns).
    """
    from logparser_ray.queries import q_transcripts_sink_counts

    return q_transcripts_sink_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from logparser_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    from logparser_ray.queries import ORACLE

    return dict(ORACLE)
