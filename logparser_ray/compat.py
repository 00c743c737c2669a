"""Drop-in upstream API façade (SURVEY.md §2.8).

The reference's uniform extension surface is one class per algorithm:
``LogParser(log_format, indir, outdir, rex=[], …params)`` with a
``parse(logName)`` method writing ``<logName>_structured.csv`` and
``<logName>_templates.csv`` († every ``logparser/<Algo>/<Algo>.py``; demo
scripts in † ``demo/``). This module reproduces that surface with the SAME
parameter names, backed by the Ray Data engine — a user of the reference
can keep their demo/benchmark scripts and switch the import:

    from logparser_ray.compat import Drain
    parser = Drain.LogParser(log_format, indir, outdir, depth=4, st=0.5,
                             rex=[r"blk_-?\\d+"])
    parser.parse("HDFS_2k.log")

Upstream-name → engine-name parameter mappings are per algorithm below.
MoLFI is intentionally unavailable (stochastic NSGA-II — SURVEY.md A12).
Ray: the engine never calls ``ray.init`` — Ray Data auto-initialises when
these entry points run standalone.
"""

from __future__ import annotations

import os
import re
import types

import pyarrow as pa

from logparser_ray import fixtures  # noqa: F401  (re-export convenience)
from logparser_ray.core.bank import WILDCARD, PatternBank


def _preprocess_stage(ds, rex: list[str], content_col: str = "Content"):
    """M1: ordered regex → ``<*>`` substitution, vectorized per batch.

    Always emits ``ContentPre`` — downstream fit/match hardcode that column,
    so the upstream-default ``rex=[]`` path must produce it too (a zero-copy
    column rename; previously this path crashed with a missing column)."""
    compiled = list(rex)

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[content_col].combine_chunks()
        for r in compiled:
            col = pc.replace_substring_regex(col, r, WILDCARD)
        i = batch.column_names.index(content_col)
        return batch.set_column(i, "ContentPre", col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _BaseLogParser:
    """Shared parse() driver: read → header DSL → rex → fit → match → CSVs."""

    #: subclass hooks
    _fit = None  # fn(ds, text_col, self) -> PatternBank

    def __init__(self, log_format: str, indir: str, outdir: str, rex=None, **params):
        self.log_format = log_format
        self.indir = indir
        self.outdir = outdir
        self.rex = list(rex or [])
        self.params = params
        self.df_log = None  # populated by parse() for upstream-script parity

    def fit_bank(self, ds) -> PatternBank:
        raise NotImplementedError

    def parse(self, logName: str) -> None:
        from logparser_ray.sources.rawlog import (
            read_raw_log,
            write_structured_csv,
            write_templates_csv,
        )
        from logparser_ray.stages.parse import match_stage

        path = os.path.join(self.indir, logName)
        ds = read_raw_log(path, self.log_format, keep_line=False)
        ok = ds.filter(expr="_quarantined == False").drop_columns(["_quarantined"])
        pre = _preprocess_stage(ok, self.rex)
        bank = self.fit_bank(pre)
        matched = match_stage(pre, bank, text_col="ContentPre")

        # restore upstream column names: Content = the ORIGINAL content
        def restore(batch: pa.Table) -> pa.Table:
            if "ContentPre" in batch.column_names:
                names = [
                    "Content" if c == "ContentPre" else c for c in batch.column_names
                ]
                batch = batch.rename_columns(names)
            return batch

        # the upstream CSV façade is inherently driver-side (upstream writes
        # one pandas CSV per 2k-line log); refuse corpus-scale inputs rather
        # than silently materializing them on the driver
        n_lines = matched.count()
        if n_lines > 1_000_000:
            raise ValueError(
                f"compat façade parse() materializes results driver-side and "
                f"got {n_lines} lines (> 1,000,000); use the Dataset API "
                f"(stages.mine / stages.parse) for corpus-scale inputs"
            )
        if self.rex:
            # re-read original content for the structured CSV (upstream keeps
            # the raw line content; the rex-preprocessed text only feeds the
            # miner/matcher)
            orig = read_raw_log(path, self.log_format, keep_line=False).filter(
                expr="_quarantined == False"
            )
            orig_pd = orig.to_pandas()[["file", "LineId", "Content"]]
            out_pd = matched.to_pandas().drop(columns=["ContentPre"])
            out_pd = out_pd.merge(orig_pd, on=["file", "LineId"])
        else:
            out_pd = matched.map_batches(
                restore, batch_format="pyarrow"
            ).to_pandas()
        os.makedirs(self.outdir, exist_ok=True)
        base = os.path.join(self.outdir, logName)
        headers = [
            c
            for c in out_pd.columns
            if c
            not in ("file", "LineId", "Content", "template_id", "template", "params")
        ]
        out_pd = out_pd.sort_values("LineId").reset_index(drop=True)
        tbl = pa.Table.from_pandas(out_pd.drop(columns=["file"]), preserve_index=False)
        write_structured_csv(tbl, f"{base}_structured.csv", headers=headers)
        write_templates_csv(
            matched.select_columns(["template_id", "template"]),
            f"{base}_templates.csv",
        )
        self.df_log = out_pd


def _online(miner_name: str, param_map: dict):
    class LogParser(_BaseLogParser):
        def fit_bank(self, ds) -> PatternBank:
            from logparser_ray.stages.mine import fit_bank

            mapped = {
                param_map[k]: v for k, v in self.params.items() if k in param_map
            }
            return fit_bank(ds, miner_name, text_col="ContentPre", params=mapped)

    return LogParser


def _grouped(fit_name: str, param_map: dict, scale_support: bool = False):
    class LogParser(_BaseLogParser):
        def fit_bank(self, ds) -> PatternBank:
            from logparser_ray.stages import mine

            fit = getattr(mine, fit_name)
            mapped = {
                param_map[k]: v for k, v in self.params.items() if k in param_map
            }
            if scale_support and "rsupport" in self.params:
                # LogCluster's relative support (percent of lines)
                n = ds.count()
                mapped["support"] = max(1, int(self.params["rsupport"] / 100.0 * n))
            return fit(ds, text_col="ContentPre", **mapped)

    return LogParser


def _module(name: str, cls) -> types.ModuleType:
    m = types.ModuleType(name)
    m.LogParser = cls
    return m


# upstream module-per-algorithm surface, upstream parameter names
Drain = _module(
    "Drain", _online("drain", {"depth": "depth", "st": "st", "maxChild": "max_children"})
)
Spell = _module("Spell", _online("spell", {"tau": "tau"}))
LenMa = _module("LenMa", _online("lenma", {"threshold": "threshold"}))
SHISO = _module(
    "SHISO",
    _online(
        "shiso",
        {"maxChildNum": "max_children", "mergeThreshold": "merge_threshold"},
    ),
)
LogMine = _module("LogMine", _online("logmine", {"max_dist": "max_dist"}))
IPLoM = _module(
    "IPLoM", _grouped("iplom_fit", {"CT": "ct", "lowerBound": "lower_bound"})
)
AEL = _module("AEL", _grouped("ael_fit", {"mergePercent": "merge_pct"}))
LFA = _module("LFA", _grouped("lfa_fit", {}))
SLCT = _module("SLCT", _grouped("slct_fit", {"support": "support"}))
LogCluster = _module(
    "LogCluster", _grouped("logcluster_fit", {"support": "support"}, scale_support=True)
)
Logram = _module(
    "Logram", _grouped("logram_fit", {"doubleThreshold": "threshold"})
)
LogSig = _module("LogSig", _grouped("logsig_fit", {"groupNum": "k"}))
LKE = _module("LKE", _grouped("lke_fit", {"split_threshold": "threshold"}))


# POP († ``logparser/POP/`` — He et al., "Towards Automated Log Parsing for
# Large-Scale Log Data Analysis"): the reference's only DISTRIBUTED parser, a
# Spark job doing hierarchical partitioning (by token count, then by split
# token position) + per-group template abstraction — IPLoM's partitioning
# family executed data-parallel. This engine IS that architecture on Ray
# Data, so the landing point maps POP onto the distributed ``iplom_fit``
# (groupby-shuffle partitioning, per-group mining). Upstream's Spark-tuning
# knobs have no meaning here and are accepted+ignored; the mining thresholds
# map as below. Exact upstream parameter parity is unverifiable in this
# sandbox (empty reference checkout) — flagged †.
POP = _module("POP", _grouped("iplom_fit", {"CT": "ct", "lowerBound": "lower_bound"}))


class _MoLFIUnavailable:
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "MoLFI is a stochastic NSGA-II metaheuristic (non-reproducible); "
            "out of scope by design — see SURVEY.md A12. Use Drain/IPLoM."
        )


MoLFI = _module("MoLFI", _MoLFIUnavailable)

_re = re  # keep import referenced
