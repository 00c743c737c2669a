"""logparser_ray — a Ray-Data-native parse→enrich→route→aggregate engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
the ``nbaoping/logparser`` reference (a fork of the LogPAI ``logparser``
template-mining toolkit).  Design blueprint: ``SURVEY.md``; driver contract:
``BASELINE.json`` / ``__ray_entry__.py``.

Layout
------
- ``core/``      pure-Python algorithm kernels (no Ray dependency): the
  template/pattern-bank model, the log-format header DSL, the template
  miners (Drain, Spell, IPLoM, AEL, LFA, SLCT, Logram, LenMa), and the
  grouping-accuracy evaluator.
- ``stages/``    Ray Data batch transforms (vectorized ``map_batches`` fns
  and actor-pool classes): parse/match, enrich, route, aggregate, dedup,
  text analysis, similarity search, multimodal stubs.
- ``sources/``   readers: Parquet transcripts, raw-log text + header DSL.
- ``pipelines/`` end-to-end compositions (the flagship
  parse→enrich→route→aggregate pipeline).
- ``state/``     lineage manifests + checkpointed resume.
- ``fixtures.py`` deterministic synthetic data generators (FIXTURES.md).

IMPORTANT: nothing in this package calls ``ray.init``/``ray.shutdown`` —
the driver, ``bench.py`` and the pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"
