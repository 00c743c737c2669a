"""Lookup-enrichment stage (SURVEY.md M8, J3): broadcast-dim left join.

The dims (roles_dim, tools_dim) are small — broadcast once with ``ray.put``
and mapped per batch with ``pc.index_in`` + ``take``: a fully vectorized
dictionary lookup, no shuffle. Missing keys yield nulls (left-join
semantics; FIXTURES.md F3 exercises the absent-key path).

For large/mutable dims the same class runs as an actor pool
(``concurrency=N``) so the dict is resolved once per actor, not per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def _lookup(values: pa.ChunkedArray | pa.Array, keys: pa.Array, targets: pa.Array):
    """Vectorized dict lookup: for each value, targets[index_of(value in keys)]."""
    idx = pc.index_in(values, value_set=keys)
    return targets.take(idx)


class DimEnricher:
    """Append lookup columns from one or more broadcast dimension tables.

    ``specs`` is a list of ``(dim, join_col, value_cols)`` where ``dim`` is an
    ObjectRef or Arrow table; every ``value_col`` becomes an output column.
    """

    def __init__(self, specs):
        self.specs = []
        for dim, join_col, value_cols in specs:
            if isinstance(dim, ray.ObjectRef):
                dim = ray.get(dim)
            keys = dim[join_col].combine_chunks()
            cols = [(vc, dim[vc].combine_chunks()) for vc in value_cols]
            self.specs.append((join_col, keys, cols))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for join_col, keys, cols in self.specs:
            values = batch[join_col]
            idx = pc.index_in(values, value_set=keys)
            for out_name, target in cols:
                batch = batch.append_column(out_name, target.take(idx))
        return batch


def enrich_stage(ds, *, roles_dim: pa.Table, tools_dim: pa.Table, concurrency=None):
    """Attach role_class / tool_family / is_sandboxed via broadcast lookup."""
    specs = [
        (ray.put(roles_dim), "role", ["role_class"]),
        (ray.put(tools_dim), "tool", ["tool_family", "is_sandboxed"]),
    ]
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    if concurrency is not None:
        return ds.map_batches(
            DimEnricher,
            fn_constructor_kwargs={"specs": specs},
            concurrency=concurrency,
            **kwargs,
        )
    enricher_cache: dict[int, DimEnricher] = {}

    def fn(batch: pa.Table) -> pa.Table:
        e = enricher_cache.get(0)
        if e is None:
            e = DimEnricher(specs)
            enricher_cache[0] = e
        return e(batch)

    return ds.map_batches(fn, **kwargs)
