"""Shared scoping for keyed exchanges — the ONE audited set/restore of
``DataContext.shuffle_strategy`` (ADVICE r03: eight hand-rolled copies of
the pattern drifted across stages; any bug in one of them was invisible).

Keyed ``repartition(keys=...)`` requires ``ShuffleStrategy.HASH_SHUFFLE``
*at execution time*, so every operator that exchanges must (a) flip the
strategy, (b) EXECUTE (materialize/consume) the plan inside the scope, and
(c) restore. Two scoping facts this helper encodes:

- ``Dataset.context`` is a PER-DATASET ``DataContext`` copy, not the
  process-global singleton: ``read_datasource`` snapshots
  ``DataContext.get_current().copy()`` into the plan (verified against Ray
  2.49 source), and derived datasets share their parent's copy. Flipping
  ``ds.context`` therefore cannot be observed by concurrently-executing
  unrelated datasets — only by datasets in the SAME lineage, which is the
  intent. Callers should pass the Dataset (preferred) so the flip stays
  lineage-scoped; passing the global context is reserved for session-wide
  warm-up (bench.py).
- Nesting is safe: restores run LIFO via ``finally``, so an inner scope
  restores to the outer scope's HASH_SHUFFLE and the outermost restores
  the original — but an operator that RETURNS a lazy (unexecuted) plan from
  inside the scope is a bug, because execution then happens after restore.
  Materialize or consume before leaving the ``with``.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def hash_shuffle(ds_or_ctx):
    """``with hash_shuffle(ds):`` — scope HASH_SHUFFLE to the block.

    Accepts a ``ray.data.Dataset`` (uses its per-lineage context copy) or a
    ``DataContext`` directly. Yields the context it flipped.
    """
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = ds_or_ctx if isinstance(ds_or_ctx, DataContext) else ds_or_ctx.context
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        yield ctx
    finally:
        ctx.shuffle_strategy = prev
