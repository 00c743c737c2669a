"""Parse/match stage: apply a compiled pattern bank over Arrow text batches.

The match kernel itself lives in ``core.bank.CompiledBank`` (pure Python /
pyarrow); this module wraps it for Ray Data:

- ``BankMatcher`` — a callable CLASS for ``map_batches(..., concurrency=N)``:
  the bank Arrow table is broadcast once via ``ray.put`` on the driver and
  each actor resolves + compiles it ONCE in ``__init__`` (SURVEY.md T1 match
  side: "compiled bank broadcast via ray.put, applied in vectorized
  map_batches").
- ``match_stage(ds, bank, ...)`` — attaches the stage with sane defaults.

At 100 TB the bank is tiny (KBs–MBs) and immutable, so broadcast-once +
stateless vectorized matching is the scale path; there is no shuffle here.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from logparser_ray.core.bank import CompiledBank, PatternBank


class BankMatcher:
    """Actor-pool batch matcher; compile-once in ``__init__``, match per batch.

    ``bank`` may be an ``ObjectRef`` to an Arrow bank table (preferred:
    ``ray.put(bank.to_arrow())`` once on the driver) or a plain Arrow table /
    ``PatternBank`` (it then rides along in the serialized actor ctor args,
    which Ray also stores once in the object store).
    """

    def __init__(self, bank, text_col: str = "text", with_params: bool = True):
        if isinstance(bank, ray.ObjectRef):
            bank = ray.get(bank)
        if isinstance(bank, pa.Table):
            bank = PatternBank.from_arrow(bank)
        self.compiled: CompiledBank = bank.compile()
        self.text_col = text_col
        self.with_params = with_params

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.compiled.match_table(
            batch, text_col=self.text_col, with_params=self.with_params
        )


# per-worker-process cache keyed by broadcast ref: compiled once per worker,
# shared across ALL shard tasks that land on it (module-global, so closures
# reference it by module attribute instead of pickling a copy per task)
_TRANSFORM_CACHE: dict[str, tuple] = {}


def make_match_enrich_table_fn(
    bank: PatternBank,
    roles_dim: pa.Table,
    tools_dim: pa.Table,
    *,
    with_params: bool = True,
    text_col: str = "text",
):
    """A ``pa.Table → pa.Table`` parse+enrich transform for the fused routed
    writer (``state.RoutedRunner``): bank + dims broadcast once via
    ``ray.put``, compiled once per worker process."""
    from logparser_ray.stages.enrich import DimEnricher

    bank_ref = ray.put(bank.to_arrow())
    roles_ref = ray.put(roles_dim)
    tools_ref = ray.put(tools_dim)
    key = bank_ref.hex()

    def table_fn(tbl: pa.Table) -> pa.Table:
        st = _TRANSFORM_CACHE.get(key)
        if st is None:
            cb = PatternBank.from_arrow(ray.get(bank_ref)).compile()
            enr = DimEnricher(
                [
                    (ray.get(roles_ref), "role", ["role_class"]),
                    (ray.get(tools_ref), "tool", ["tool_family", "is_sandboxed"]),
                ]
            )
            _TRANSFORM_CACHE[key] = st = (cb, enr)
        cb, enr = st
        return enr(cb.match_table(tbl, text_col=text_col, with_params=with_params))

    return table_fn


def match_stage(
    ds,
    bank: PatternBank,
    *,
    text_col: str = "text",
    with_params: bool = True,
    concurrency=None,
    batch_size: int | None = None,
):
    """``ds`` + compiled-bank match columns (template_id, template, params).

    Uses an actor pool when ``concurrency`` is given (amortizes the regex
    compile across batches); otherwise stateless tasks with the bank
    broadcast by Ray's serialization cache.

    ``batch_size=None`` (whole blocks) by default: a fixed size that doesn't
    divide the upstream block size makes Ray rebatch across block
    boundaries (concat copies — measured slower); pass an explicit size only
    to bound memory under very large blocks.
    """
    bank_ref = ray.put(bank.to_arrow())
    if concurrency is None:
        # stateless task path: compile once per worker process via module cache
        compiled_cache: dict[int, CompiledBank] = {}

        def fn(batch: pa.Table) -> pa.Table:
            cb = compiled_cache.get(0)
            if cb is None:
                cb = PatternBank.from_arrow(ray.get(bank_ref)).compile()
                compiled_cache[0] = cb
            return cb.match_table(batch, text_col=text_col, with_params=with_params)

        return ds.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
    return ds.map_batches(
        BankMatcher,
        fn_constructor_kwargs={
            "bank": bank_ref,
            "text_col": text_col,
            "with_params": with_params,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
