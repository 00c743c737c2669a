"""Sequence packing for training-data assembly: assign documents to
fixed-token-budget training sequences without splitting documents.

The rule is greedy document-boundary packing in id order: a document
starts in the bin its EXCLUSIVE prefix token count falls in —
``seq_id = floor(prefix_sum_before(n_tok) / budget)`` — the deterministic
packing a data loader can reproduce, and exactly SQL's
``sum(n_tok) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND
1 PRECEDING) // budget``.

Scale shape: a global ORDERED prefix scan. The Dataset API has no scan
primitive, so this is one of the documented drop-to-raw-Ray cases
(SURVEY.md custom operators): per-block token sums are computed by tiny
remote tasks over the dataset's block refs (block order is the dataset
order), the driver folds the per-block sums into exclusive offsets (one
int per block), and a second wave of remote tasks adds ``offset + local
exclusive cumsum`` per block. Two touches per block, no shuffle, driver
state = n_blocks integers. Input must already be ordered by ``id_col``
across blocks (a parquet corpus written in id order qualifies); the
per-block (min, max) ranges are checked and a disordered input raises
rather than mis-packs.

Materialization note (VERDICT r03): ``to_arrow_refs()`` executes the input
lineage and PINS its blocks in the object store for the scan's two touches
— object-store-resident (spillable), never driver-resident. In the default
``tok_col=None`` mode the pinned projection is pruned to ``(id_col,
text_col)`` → ``(id_col, n_tok)`` before the scan, so wide inputs don't
inflate the pin. In ``tok_col`` mode every column rides through BY DESIGN
(the packed corpus must carry its payload columns to the sink), so the pin
is the full row set — size the object store (or write/re-read) accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_col: str | None = None,
    budget: int = 2048,
):
    """Returns a Dataset of the scan input plus ``seq_id`` — the
    training-sequence bin the greedy document-boundary rule assigns each
    document to. With ``tok_col`` set, ``ds`` already carries the token
    count (all its columns ride through); otherwise whitespace counts are
    computed from ``text_col`` into ``n_tok``."""
    import ray

    if tok_col is None:
        tok_col = "n_tok"

        def counts(b: pa.Table) -> pa.Table:
            toks = pc.split_pattern(b[text_col].combine_chunks(), " ")
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_tok": pc.cast(pc.list_value_length(toks), pa.int64()),
                }
            )

        counted = ds.select_columns([id_col, text_col]).map_batches(
            counts, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        counted = ds
    refs = counted.to_arrow_refs()
    if not refs:
        return counted

    @ray.remote
    def block_meta(t: pa.Table):
        if t.num_rows == 0:
            return (None, None, 0)
        ids = t[id_col]
        return (
            pc.min(ids).as_py(),
            pc.max(ids).as_py(),
            int(pc.sum(t[tok_col]).as_py()),
        )

    metas = ray.get([block_meta.remote(r) for r in refs])
    # Ray's streaming executor may deliver blocks out of order
    # (preserve_order is off by default); the scan only needs block id
    # RANGES to be disjoint — reorder driver-side by range start (a
    # metadata sort over n_blocks tuples, no data movement) and verify
    # disjointness, raising only for genuinely interleaved ids.
    order = sorted(
        range(len(metas)),
        # empty blocks (lo is None) sort last; 0 stand-in keeps the key
        # comparable when several blocks are empty
        key=lambda i: (metas[i][0] is None, metas[i][0] or 0),
    )
    prev_max = None
    offsets = [0] * len(metas)
    running = 0
    for i in order:
        lo, hi, s = metas[i]
        offsets[i] = running
        running += s
        if lo is None:
            continue
        if prev_max is not None and lo <= prev_max:
            raise ValueError(
                f"pack_sequences requires disjoint {id_col} ranges per "
                f"block (block starting at {lo} overlaps a block ending "
                f"at {prev_max}); sort by {id_col} first"
            )
        prev_max = hi

    @ray.remote
    def add_scan(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("seq_id", pa.array([], pa.int64()))
        # rows inside a block may arrive unsorted — order by id for the scan,
        # matching the cross-block ordering contract
        t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending")]))
        n_tok = t[tok_col].combine_chunks().to_numpy()
        excl = np.concatenate(([0], np.cumsum(n_tok[:-1]))) + off
        return t.append_column("seq_id", pa.array(excl // budget))

    out_refs = [add_scan.remote(r, off) for r, off in zip(refs, offsets)]
    from ray.data import from_arrow_refs

    return from_arrow_refs(out_refs)
