"""Driver-checked query registry: Ray pipelines + matching DuckDB oracle SQL.

Each SQL-expressible operator from SURVEY.md §2 (plus the training-data
extras) gets a ``QUERIES[name]`` Ray implementation and an ``ORACLE[name]``
ANSI-SQL string over the same parquet tables; the driver compares them at
sf0.01 (row count + schema + order-insensitive value hash). Column names and
value semantics match EXACTLY — float aggregates are computed in integer
cents (or rounded identically on both sides with ``floor(x+0.5)``) so the
hashes can't drift on summation order.

Non-SQL-expressible ops (miners, dedup, ANN, evaluator, flagship
transcripts pipeline) appear only in ``QUERIES`` → the driver records
rows-only checks; pytest covers their semantics against fixtures/goldens.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from logparser_ray import fixtures
from logparser_ray.core.evaluator import evaluate_pandas
from logparser_ray.stages.aggregate import grouped_count, sink_counts, template_occurrences
from logparser_ray.stages.dedup import (
    exact_dedup_representatives,
    minhash_near_dupes,
    simhash_clusters,
)
from logparser_ray.stages.multimodal import featurize_media, make_media_table
from logparser_ray.stages.similarity import brute_force_topk, lsh_bucketed_topk
from logparser_ray.stages.textstats import (
    STOPWORDS,
    langid_batch,
    quality_batch,
    token_count_batch,
)
from logparser_ray.pipelines import flagship


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _parquet_rows(sf_dir: str, table: str) -> int:
    """Exact row count from parquet FOOTER metadata — free (no scan); the
    row hint the bucketed window operators size their exchanges with."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _turns_for(sf_dir: str) -> int:
    """Transcript scale matched to the driver sf dirs (lineitem-row parity)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}.get(name, 6_000)


# ---------------------------------------------------------------------------
# SQL-oracled queries
# ---------------------------------------------------------------------------


def q_events_by_type(sf_dir: str):
    """Tagged union, both parts SQL-oracled: ``part='by_type'`` — grouped
    event counts (the original entry); ``part='retention'`` — round-5
    weekly cohort-retention triangle (``cohort_retention``): distinct
    users per (first-activity cohort week, week offset), via grouped-min
    cohorts + size-guarded attach + a distinct-fold — the events stream
    itself never shuffles."""
    import pandas as pd

    from logparser_ray.stages.funnel import cohort_retention_grouped

    bt = grouped_count(
        _read(sf_dir, "events", columns=["event_type"]), ["event_type"], alias="n"
    ).to_pandas()
    rt = cohort_retention_grouped(
        _read(sf_dir, "events", columns=["user_id", "ts"]),
        n_rows=_parquet_rows(sf_dir, "events"),
    )
    parts = [
        pd.DataFrame(
            {"part": "by_type", "grp": bt["event_type"], "n": bt["n"].astype("int64")}
        ),
        pd.DataFrame(
            {
                "part": "retention",
                "grp": rt["cohort_week"].astype(str)
                + ":"
                + rt["week_offset"].astype(str),
                "n": rt["n_users"].astype("int64"),
            }
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_events_hourly(sf_dir: str):
    """Tagged union, both parts SQL-oracled: ``part='hourly'`` — grouped
    hourly counts (the original entry); ``part='align_month'`` — round-5
    FULL OUTER series alignment (``aligned_counts``): monthly event counts
    vs monthly order counts merged on month with one exchange over tagged
    summary partials (the fixture ranges are disjoint — 2024 vs 1995-2001
    — so BOTH unmatched sides are exercised; -1 marks an absent side)."""
    import pandas as pd

    from logparser_ray.stages.aggregate import aligned_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def add_hour(b: pa.Table) -> pa.Table:
        return b.append_column("hour", pc.floor_temporal(b["ts"], unit="hour"))

    hds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    hourly = grouped_count(hds, ["hour", "event_type"], alias="n").to_pandas()

    ev_m = _read(sf_dir, "events", columns=["ts"]).map_batches(
        lambda b: pa.table({"month": pc.strftime(b["ts"], format="%Y-%m")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ord_m = _read(sf_dir, "orders", columns=["o_orderdate"]).map_batches(
        lambda b: pa.table(
            {
                "month": pc.strftime(
                    b["o_orderdate"].combine_chunks().cast(pa.timestamp("us")),
                    format="%Y-%m",
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    aligned = aligned_counts(ev_m, ord_m, "month").to_pandas()
    parts = [
        pd.DataFrame(
            {
                "part": "hourly",
                "grp": hourly["hour"].dt.strftime("%Y-%m-%d %H"),
                "sub": hourly["event_type"].astype(str),
                "n": hourly["n"].astype("int64"),
                "n2": np.int64(-1),
            }
        ),
        pd.DataFrame(
            {
                "part": "align_month",
                "grp": aligned["month"].astype(str),
                "sub": "",
                "n": aligned["n_left"].astype("int64"),
                "n2": aligned["n_right"].astype("int64"),
            }
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_events_json_k(sf_dir: str):
    """JSON field extract (SURVEY.md M7) + bucket aggregate, cents-exact."""
    ds = _read(sf_dir, "events", columns=["props", "value"])

    def extract(b: pa.Table) -> pa.Table:
        k = pc.extract_regex(b["props"].combine_chunks(), r'"k": (?P<k>\d+)').field("k")
        kb = pc.cast(pc.divide(pc.cast(k, pa.int64()), 10), pa.int64())
        cents = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"k_bucket": kb, "value_cents": pa.array(cents)})
        agg = t.group_by(["k_bucket"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return agg.rename_columns(["k_bucket", "n", "value_cents"])

    partial = ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    return partial.groupby("k_bucket").aggregate(
        Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents")
    )


DOC_ROUTES = [("r_the", "^the "), ("r_join", " join "), ("r_spark", " spark ")]


def q_docs_regex_route(sf_dir: str):
    """Ordered first-match-wins regex routing (bank semantics, SQL-checkable)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def route(b: pa.Table) -> pa.Table:
        texts = b["text"].combine_chunks()
        n = len(texts)
        label = np.full(n, "_fallthrough", dtype=object)
        unmatched = np.ones(n, dtype=bool)
        for name, rx in DOC_ROUTES:
            m = np.asarray(pc.match_substring_regex(texts, rx).fill_null(False))
            m &= unmatched
            label[m] = name
            unmatched &= ~m
        t = pa.table({"route": pa.array(label, pa.string())})
        return t.group_by(["route"]).aggregate([([], "count_all")]).rename_columns(
            ["route", "n"]
        )

    partial = ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    return partial.groupby("route").aggregate(Sum("n", alias_name="n"))


def q_docs_token_counts(sf_dir: str):
    """Whitespace + BPE-ish-regex token counts per doc, plus the greedy
    document-boundary sequence-packing assignment (``seq_id`` — training
    sequences of ≤1024 tokens via the distributed ordered prefix scan in
    ``stages/pack.py``). All three columns SQL-oracled; seq_id is SQL's
    exclusive running sum // budget window expression."""
    from logparser_ray.stages.pack import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counted = ds.map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_tok", "n_tok_bpe"])
    return pack_sequences(counted, id_col="doc_id", tok_col="n_tok", budget=1024)


def q_docs_unigram_topk(sf_dir: str):
    """SLCT-style global token frequency (SURVEY.md A9 shape), top 20 —
    the original single-op path, kept callable on its own so bench.py's
    ``docs_word_freq_topk`` timing stays comparable across rounds."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def explode_count(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = pa.table({"tok": toks.flatten()})
        return flat.group_by(["tok"]).aggregate([([], "count_all")]).rename_columns(
            ["tok", "n"]
        )

    from ray.data.aggregate import Sum

    partial = ds.map_batches(explode_count, batch_format="pyarrow", zero_copy_batch=True)
    counts = partial.groupby("tok").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "tok"], descending=[True, False]).limit(20)


def q_docs_bigram_topk(sf_dir: str):
    """Round-5 n-gram top-k (``ngram_freq_topk``, n=2): the
    doc-boundary-respecting bigram counter every n-gram LM / collocation
    pass needs — vectorized via shifted flat slices + a list-id straddle
    mask. Standalone for bench.py; rides ``docs_word_freq_topk``."""
    from logparser_ray.stages.textstats import ngram_freq_topk

    return ngram_freq_topk(
        _read(sf_dir, "documents", columns=["text"]), n=2, k=20
    )


def q_docs_word_freq_topk(sf_dir: str):
    """Tagged union of the global token-frequency family, both SQL-oracled:
    ``part='unigram'`` (SLCT shape, top 20) + ``part='bigram'``
    (round-5 ``ngram_freq_topk``)."""
    import pandas as pd

    uni = q_docs_unigram_topk(sf_dir).to_pandas()
    bi = q_docs_bigram_topk(sf_dir).to_pandas()
    parts = [
        pd.DataFrame(
            {"part": "unigram", "tok": uni["tok"], "n": uni["n"].astype("int64")}
        ),
        pd.DataFrame(
            {"part": "bigram", "tok": bi["gram"], "n": bi["n"].astype("int64")}
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_docs_dedup_exact(sf_dir: str):
    """Exact dedup representatives UNIONED with C4-style span dedup
    (round 4, ``dedup_spans``): part='doc' carries (representative id,
    n_copies); part='span' carries each surviving doc's (n_kept,
    n_dropped) and the md5 of its REASSEMBLED text — the digest pins the
    chunk-keep/reassembly semantics byte-for-byte against DuckDB's
    row_number + string_agg re-derivation."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    reps = exact_dedup_representatives(ds).to_pandas()
    from logparser_ray.stages.dedup import dedup_spans

    spans = dedup_spans(
        ds, span_tokens=10, n_rows=_parquet_rows(sf_dir, "documents")
    ).to_pandas()
    import pandas as pd

    doc_part = pd.DataFrame(
        {
            "part": "doc",
            "doc_id": reps["doc_id"].astype("int64"),
            "a": reps["n_copies"].astype("int64"),
            "b": 0,
            "h": "",
        }
    )
    span_part = pd.DataFrame(
        {
            "part": "span",
            "doc_id": spans["doc_id"].astype("int64"),
            "a": spans["n_kept"].astype("int64"),
            "b": spans["n_dropped"].astype("int64"),
            "h": [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in spans["text_dedup"]
            ],
        }
    )
    out = pd.concat([doc_part, span_part], ignore_index=True)
    out["b"] = out["b"].astype("int64")
    return out


def q_docs_lang_profile(sf_dir: str):
    """Per-language corpus profile: doc/char counts + stopword-ratio
    quality average, ONE partial-aggregate pass (merges the former
    docs_lang_stats and docs_quality_by_lang entries — audit-cap
    discipline, and one streaming pass instead of two)."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars", "text"])

    def partial(b: pa.Table) -> pa.Table:
        # per-doc integer basis points (stop_bp) — exact int64 partials, so
        # the distributed sum is order-independent (ADVICE r03: summing
        # float ratios across nondeterministically-ordered partials was
        # hash-fragile at the 3-decimal rounding boundary)
        q = quality_batch(b)
        t = pa.table(
            {
                "lang": q["lang"],
                "n_chars": q["n_chars"],
                "stop_bp": q["stop_bp"],
            }
        )
        agg = t.group_by(["lang"]).aggregate(
            [
                ([], "count_all"),
                ("n_chars", "sum"),
                ("n_chars", "max"),
                ("stop_bp", "sum"),
            ]
        )
        return agg.rename_columns(
            ["lang", "n_docs", "sum_chars", "max_chars", "sum_bp"]
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = p.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Max("max_chars", alias_name="max_chars"),
        Sum("sum_bp", alias_name="sum_bp"),
    )

    def finish(b: pa.Table) -> pa.Table:
        # half-up milli-units from the exact integer sum, then one exact
        # float division — bit-identical to the oracle's integer algebra
        sum_bp = b["sum_bp"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = ((2 * sum_bp + 10 * n) // (20 * n)) / 1000.0
        return pa.table(
            {
                "lang": b["lang"],
                "n_docs": b["n_docs"],
                "sum_chars": pc.cast(b["sum_chars"], pa.int64()),
                "max_chars": b["max_chars"],
                "avg_stop_ratio": pa.array(avg),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_top_sources(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source"])
    counts = grouped_count(ds, ["source"], alias="n")
    return counts.sort(["n", "source"], descending=[True, False]).limit(10)


def q_orders_customer_join(sf_dir: str):
    """Dim join (SURVEY.md J3): revenue per market segment, cents-exact.
    ``attach_dim`` broadcasts the customer projection at this scale and
    auto-falls-back to a distributed hash join past BROADCAST_MAX_BYTES
    (customer grows with scale factor — VERDICT r02 #4)."""
    from ray.data.aggregate import Sum

    from logparser_ray.stages.joins import attach_dim

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    n_orders = orders.count()  # metadata-only on a root parquet read
    with_seg = attach_dim(
        orders,
        cust,
        fact_key="o_custkey",
        dim_key="c_custkey",
        dim_cols=["c_mktsegment"],
        n_fact_rows=n_orders,
    )

    def part_agg(b: pa.Table) -> pa.Table:
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"c_mktsegment": b["c_mktsegment"], "revenue_cents": pa.array(cents)})
        agg = t.group_by(["c_mktsegment"]).aggregate(
            [([], "count_all"), ("revenue_cents", "sum")]
        )
        return agg.rename_columns(["c_mktsegment", "n_orders", "revenue_cents"])

    partial = with_seg.map_batches(part_agg, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )


def q_tpch_group_aggs(sf_dir: str):
    """Tagged union of the small TPC-H group aggregates (orders per month +
    parts per type-word — audit-cap discipline: freed the slot
    ``docs_corpus_prep`` holds), plus the round-5 hierarchical ROLLUP
    (``rollup_counts``): orders revenue at (year, month) → (year, '*') →
    ('*', '*'), every coarser level re-aggregated from the previous
    summary-sized one (single fact scan). All parts SQL-oracled via
    UNION ALL / GROUP BY ROLLUP."""
    import pandas as pd

    from logparser_ray.stages.aggregate import rollup_counts

    om = q_orders_monthly(sf_dir).to_pandas()
    pt = q_parts_by_type(sf_dir).to_pandas()

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def ym_cents(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "y": pc.strftime(ts, format="%Y"),
                "m": pc.strftime(ts, format="%m"),
                "cents": pa.array(cents),
            }
        )

    prepped = orders.map_batches(
        ym_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    ru = rollup_counts(prepped, ["y", "m"], sum_col="cents").to_pandas()
    # round 5: arbitrary-subset GROUPING SETS via cube_counts — adds the
    # ('*', month) level rollup's prefix chain cannot express
    from logparser_ray.stages.aggregate import cube_counts

    cu = cube_counts(prepped, ["y", "m"], sum_col="cents").to_pandas()
    parts = [
        pd.DataFrame(
            {
                "part": "orders_monthly",
                "grp": om["month"].astype(str),
                "n": om["n_orders"].astype("int64"),
                "cents": om["revenue_cents"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "parts_by_type",
                "grp": pt["type_word"].astype(str),
                "n": pt["n_parts"].astype("int64"),
                "cents": pt["price_cents"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "rollup",
                "grp": ru["y"].astype(str) + ":" + ru["m"].astype(str),
                "n": ru["n"].astype("int64"),
                "cents": ru["cents"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "cube",
                "grp": cu["y"].astype(str) + ":" + cu["m"].astype(str),
                "n": cu["n"].astype("int64"),
                "cents": cu["cents"].astype("int64"),
            }
        ),
    ]
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values(["part", "grp"], kind="mergesort")
        .reset_index(drop=True)
    )


def q_docs_corpus_prep(sf_dir: str):
    """The COMPOSED training-corpus prep pipeline (pipelines/prep.py):
    quality gate → PII redact → per-source mixture sample → exact dedup →
    order restore → sequence packing — pinned END TO END by one SQL
    oracle (gate predicate, md5 mixture thresholds, min-doc_id-per-text
    dedup, and the packing window expression composed in one nested
    query). Redaction is identity on this corpus (no natural PII); its
    exact rewrite is pinned separately by ``docs_curation``'s augmented
    md5 digest. Returns one row per surviving doc:
    ``(doc_id, n_tok, seq_id)``."""
    from logparser_ray.pipelines.prep import prep_corpus

    res = prep_corpus(
        _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"]),
        rates=PREP_RATES,
        default_rate=0.7,
        budget=1024,
        n_rows=_parquet_rows(sf_dir, "documents"),
    )
    return res["dataset"].select_columns(["doc_id", "n_tok", "seq_id"])


# mixture weights for the composed prep pipeline's sampling stage; the SQL
# oracle's CASE thresholds are format(int(rate·2³²), '08x') of these
PREP_RATES = {"src0": 0.9, "src1": 0.5}


def q_parts_by_type(sf_dir: str):
    """part table: count + retail-price cents per p_type prefix word."""
    ds = _read(sf_dir, "part", columns=["p_type", "p_retailprice"])

    def agg(b: pa.Table) -> pa.Table:
        prefix = pc.extract_regex(
            b["p_type"].combine_chunks(), r"^(?P<w>\S+)"
        ).field("w")
        cents = np.floor(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"type_word": prefix, "price_cents": pa.array(cents)})
        out = t.group_by(["type_word"]).aggregate(
            [([], "count_all"), ("price_cents", "sum")]
        )
        return out.rename_columns(["type_word", "n_parts", "price_cents"])

    from ray.data.aggregate import Sum

    p = ds.map_batches(agg, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("type_word").aggregate(
        Sum("n_parts", alias_name="n_parts"), Sum("price_cents", alias_name="price_cents")
    )


def q_suppliers_star(sf_dir: str):
    """Two-hop star join: supplier ⋈ nation ⋈ region → counts per
    (region, nation) name pair. Merges the former nation_region_join and
    suppliers_per_nation entries (audit-cap discipline) while covering
    BOTH broadcast-lookup styles in one query: Arrow ``index_in``+``take``
    for the nation hop and a Python-dict ``map`` for the region hop."""
    nation = pa.concat_tables(
        [
            ray.get(r)
            for r in _read(
                sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]
            ).to_arrow_refs()
        ]
    )
    region = _read(sf_dir, "region").to_pandas()
    n_ref = ray.put(nation)
    r_ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))
    ds = _read(sf_dir, "supplier", columns=["s_nationkey"])

    def fn(b: pa.Table) -> pa.Table:
        dim = ray.get(n_ref)
        rlut = ray.get(r_ref)
        idx = pc.index_in(
            b["s_nationkey"], value_set=dim["n_nationkey"].combine_chunks()
        )
        n_name = dim["n_name"].combine_chunks().take(idx)
        rkeys = dim["n_regionkey"].combine_chunks().take(idx).to_pylist()
        r_name = pa.array([rlut.get(k) for k in rkeys], pa.string())
        return pa.table({"r_name": r_name, "n_name": n_name})

    mapped = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(mapped, ["r_name", "n_name"], alias="n_suppliers")


def q_events_lag_lead(sf_dir: str):
    """LAG/LEAD window functions per user in (ts, event_id) order, via the
    hot-key-safe bucketed operator (``stages/windows.py:
    lag_lead_bucketed``). Per-user-first/last nulls are encoded -1 on both
    sides so the comparison stays integer-exact."""
    from logparser_ray.stages.windows import lag_lead_bucketed

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = lag_lead_bucketed(ds, n_rows=_parquet_rows(sf_dir, "events"))

    def fill(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "prev_id": pc.fill_null(b["prev_id"], -1),
                "next_id": pc.fill_null(b["next_id"], -1),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


FUNNEL_STAGES = ["view", "click", "purchase"]


def q_events_union_extremes(sf_dir: str):
    """Tagged union, both parts SQL-oracled: ``part='extremes'`` —
    Dataset.union (SURVEY core op): error events ∪ high-value events,
    counted per event_type (duplicates preserved — UNION ALL semantics);
    ``part='funnel'`` — round-5 ordered conversion funnel
    (``funnel_counts``): users reaching view → click → purchase with each
    stage strictly after the previous stage's qualifying min-ts (k
    filter → grouped-min → size-guarded-attach passes, no per-user
    loop)."""
    import pandas as pd

    from logparser_ray.stages.funnel import funnel_counts_grouped

    base = _read(sf_dir, "events", columns=["event_type", "value"])
    errors = base.filter(expr="event_type == 'error'")
    high = base.filter(expr="value > 400.0")
    u = errors.union(high)
    ext = grouped_count(u, ["event_type"], alias="n").to_pandas()

    fun = funnel_counts_grouped(
        _read(sf_dir, "events", columns=["user_id", "event_type", "ts"]),
        FUNNEL_STAGES,
        n_rows=_parquet_rows(sf_dir, "events"),
    )
    dt = fun[fun["stage_idx"] > 0]
    parts = [
        pd.DataFrame(
            {"part": "extremes", "grp": ext["event_type"], "n": ext["n"].astype("int64")}
        ),
        pd.DataFrame(
            {
                "part": "funnel",
                "grp": fun["stage_idx"].astype(str) + ":" + fun["stage"],
                "n": fun["n_users"].astype("int64"),
            }
        ),
        # exact total stage-to-stage conversion time (µs) per reached
        # stage — mean time-to-convert = n / the matching funnel count
        pd.DataFrame(
            {
                "part": "funnel_dt",
                "grp": dt["stage_idx"].astype(str) + ":" + dt["stage"],
                "n": dt["sum_dt_us"].astype("int64"),
            }
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_lineitem_q1(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate, integer-exact — the original
    single-op path, kept callable on its own so bench.py's
    ``lineitem_pricing`` timing stays comparable across rounds."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": pa.array(qty),
                "revenue_cents": pa.array(rev),
            }
        )
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("revenue_cents", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "revenue_cents", "n"]
        )

    from ray.data.aggregate import Sum

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n", alias_name="n"),
    )


def q_lineitem_corr(sf_dir: str):
    """Round-5 ``grouped_corr``: per-group Pearson corr(quantity,
    extendedprice-cents) from EXACT integer moments (chunked int64
    partials, arbitrary-precision merge) — bit-deterministic against the
    DuckDB HUGEINT formula at 1e6 scale. Standalone for bench.py; rides
    ``lineitem_pricing`` as ``corr_qp_e6``."""
    from logparser_ray.stages.sketch import grouped_corr

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def int_xy(b: pa.Table) -> pa.Table:
        q = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        p_cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "q": pa.array(q),
                "p": pa.array(p_cents),
            }
        )

    return grouped_corr(
        ds.map_batches(int_xy, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        "q",
        "p",
    ).rename(columns={"corr_scaled": "corr_qp_e6"})


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1 grouped aggregate + the round-5 exact-moment corr column
    (both halves SQL-oracled; see ``q_lineitem_q1`` / ``q_lineitem_corr``)."""
    base = q_lineitem_q1(sf_dir).to_pandas()
    corr = q_lineitem_corr(sf_dir)
    out = base.merge(corr, on=["l_returnflag", "l_linestatus"], how="left")
    # degenerate (zero-variance) groups → -2_000_000, outside the valid
    # [-1e6, 1e6] corr range, so the column stays plain int64 on both sides
    out["corr_qp_e6"] = out["corr_qp_e6"].fillna(-2_000_000).astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], kind="mergesort"
    ).reset_index(drop=True)


def q_customers_semi_anti(sf_dir: str):
    """Semi/anti-join via broadcast id-set (SURVEY.md J3 variant): per
    segment, customers WITH ≥1 order and WITHOUT any order (counted once
    each — membership, not a row-multiplying join)."""
    okeys = _read(sf_dir, "orders", columns=["o_custkey"])

    def collect_keys(b: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(b["o_custkey"].combine_chunks())})

    key_parts = okeys.map_batches(collect_keys, batch_format="pyarrow")
    have = ray.put(
        pc.unique(
            pa.concat_tables([ray.get(r) for r in key_parts.to_arrow_refs()])["k"]
            .combine_chunks()
        )
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def semi_anti(b: pa.Table) -> pa.Table:
        keys = ray.get(have)
        member = pc.is_in(b["c_custkey"], value_set=keys)
        n_with = np.asarray(member).astype(np.int64)
        t = pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_with": pa.array(n_with),
                "n_without": pa.array(1 - n_with),
            }
        )
        agg = t.group_by(["c_mktsegment"]).aggregate(
            [("n_with", "sum"), ("n_without", "sum")]
        )
        return agg.rename_columns(["c_mktsegment", "n_with", "n_without"])

    from ray.data.aggregate import Sum

    p = cust.map_batches(semi_anti, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("c_mktsegment").aggregate(
        Sum("n_with", alias_name="n_with"), Sum("n_without", alias_name="n_without")
    )


def q_revenue_by_nation(sf_dir: str):
    """Fact⋈fact distributed join (SURVEY.md J3): lineitem is
    partial-aggregated to one row per l_orderkey (map_batches combiner +
    one groupby), hash-joined against orders annotated with the broadcast
    customer→nation composed dim, then reduced to 25 nation rows. Neither
    fact table ever lands whole anywhere — the 100 TB shape (the previous
    version concat'd all of orders on the driver)."""
    from ray.data.aggregate import Sum

    from logparser_ray.stages.joins import attach_dim

    # two dim hops, each size-guarded: orders ← customer (c_nationkey) is a
    # broadcast lookup while customer fits, a distributed hash join past
    # BROADCAST_MAX_BYTES (customer grows with sf — VERDICT r02 #4); then
    # ← nation (n_name), 25 rows, always a broadcast
    orders_ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    n_ord = orders_ds.count()  # metadata-only on a root parquet read
    orders = attach_dim(
        attach_dim(
            orders_ds,
            _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
            fact_key="o_custkey",
            dim_key="c_custkey",
            dim_cols=["c_nationkey"],
            n_fact_rows=n_ord,
        ),
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]),
        fact_key="c_nationkey",
        dim_key="n_nationkey",
        dim_cols=["n_name"],
    ).select_columns(["o_orderkey", "n_name"])

    def li_partial(b: pa.Table) -> pa.Table:
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue_cents": pa.array(cents),
                "n_items": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        agg = t.group_by(["l_orderkey"]).aggregate(
            [("revenue_cents", "sum"), ("n_items", "sum")]
        )
        return agg.rename_columns(["l_orderkey", "revenue_cents", "n_items"])

    # per-batch combiner only — no groupby(l_orderkey) barrier: sums
    # distribute across the join, so partial rows (≥1 per orderkey per
    # block) join fine and the per-nation aggregate finishes the reduction
    li_ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    n_li = li_ds.count()  # metadata-only
    li = li_ds.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    from logparser_ray.stages.joins import join_num_partitions

    joined = li.join(
        orders,
        "inner",
        num_partitions=join_num_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def nation_partial(b: pa.Table) -> pa.Table:
        agg = b.group_by(["n_name"]).aggregate(
            [("revenue_cents", "sum"), ("n_items", "sum")]
        )
        return agg.rename_columns(["n_name", "revenue_cents", "n_items"])

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )


def q_events_distinct_users(sf_dir: str):
    """Exact distinct count per event_type: two-level groupby (dedup shuffle
    then count) — the scalable exact-distinct shape."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))
    return (
        pairs.drop_columns(["_c"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


def q_events_profile(sf_dir: str):
    """Table profiler (per-column data-quality stats: row/null/distinct
    counts + min/max renderings — ``stages/profile.py``, one streaming
    pass + a column-count-sized merge) unioned with the grouped
    exact-distinct rows the former ``events_distinct_users`` entry pinned.
    Long format ``(part, k, v)`` so every stat and type shares one
    hash-comparable schema; float min/max fold on the IEEE total-order
    bit key and render via shortest-round-trip ``repr`` — byte-identical
    to DuckDB ``CAST(double AS VARCHAR)``."""
    from logparser_ray.stages.profile import profile_table

    ev = _read(sf_dir, "events")
    prof = profile_table(ev).to_pandas()
    part, k, v = [], [], []
    for _, r in prof.iterrows():
        for stat in ("n_rows", "n_null", "n_distinct"):
            part.append("profile")
            k.append(f"{r['col']}.{stat}")
            v.append(str(int(r[stat])))
        for stat in ("min_repr", "max_repr"):
            if r[stat] is not None:
                part.append("profile")
                k.append(f"{r['col']}.{stat}")
                v.append(r[stat])
    du = q_events_distinct_users(sf_dir).to_pandas()
    for _, r in du.iterrows():
        part.append("distinct_users")
        k.append(str(r["event_type"]))
        v.append(str(int(r["n_users"])))
    return pa.table(
        {
            "part": pa.array(part, pa.string()),
            "k": pa.array(k, pa.string()),
            "v": pa.array(v, pa.string()),
        }
    )


def q_orders_monthly(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.strftime(b["o_orderdate"], format="%Y-%m")
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"month": m, "revenue_cents": pa.array(cents)})
        agg = t.group_by(["month"]).aggregate(
            [([], "count_all"), ("revenue_cents", "sum")]
        )
        return agg.rename_columns(["month", "n_orders", "revenue_cents"])

    from ray.data.aggregate import Sum

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("month").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )


def q_top_orders_per_segment(sf_dir: str):
    """Per-group top-k (windowed O2 variant): top 3 orders by price per
    market segment — groupby().map_groups with a deterministic tiebreak."""
    from logparser_ray.stages.joins import attach_dim

    orders_ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    n_ord = orders_ds.count()  # metadata-only
    ds = attach_dim(
        orders_ds,
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]),
        fact_key="o_custkey",
        dim_key="c_custkey",
        dim_cols=["c_mktsegment"],
        n_fact_rows=n_ord,
    )

    def partial_topk(b: pa.Table) -> pd.DataFrame:
        # per-batch top-3 per segment: the combiner shape (a
        # groupby(segment).map_groups here would materialize ~1/5 of the
        # fact table in one worker's pandas frame)
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame(
            {
                "c_mktsegment": b["c_mktsegment"].to_numpy(zero_copy_only=False),
                "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False),
                "price_cents": cents,
            }
        )
        return (
            g.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
            .groupby("c_mktsegment", sort=False)
            .head(3)
        )

    candidates = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()  # ≤ 3 × n_segments × n_blocks rows — tiny
    )
    out = (
        candidates.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
        .groupby("c_mktsegment", sort=False)
        .head(3)
        .sort_values(["c_mktsegment", "price_cents", "o_orderkey"])
        .reset_index(drop=True)
    )
    return out[["c_mktsegment", "o_orderkey", "price_cents"]]


def q_events_filter(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["event_type"], "error"), pc.greater(b["value"], 100.0))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (windowed op per SURVEY.md §2.7 'ours'),
    through the hot-key-safe bucketed operator: per-(user, time-bucket)
    partials + boundary merge, so one bot user's whole history never lands
    on one worker (VERDICT r02 #8 — same oracle, scale-safe path; equality
    with an independent naive pandas scan is pinned in
    tests/test_extras.py::test_sessionize_bucketed_equals_naive)."""
    from logparser_ray.stages.windows import sessionize_bucketed

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return sessionize_bucketed(ds, gap_s=1800.0, n_rows=_parquet_rows(sf_dir, "events"))


def q_events_avg_gap(sf_dir: str):
    """Lag-window op: per user, count and total seconds of gaps between
    consecutive events (ts order, event_id tiebreak) — integer-exact.
    Routes the hot-key-safe (user, time-bucket) decomposition (VERDICT r03
    #2: the previous per-user ``map_groups(pandas)`` landed a whole hot
    user on one worker)."""
    from logparser_ray.stages.windows import avg_gap_bucketed

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return avg_gap_bucketed(ds, n_rows=_parquet_rows(sf_dir, "events"))


def _win_partial(b: pa.Table, win_starts: np.ndarray) -> pa.Table:
    cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
        np.int64
    )
    t = pa.table(
        {
            "win_start": pa.array(win_starts),
            "event_type": b["event_type"],
            "n": pa.array(np.ones(len(cents), np.int64)),
            "value_cents": pa.array(cents),
        }
    )
    agg = t.group_by(["win_start", "event_type"]).aggregate(
        [("n", "sum"), ("value_cents", "sum")]
    )
    return agg.rename_columns(["win_start", "event_type", "n", "value_cents"])


def q_events_tumbling(sf_dir: str):
    """Tumbling event-time window (5 min): count + value cents per
    (window, event_type) — the non-overlapping windowed aggregate."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        ep = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy()  # µs
        win = (ep // 300_000_000) * 300  # window start, whole seconds
        return _win_partial(b, win)

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["win_start", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents")
    )


def q_events_hopping(sf_dir: str):
    """Hopping event-time window (length 10 min, hop 5 min): every event
    lands in exactly TWO overlapping windows (the row-expanding windowed
    aggregate tumbling can't express)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        ep = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy()  # µs
        s = (ep // 300_000_000) * 300
        return pa.concat_tables([_win_partial(b, s), _win_partial(b, s - 300)])

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["win_start", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents")
    )


def q_transcripts_conv_text_hash(sf_dir: str):
    """O1 conformance: per-conversation md5 over texts in (turn_idx) order —
    byte-level proof that per-turn text order is preserved end to end."""
    import hashlib

    tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
    ds = ray.data.read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx")
        h = hashlib.md5("\n".join(g["text"]).encode()).hexdigest()[:16]
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "n_turns": [len(g)],
                "text_hash": [h],
            }
        )

    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


VALUE_BANDS = [
    ("low", 0.0, 100.0),
    ("mid", 100.0, 300.0),
    ("high", 300.0, 1e12),
]


def q_events_value_bands(sf_dir: str):
    """Range/interval join: events bucketed into value bands via the
    broadcast interval join (lo <= v < hi), counted per band."""
    from logparser_ray.stages.joins import interval_join

    iv = pa.table(
        {
            "band": [b for b, _, _ in VALUE_BANDS],
            "lo": [lo for _, lo, _ in VALUE_BANDS],
            "hi": [hi for _, _, hi in VALUE_BANDS],
        }
    )
    ds = _read(sf_dir, "events", columns=["value"])
    joined = interval_join(ds, iv, value_col="value")
    return grouped_count(joined, ["band"], alias="n")


def q_events_rolling_sum(sf_dir: str):
    """Windowed aggregate (custom operator): per-user rolling sum of value
    cents over the current + 2 preceding events in (ts, event_id) order.
    Routes the hot-key-safe (user, time-bucket) decomposition (VERDICT r03
    #2): interior rows resolve in one bucketed exchange; only ≤4 rows per
    (user, bucket) take the second tiny per-user exchange."""
    from logparser_ray.stages.windows import rolling_sum_bucketed

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    return rolling_sum_bucketed(
        ds, window=3, n_rows=_parquet_rows(sf_dir, "events")
    )


def q_purchase_asof_click(sf_dir: str):
    """As-of join (custom operator): each purchase event attached to the
    user's latest STRICTLY-PRIOR click in (ts, event_id) order; returns
    (purchase_id, click_id, gap_s) integer-exact."""
    from logparser_ray.stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'").drop_columns(["event_type"])

    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        tiebreak="event_id",
        right_cols=["event_id", "ts"],
        n_rows=_parquet_rows(sf_dir, "events"),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_id_r"].notna()]
        gap = np.floor(
            (b["ts"] - b["ts_r"]).dt.total_seconds()
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "purchase_id": b["event_id"].astype(np.int64),
                "click_id": b["event_id_r"].astype(np.int64),
                "gap_s": gap,
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Fetch one query embedding via a direct parquet row-group read (the
    previous ``ds.filter(...).to_pandas()`` scanned the whole table through
    a Ray job just to pull one row — VERDICT r01)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_embeddings_knn(sf_dir: str):
    """Brute-force cosine top-5 vs the vec_id=0 embedding.

    Cosines are reported in integer basis points (``floor(cos*1e4+0.5)``) so
    the DuckDB oracle hash can't drift on float32/float64 representation.
    """
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, _query_vec(sf_dir), k=32)
    out["cos_bp"] = np.floor(out["cos"] * 10_000 + 0.5).astype(np.int64)
    out = out.sort_values(["cos_bp", "vec_id"], ascending=[False, True]).head(5)
    return out[["vec_id", "cos_bp"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; semantics covered by pytest)
# ---------------------------------------------------------------------------


def q_transcripts_sink_counts(sf_dir: str):
    """The flagship per-sink aggregate (A14) over the transcripts fixture.
    Capped at the 60k fixture the golden-path SQL oracle is pinned to
    (the oracle references the fixed ``golden_n60000_s42`` parquet, so the
    engine side must run the SAME corpus at every sf)."""
    tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
    ds = ray.data.read_parquet(tdir)
    out = flagship.parse_enrich(ds, with_params=False)
    return sink_counts(out)


def q_transcripts_templates(sf_dir: str):
    """The reference's _templates.csv aggregate over the fixture (S5),
    unioned with the O1 per-conversation text-hash conformance rows
    (audit-cap discipline — freed the slot transcripts_conv_stats holds).
    ``part='templates'``: (template_id, template, occurrences);
    ``part='conv_hash'``: (conv_id, md5-16, n_turns). Capped at the 60k
    fixture the fixture-path SQL oracle is pinned to."""
    import pandas as pd

    tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
    ds = ray.data.read_parquet(tdir)
    out = flagship.parse_enrich(ds, with_params=False)
    tm = template_occurrences(out).to_pandas()
    ch = q_transcripts_conv_text_hash(sf_dir).to_pandas()
    parts = [
        pd.DataFrame(
            {
                "part": "templates",
                "a": tm["template_id"].astype(str),
                "b": tm["template"].astype(str),
                "n": tm["occurrences"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "conv_hash",
                "a": ch["conv_id"].astype(str),
                "b": ch["text_hash"].astype(str),
                "n": ch["n_turns"].astype("int64"),
            }
        ),
    ]
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values(["part", "a"], kind="mergesort")
        .reset_index(drop=True)
    )


def q_transcripts_conv_stats(sf_dir: str):
    """Per-conversation analytics over the north-star transcripts table —
    the conversation-level curation signals a training pipeline gates on:
    turn count, tool-call turns, total/max text size, and the
    conversation's wall-clock span. ONE hash aggregation (Count/Sum/Max/
    Min partials), fully distributed; the per-turn char/tool columns are
    derived vectorized per batch first."""
    from ray.data.aggregate import Count, Max, Min, Sum

    tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
    ds = ray.data.read_parquet(tdir, columns=["conv_id", "tool", "text", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        texts = b["text"].combine_chunks()
        n_chars = pc.cast(pc.utf8_length(texts).fill_null(0), pa.int64())
        # the fixture encodes "no tool" as '' (never null), so tool-turn
        # means a non-empty tool name (is_valid counted EVERY turn before)
        tools = pc.fill_null(b["tool"].combine_chunks(), "")
        is_tool = pc.cast(pc.not_equal(tools, ""), pa.int64())
        ep = pc.cast(b["ts"].combine_chunks(), pa.int64())  # µs
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "n_chars": n_chars,
                "is_tool": is_tool,
                "ep_us": ep,
            }
        )

    agg = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("is_tool", alias_name="n_tool_turns"),
            Sum("n_chars", alias_name="sum_chars"),
            Max("n_chars", alias_name="max_chars"),
            Min("ep_us", alias_name="_first_us"),
            Max("ep_us", alias_name="_last_us"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        span = pc.divide(
            pc.subtract(b["_last_us"], b["_first_us"]), 1_000_000
        )
        out = b.drop_columns(["_first_us", "_last_us"])
        return out.append_column("span_s", pc.cast(span, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_transcripts_structured(sf_dir: str):
    """The reference's _structured.csv shape: input + template_id/template/
    params (+ enrichment dims). ``params`` is flattened to a unit-separator
    joined string so the row-level DuckDB oracle (golden parquet +
    ``array_to_string``) can hash it — a per-row proof that the matcher
    reproduces the generator's golden labels exactly."""
    tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
    ds = ray.data.read_parquet(tdir)
    out = flagship.parse_enrich(ds, with_params=True)

    def flatten_params(b: pa.Table) -> pa.Table:
        joined = pc.binary_join(b["params"].combine_chunks(), "\x1f")
        b = b.drop_columns(["params"]).append_column("params_str", joined)
        # null-free encodings for the enrichment dims: nullable bool/str
        # stringify differently across engines ('None' vs 'nan'), which
        # breaks the order-insensitive sort-then-hash compare even when
        # every keyed value matches — '' means "no dim row" on both sides
        sandb = pc.coalesce(
            pc.cast(b["is_sandboxed"], pa.string()), pa.scalar("")
        )
        b = b.drop_columns(["is_sandboxed"]).append_column("is_sandboxed", sandb)
        for c in ("role_class", "tool_family"):
            filled = pc.coalesce(b[c], pa.scalar(""))
            b = b.drop_columns([c]).append_column(c, filled)
        return b

    return out.map_batches(
        flatten_params, batch_format="pyarrow", zero_copy_batch=True
    )


def q_rawlog_structured(sf_dir: str):
    """Header-DSL parse of the loghub-style rawlog fixture from a real log
    FILE through the file source (S1–S2)."""
    from logparser_ray.sources.rawlog import read_raw_log

    path, _ = fixtures.ensure_rawlog(n_lines=500)
    parsed = read_raw_log(path, fixtures.RAWLOG_FORMAT, keep_line=True)
    return grouped_count(parsed, ["Level", "_quarantined"], alias="n")


def q_docs_unigram_near_dupes(sf_dir: str):
    """MinHash+LSH near-dup pairs (unigram Jaccard ≥ 0.5) over documents."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dupes(ds, k=1, bands=16, rows_per_band=2, threshold=0.5)


def q_docs_simhash_clusters(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_clusters(ds)


def q_docs_simhash_near_dupes(sf_dir: str):
    """Banded-Hamming SimHash near-dup pairs (exact recall by pigeonhole)."""
    from logparser_ray.stages.dedup import simhash_near_dupes

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dupes(ds, max_hamming=3, bands=4)


def q_docs_langid(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = ds.map_batches(langid_batch, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(out, ["lang", "lang_guess"], alias="n")


def q_embeddings_lsh_knn(sf_dir: str):
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_bucketed_topk(ds, _query_vec(sf_dir), k=5)


def q_embeddings_rp_knn(sf_dir: str):
    """Reduced-dimension ANN: JL random projection to 16 dims (seeded,
    regenerated per worker — nothing shipped), then brute-force cosine
    top-k in the cheap space. The composed reduce→search pipeline a 100 TB
    corpus runs when full-dim scoring is too expensive."""
    from logparser_ray.stages.similarity import (
        brute_force_topk,
        project_query,
        random_projection,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(sf_dir)
    red = random_projection(ds, out_dim=16, out_col="embedding")
    return brute_force_topk(red, project_query(q, 16), k=5)


def q_embeddings_ann_approx(sf_dir: str):
    """Tagged union of the six APPROXIMATE ANN paths (recall<1 / lossy
    by construction → rows-only): LSH-bucketed top-k, IVF top-k,
    LSH-bucketed near-dup pairs, JL-projected top-k, PQ asymmetric-
    distance top-k, and composed IVF-PQ. One driver-audited entry covering all six (their
    exactness/recall properties — subset-of-brute-force, identical
    cosines, JL distortion bounds, PQ determinism+self-hit — are pinned
    by pytest)."""
    import pandas as pd

    lsh = q_embeddings_lsh_knn(sf_dir)
    ivf = q_embeddings_ivf_knn(sf_dir)
    nd = q_embeddings_near_dupes_lsh(sf_dir)
    rp = q_embeddings_rp_knn(sf_dir)
    pq = q_embeddings_pq_knn(sf_dir)
    ivfpq = q_embeddings_ivf_pq_knn(sf_dir)
    parts = [
        pd.DataFrame(
            {
                "method": "ivf_pq_knn",
                "a": ivfpq["query_idx"].astype("int64"),
                "b": ivfpq["vec_id"].astype("int64"),
                "val": np.floor(ivfpq["score"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "pq_knn",
                "a": pq["query_idx"].astype("int64"),
                "b": pq["vec_id"].astype("int64"),
                "val": np.floor(pq["score"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "rp_knn",
                "a": rp["query_idx"].astype("int64"),
                "b": rp["vec_id"].astype("int64"),
                "val": np.floor(rp["cos"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "lsh_knn",
                "a": lsh["query_idx"].astype("int64"),
                "b": lsh["vec_id"].astype("int64"),
                "val": np.floor(lsh["cos"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "ivf_knn",
                "a": ivf["query_idx"].astype("int64"),
                "b": ivf["vec_id"].astype("int64"),
                "val": np.floor(ivf["cos"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "near_dupes_lsh",
                "a": nd["a"].astype("int64"),
                "b": nd["b"].astype("int64"),
                "val": nd["cos_bp"].astype("int64"),
            }
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_embeddings_near_dupes(sf_dir: str):
    """Exact embedding-cosine near-dup pairs (cos ≥ 0.4), SQL-oracled."""
    from logparser_ray.stages.similarity import embedding_near_dupes

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dupes(ds, threshold=0.4, mode="exact")


def q_embeddings_ivf_knn(sf_dir: str):
    """IVF ANN: distributed k-means coarse quantizer + probed search."""
    from logparser_ray.stages.similarity import ivf_topk, kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=5)
    return ivf_topk(ds, _query_vec(sf_dir), centroids, k=5, n_probe=2)


def q_embeddings_pq_knn(sf_dir: str):
    """Product-quantization ANN (round 4): 32x-compressed asymmetric-
    distance search — codebooks fit on the bounded deterministic sample,
    per-batch encode+LUT scan (stages/similarity.py:pq_fit/pq_topk)."""
    from logparser_ray.stages.similarity import pq_fit, pq_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    books = pq_fit(ds, m=8, nbits=6, iters=8)
    return pq_topk(ds, _query_vec(sf_dir), books, k=5)


def q_embeddings_ivf_pq_knn(sf_dir: str):
    """IVF-PQ (round 4): coarse-quantizer prune + PQ asymmetric-distance
    scan — the classic billion-scale pairing, composed from the two
    audited stages."""
    from logparser_ray.stages.similarity import ivf_pq_topk, kmeans_fit, pq_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, k=8, iters=5)
    books = pq_fit(ds, m=8, nbits=6, iters=8)
    return ivf_pq_topk(ds, _query_vec(sf_dir), cents, books, k=5, n_probe=3)


def q_embeddings_near_dupes_lsh(sf_dir: str):
    """LSH-bucketed near-dup pairs — the 100 TB path (recall<1 → rows-only)."""
    from logparser_ray.stages.similarity import embedding_near_dupes

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dupes(ds, threshold=0.35, mode="lsh", n_planes=3)


def q_docs_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints → duplicate-sequence clusters."""
    from logparser_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(fp, ["fingerprint"], alias="n_docs")


def q_docs_textstats_extras(sf_dir: str):
    """Language-ID confusion matrix (true lang × argmax marker-count
    guess), SQL-oracled in round 5: the generated DuckDB CASE replicates
    ``langid_batch`` exactly — per-language occurrence counts via
    ``list_filter``, first-max-wins argmax in sorted language order,
    zero-hit → 'und'. The formerly-unioned fingerprint/xent audits moved
    to ``docs_near_dup_audit`` (rows-only there; pytest-pinned)."""
    import pandas as pd

    li = q_docs_langid(sf_dir).to_pandas()
    return (
        pd.DataFrame(
            {
                "part": "langid",
                "a": li["lang"].astype(str),
                "b": li["lang_guess"].astype(str),
                "n": li["n"].astype("int64"),
            }
        )
        .sort_values(["part", "a", "b"], kind="mergesort")
        .reset_index(drop=True)
    )


def q_docs_curation(sf_dir: str):
    """Gopher-style repetition/quality gate + PII redaction over documents
    (training-data pipeline extras), SQL-oracled per doc.

    The fixture corpus carries no natural PII, so the text is first
    augmented with a DETERMINISTIC synthetic suffix (email + IPv4 + long
    account number derived from doc_id) constructed identically in the SQL
    oracle — the ``redacted_md5`` digest then pins the exact vectorized
    RE2 rewrite chain (Arrow and DuckDB both run RE2) on non-trivial
    input, not just match counts. Everything else is one zero-shuffle
    ``map_batches`` pass (see ``stages/curation.py``)."""
    from logparser_ray.stages.curation import (
        curation_gate,
        md5_col_batch,
        pii_redact_batch,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        aug = pc.binary_join_element_wise(
            b["text"].combine_chunks(),
            " contact u",
            pc.cast(ids, pa.string()),
            "@example.com ip 10.0.",
            pc.cast(
                pc.subtract(ids, pc.multiply(pc.divide(ids, 200), 200)),
                pa.string(),
            ),
            ".7 acct 9",
            pc.cast(ids, pa.string()),
            "00000001",
            "",
        )
        return b.set_column(b.schema.get_field_index("text"), "text", aug)

    gated = curation_gate(
        ds.map_batches(augment, batch_format="pyarrow", zero_copy_batch=True)
    )
    red = gated.map_batches(
        pii_redact_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return red.map_batches(
        lambda b: md5_col_batch(b, "text_redacted", "redacted_md5"),
        batch_format="pyarrow",
    ).select_columns(
        [
            "doc_id",
            "n_words",
            "n_distinct",
            "max_word_n",
            "top_bigram_n",
            "n_stop",
            "n_symbol",
            "keep",
            "n_email",
            "n_ipv4",
            "n_idnum",
            "redacted_md5",
        ]
    )


def q_docs_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document for a bounded doc subset (keyword
    scoring — training-data pipeline extra). Corpus-wide DF via a
    vocab-sized groupby; integer basis-point scores so ranking is
    engine-exact. See ``stages/curation.py: tfidf_topk``."""
    from logparser_ray.stages.curation import tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3, target_expr="doc_id < 30")


def q_docs_near_dup_audit(sf_dir: str):
    """Tagged union of the rows-only near-dup / content-analysis audits
    (MinHash-LSH unigram pairs, banded-Hamming SimHash pairs,
    exact-simhash clusters, the round-4 incremental cross-snapshot
    matches, and — moved here in round 5 so `docs_textstats_extras` could
    become SQL-oracled — rolling-hash fingerprint clusters and per-doc
    unigram cross-entropy) — one driver-audited entry (audit-cap
    discipline; per-path semantics are pinned by the planted-dup /
    pigeonhole-recall / cross-side-subset / hand-computed-xent tests in
    tests/test_extras.py)."""
    import pandas as pd

    from logparser_ray.stages.dedup import minhash_against_prior
    from logparser_ray.stages.textstats import unigram_xent

    mh = q_docs_unigram_near_dupes(sf_dir)
    sp = q_docs_simhash_near_dupes(sf_dir)
    cl = q_docs_simhash_clusters(sf_dir).to_pandas()
    # incremental audit: even doc_ids play the prior snapshot, odd the new
    # batch — every cross-parity near-dup must surface with its best match
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def parity(p: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 1), p))

        return fn

    inc = minhash_against_prior(
        docs.map_batches(parity(1), batch_format="pyarrow", zero_copy_batch=True),
        docs.map_batches(parity(0), batch_format="pyarrow", zero_copy_batch=True),
        threshold=0.5,
        n_new=_parquet_rows(sf_dir, "documents") // 2,
        n_prior=_parquet_rows(sf_dir, "documents") // 2,
    )
    parts = [
        pd.DataFrame(
            {
                "method": "minhash_unigram",
                "a": mh["a"].astype("int64"),
                "b": mh["b"].astype("int64"),
                "val": np.floor(mh["jaccard"] * 10_000 + 0.5).astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "simhash_banded",
                "a": sp["a"].astype("int64"),
                "b": sp["b"].astype("int64"),
                "val": sp["hamming"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "simhash_cluster",
                "a": cl["min_doc_id"].astype("int64"),
                "b": cl["n_docs"].astype("int64"),
                "val": cl["simhash"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "minhash_incremental",
                "a": inc["doc_id"].astype("int64"),
                "b": inc["dup_of"].astype("int64"),
                "val": np.floor(inc["jaccard"] * 10_000 + 0.5).astype("int64"),
            }
        ),
    ]
    fp = q_docs_fingerprints(sf_dir).to_pandas()
    xe = unigram_xent(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    ).to_pandas()
    parts += [
        pd.DataFrame(
            {
                "method": "fingerprint",
                # uint64 FNV fingerprints ride as their int64 bit pattern
                "a": fp["fingerprint"].to_numpy().astype(np.uint64).view(np.int64),
                "b": np.int64(0),
                "val": fp["n_docs"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "method": "xent",
                "a": xe["doc_id"].astype("int64"),
                "b": np.int64(0),
                "val": xe["xent_bp"].astype("int64"),
            }
        ),
    ]
    return pd.concat(parts, ignore_index=True)


def q_docs_sampling(sf_dir: str):
    """Tagged union of the two deterministic samplers, both SQL-oracled:
    per-language stratified min-k draw (balanced eval subsets —
    ``sample_stratified``, md5-ordered) and per-source mixture-rate
    sampling (Pile-style source reweighting — ``sample_by_rates``,
    md5-hex-prefix thresholding). One driver-audited entry; the former
    ``docs_stratified_sample`` rows ride as ``part='stratified'``."""
    import pandas as pd

    from logparser_ray.stages.sample import sample_by_rates, sample_stratified

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source", "text"])
    strat = sample_stratified(
        ds, group_col="lang", key_col="text", tiebreak_col="doc_id",
        n_per_group=20,
    )
    mix = (
        sample_by_rates(
            ds,
            group_col="source",
            key_col="text",
            rates=MIXTURE_RATES,
            default_rate=0.05,
        )
        .select_columns(["source", "doc_id"])
        .to_pandas()
    )
    # round 4: deterministic train/val/test split labels (split_by_hash —
    # md5-threshold buckets in label order, zero shuffle), every doc one row
    from logparser_ray.stages.sample import split_by_hash

    spl = (
        split_by_hash(ds, key_col="text", ratios=SPLIT_RATIOS, salt="r4")
        .select_columns(["doc_id", "split"])
        .to_pandas()
    )
    parts = [
        pd.DataFrame(
            {
                "part": "split",
                "grp": spl["split"].astype(str),
                "doc_id": spl["doc_id"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "stratified",
                "grp": strat["lang"].astype(str),
                "doc_id": strat["doc_id"].astype("int64"),
            }
        ),
        pd.DataFrame(
            {
                "part": "mixture",
                "grp": mix["source"].astype(str),
                "doc_id": mix["doc_id"].astype("int64"),
            }
        ),
    ]
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values(["part", "grp", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )


# Pile-style mixture weights for the sampling query — keys are the fixture
# `source` values; thresholds must match the SQL oracle's hex literals
MIXTURE_RATES = {"src0": 0.75, "src1": 0.25, "src2": 0.5}

# train/val/test ratios for the deterministic splitter — label order is
# threshold order; the oracle CASE is generated from the same dict
SPLIT_RATIOS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3/PaLM 13-gram method) — flag
    training docs sharing any 13-gram with a benchmark set. The benchmark
    here is a deterministic slice of the corpus itself (every 97th doc),
    so planted duplicates and self-hits make the flag non-trivial; the
    SQL oracle rebuilds the identical n-gram join."""
    from logparser_ray.stages.curation import decontaminate

    import pyarrow.parquet as pq

    bench = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # benchmark = docs with doc_id % 97 == 0 (deterministic, tiny)
    mask = pc.equal(
        pc.subtract(
            bench["doc_id"],
            pc.multiply(pc.divide(bench["doc_id"], 97), 97),
        ),
        0,
    )
    bench_texts = bench.filter(mask)["text"].to_pylist()

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return decontaminate(ds, bench_texts, n=13)


def q_media_features(sf_dir: str):
    """Real multimodal decode (pure-numpy PPM/WAV codecs) through the
    actor-pool featurizer stage — decoder='real', not the sha256 stub.

    Round 5: SQL-oracled via the golden-label technique (the transcripts
    pattern applied to binary media): the deterministic fixture parquet
    carries the GENERATOR'S width/height/sample_rate, while this query
    returns dimensions DECODED from the payload bytes (features[0:2] for
    images/video, features[1]·1e3 for audio) — hash equality proves the
    decode chain byte-for-byte. Features themselves stay pytest-pinned
    (floats are not SQL-re-derivable)."""
    from logparser_ray.stages.multimodal import featurize_media as _fm

    path = fixtures.ensure_media(n=64, seed=5)
    ds = ray.data.read_parquet(path).drop_columns(
        ["width", "height", "sample_rate"]  # golden labels stay oracle-side
    )
    feats = _fm(ds, decoder="real")

    def decoded_dims(b: pa.Table) -> pa.Table:
        f = np.stack(
            [np.asarray(x, dtype=np.float32) for x in b["features"].to_pylist()]
        )
        kinds = np.asarray(b["kind"].to_pylist(), dtype=object)
        audio = kinds == "audio"
        w = np.where(audio, -1, f[:, 0].astype(np.int64)).astype(np.int64)
        h = np.where(audio, -1, f[:, 1].astype(np.int64)).astype(np.int64)
        rate = np.where(
            audio, np.floor(f[:, 1] * 1e3 + 0.5).astype(np.int64), -1
        ).astype(np.int64)
        return pa.table(
            {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "width": pa.array(w),
                "height": pa.array(h),
                "sample_rate": pa.array(rate),
                "n_bytes": b["n_bytes"],
            }
        )

    return feats.map_batches(
        decoded_dims, batch_format="pyarrow", zero_copy_batch=True
    )


def _miner_union_query(fits: dict):
    """Tagged union of several miner banks over the transcripts fixture —
    one driver-audited entry covering each miner in ``fits`` (keeps every
    miner inside the driver's 50-entry audit cap; per-miner semantics are
    pinned by tests/test_miners.py and, for the four frequency miners, by
    the SQL-oracled ``docs_freq_templates`` union)."""

    def q(sf_dir: str):
        tdir, _ = fixtures.ensure_transcripts(min(_turns_for(sf_dir), 60_000))
        ds = ray.data.read_parquet(tdir)
        parts = []
        for name in sorted(fits):
            t = fits[name](ds).to_arrow().select(
                ["priority", "template_id", "template"]
            )
            parts.append(
                t.add_column(0, "miner", pa.array([name] * t.num_rows, pa.string()))
            )
        return pa.concat_tables(parts)

    return q


def _bank_out(bank) -> pa.Table:
    """Bank projection with SQL-reproducible columns/types (int64 priority)."""
    t = bank.to_arrow()
    return pa.table(
        {
            "priority": pc.cast(t["priority"], pa.int64()),
            "template_id": t["template_id"],
            "template": t["template"],
        }
    )


def q_docs_freq_templates(sf_dir: str):
    """The four frequency miners — SLCT (SURVEY.md A9), LFA (A5), Logram
    (A11) and LogCluster (A8) — over the ``documents`` view as ONE tagged
    union, every branch SQL-oracled: each is pure groupby-count + threshold
    + string reassembly, so DuckDB independently pins all four miners'
    (priority, template_id, template) semantics. Replaces the round-2
    ``docs_slct_templates``/``docs_lfa_templates`` pair and upgrades Logram
    and LogCluster from rows-only (``miners_freq``) to fully oracled."""
    from logparser_ray.stages.mine import (
        lfa_fit,
        logcluster_fit,
        logram_fit,
        slct_fit,
    )

    ds = _read(sf_dir, "documents", columns=["text"])
    n = ds.count()
    support = max(2, (n + 249) // 250)  # ceil(n/250), ≥2 — scales with sf
    fits = {
        "lfa": lambda: lfa_fit(ds),
        "logcluster": lambda: logcluster_fit(ds, support=support),
        "logram": lambda: logram_fit(ds, threshold=support),
        "slct": lambda: slct_fit(ds, support=support),
    }
    parts = []
    for name in sorted(fits):
        t = _bank_out(fits[name]())
        parts.append(
            t.add_column(0, "miner", pa.array([name] * t.num_rows, pa.string()))
        )
    return pa.concat_tables(parts)


def q_docs_struct_templates(sf_dir: str):
    """The two structural miners — AEL (SURVEY.md A3) and IPLoM (A2) —
    over ``documents``, SQL-oracled via their deterministic projections
    (VERDICT r03 #4, same upgrade path the frequency miners took in r3):

    - ``ael``: the categorize+abstract output — one row per
      ``(n_tokens, n_dyn)`` bin × dynamic-token skeleton with its support
      (``ael_abstract_counts``; the greedy order-dependent reconcile that
      consumes it stays pinned by pytest + the conformance harness).
    - ``iplom``: steps 1–2 (token count → distributed lowest-cardinality
      split-position choice, ties → lowest position) + the step-4 leaf
      templatize (position constant iff ONE distinct token in the
      partition), bijection deliberately off (``iplom_leaves``).

    Tagged union ``(miner, n_tokens, part, template, n)`` where ``part`` is
    the bin discriminator (AEL: n_dyn as text; IPLoM: the split token)."""
    from logparser_ray.stages.mine import ael_abstract_counts, iplom_leaves

    ds = _read(sf_dir, "documents", columns=["text"])
    a = ael_abstract_counts(ds)
    ael_t = pa.table(
        {
            "miner": pa.array(["ael"] * len(a), pa.string()),
            "n_tokens": pa.array(a["n_tokens"].to_numpy().astype(np.int64)),
            "part": pa.array(
                a["n_dyn"].to_numpy().astype(np.int64).astype(str), pa.string()
            ),
            "template": pa.array(a["skeleton"], pa.string()),
            "n": pa.array(a["n"].to_numpy().astype(np.int64)),
        }
    )
    l = iplom_leaves(ds)
    ip_t = pa.table(
        {
            "miner": pa.array(["iplom"] * len(l), pa.string()),
            "n_tokens": pa.array(l["n_tokens"].to_numpy().astype(np.int64)),
            "part": pa.array(l["skey"], pa.string()),
            "template": pa.array(l["template"], pa.string()),
            "n": pa.array(l["n"].to_numpy().astype(np.int64)),
        }
    )
    return pa.concat_tables([ael_t, ip_t])


def q_events_sketches_exact(sf_dir: str):
    """Streaming sketches (stages/sketch.py) driven into their EXACT regime
    so DuckDB can independently pin the merge algebra: SpaceSaving heavy
    hitters over ``event_type`` with cap = k·slack = 160 ≫ 5 distinct values
    (no batch ever evicts → total error bound 0 → count_min == count_max ==
    exact count), and KMV distinct count over ``user_id`` with k = 65536 ≫
    distinct users (``exact_below_k`` → estimate is the exact distinct
    count). At 100 TB the same operators run with small k and return
    bounded-error summaries (the approximation guarantees are pinned by
    tests/test_extras.py); this oracle pins the partial/merge plumbing.

    Also carries the binned-histogram quantiles of ``value`` (width 10):
    binned rank statistics are deterministic at ANY scale — no exact
    regime needed — so the p50/p95/p99 bins and their cumulative counts
    are pinned value-for-value against the SQL window-cumsum form."""
    from logparser_ray.stages.sketch import (
        approx_distinct,
        binned_quantiles,
        heavy_hitters,
    )

    ev = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])
    hh = heavy_hitters(ev, "event_type", k=20, slack=8)
    hh.insert(0, "part", "hh_event_type")
    d = approx_distinct(ev, "user_id", k=65536)
    assert d["exact_below_k"], "oracle requires the exact KMV regime"
    du = pd.DataFrame(
        {
            "part": ["distinct_users"],
            "v": [""],
            "is_null": [False],
            "count_min": [int(d["estimate"])],
            "count_max": [int(d["estimate"])],
        }
    )
    bq = binned_quantiles(ev, "value", width=10.0, qs=(0.5, 0.95, 0.99))
    qrows = pd.DataFrame(
        {
            "part": "q_value_bin",
            "v": bq["q"],
            "is_null": False,
            # tagged-union column reuse: count_min carries the quantile's
            # bin index, count_max the cumulative count through that bin
            "count_min": bq["bin"].astype("int64"),
            "count_max": bq["n_le"].astype("int64"),
        }
    )
    # round 4: per-group rank statistics (the per-tenant-percentile shape)
    # — same deterministic binned-histogram contract, partitioned by
    # event_type, so the oracle pins the grouped merge algebra too
    from logparser_ray.stages.sketch import binned_quantiles_by

    gq = binned_quantiles_by(
        ev, "value", by="event_type", width=10.0, qs=(0.5, 0.95, 0.99)
    )
    grows = pd.DataFrame(
        {
            "part": "q_value_by_type",
            "v": gq["grp"].astype(str) + ":" + gq["q"],
            "is_null": False,
            "count_min": gq["bin"].astype("int64"),
            "count_max": gq["n_le"].astype("int64"),
        }
    )
    return pd.concat([hh, du, qrows, grows], ignore_index=True)


def _fit_drain(ds):
    from logparser_ray.stages.mine import fit_bank

    return fit_bank(ds, "drain", params={"depth": 3, "st": 0.4})


def _fit_spell(ds):
    from logparser_ray.stages.mine import fit_bank

    return fit_bank(ds, "spell", params={"tau": 0.5})


def _fit_lenma(ds):
    from logparser_ray.stages.mine import fit_bank

    return fit_bank(ds, "lenma", params={"threshold": 0.99})


def _fit_slct(ds):
    from logparser_ray.stages.mine import slct_fit

    # support scales with corpus size (4% of rows — tuned on the fixture)
    return slct_fit(ds, support=max(10, int(0.04 * ds.count())))


def _fit_logram(ds):
    from logparser_ray.stages.mine import logram_fit

    return logram_fit(ds, threshold=max(10, int(0.04 * ds.count())))


def _fit_lfa(ds):
    from logparser_ray.stages.mine import lfa_fit

    return lfa_fit(ds)


def _fit_iplom(ds):
    from logparser_ray.stages.mine import iplom_fit

    return iplom_fit(ds)


def _fit_ael(ds):
    from logparser_ray.stages.mine import ael_fit

    return ael_fit(ds)


def _fit_shiso(ds):
    from logparser_ray.stages.mine import fit_bank

    return fit_bank(ds, "shiso", params={"max_children": 8, "merge_threshold": 0.15})


def _fit_logmine(ds):
    from logparser_ray.stages.mine import fit_bank

    return fit_bank(ds, "logmine", params={"max_dist": 0.3})


def _fit_logcluster(ds):
    from logparser_ray.stages.mine import logcluster_fit

    return logcluster_fit(ds, support=max(10, int(0.04 * ds.count())))


def _fit_logsig(ds):
    from logparser_ray.stages.mine import logsig_fit

    return logsig_fit(ds, k=14)


def _fit_lke(ds):
    from logparser_ray.stages.mine import lke_fit

    return lke_fit(ds, threshold=0.5)


def q_evaluator_fixture(sf_dir: str):
    truth, parsed, _ = fixtures.make_evaluator_fixture()
    res = evaluate_pandas(
        truth.to_pandas(), parsed.to_pandas(), key=["conv_id", "turn_idx"]
    )
    return res.to_table()


def q_evaluator_drain(sf_dir: str):
    """End-to-end A15: mine with Drain (scale mode), match the corpus, and
    evaluate grouping accuracy against the fixture's golden assignment via
    the distributed evaluator (Dataset.join + groupbys)."""
    from logparser_ray.core.evaluator import evaluate_datasets
    from logparser_ray.stages.mine import fit_bank
    from logparser_ray.stages.parse import match_stage

    n = min(_turns_for(sf_dir), 60_000)
    tdir, gpath = fixtures.ensure_transcripts(n, with_golden=True)
    ds = ray.data.read_parquet(tdir)
    bank = fit_bank(ds, "drain", params={"depth": 3, "st": 0.4})
    parsed = match_stage(ds, bank, with_params=False).select_columns(
        ["conv_id", "turn_idx", "template_id"]
    )
    truth = ray.data.read_parquet(
        gpath, columns=["conv_id", "turn_idx", "template_id"]
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["conv_id", "turn_idx", "event_id"])

    res = evaluate_datasets(
        truth.map_batches(rename, batch_format="pyarrow"),
        parsed.map_batches(rename, batch_format="pyarrow"),
        key=["conv_id", "turn_idx"],
    )
    return res.to_table()


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

QUERIES = {
    "events_by_type": q_events_by_type,
    "events_hourly": q_events_hourly,
    "events_json_k": q_events_json_k,
    "events_filter": q_events_filter,
    "events_sessionize": q_events_sessionize,
    "events_avg_gap": q_events_avg_gap,
    "purchase_asof_click": q_purchase_asof_click,
    "events_rolling_sum": q_events_rolling_sum,
    "events_value_bands": q_events_value_bands,
    "events_tumbling": q_events_tumbling,
    "events_hopping": q_events_hopping,
    "docs_regex_route": q_docs_regex_route,
    "docs_token_counts": q_docs_token_counts,
    "docs_word_freq_topk": q_docs_word_freq_topk,
    "docs_dedup_exact": q_docs_dedup_exact,
    "docs_lang_profile": q_docs_lang_profile,
    "top_sources": q_top_sources,
    "orders_customer_join": q_orders_customer_join,
    "customers_semi_anti": q_customers_semi_anti,
    "revenue_by_nation": q_revenue_by_nation,
    # grouped exact-distinct rides inside events_profile (part='distinct_users')
    "events_profile": q_events_profile,
    "tpch_group_aggs": q_tpch_group_aggs,
    "docs_corpus_prep": q_docs_corpus_prep,
    "top_orders_per_segment": q_top_orders_per_segment,
    "lineitem_pricing": q_lineitem_pricing,
    "suppliers_star": q_suppliers_star,
    "events_lag_lead": q_events_lag_lead,
    "events_union_extremes": q_events_union_extremes,
    "embeddings_knn": q_embeddings_knn,
    "embeddings_near_dupes": q_embeddings_near_dupes,
    "docs_freq_templates": q_docs_freq_templates,
    "events_sketches_exact": q_events_sketches_exact,
    "docs_sampling": q_docs_sampling,
    "docs_curation": q_docs_curation,
    "docs_tfidf_topk": q_docs_tfidf_topk,
    "docs_decontaminate": q_docs_decontaminate,
    # miner fits over the transcripts fixture, consolidated into 4 tagged
    # unions so all 13 miners run under the driver's 50-entry audit cap
    # (rows-only: order-dependent/iterative, not SQL-expressible over views)
    "miners_online": _miner_union_query(
        {
            "drain": _fit_drain,
            "spell": _fit_spell,
            "lenma": _fit_lenma,
            "shiso": _fit_shiso,
            "logmine": _fit_logmine,
        }
    ),
    # the four frequency fits folded in here (VERDICT r03 #4: their
    # transcripts-side slot "miners_freq" was freed for the SQL-oracled
    # docs_struct_templates; their semantics stay driver-run here and
    # oracle-pinned over documents in docs_freq_templates)
    "miners_grouped": _miner_union_query(
        {
            "iplom": _fit_iplom,
            "ael": _fit_ael,
            "slct": _fit_slct,
            "logram": _fit_logram,
            "lfa": _fit_lfa,
            "logcluster": _fit_logcluster,
        }
    ),
    # AEL abstract bins + IPLoM steps-1-2 leaf templatize, both hash-pinned
    # by DuckDB (VERDICT r03 #4) — the structural miners' deterministic
    # projections, upgrading A2/A3 from rows-only to oracle-green
    "docs_struct_templates": q_docs_struct_templates,
    "miners_sampled": _miner_union_query({"logsig": _fit_logsig, "lke": _fit_lke}),
    # rows-only (non-SQL-expressible)
    "transcripts_sink_counts": q_transcripts_sink_counts,
    # templates CSV aggregate + O1 per-conv text-hash conformance, unioned
    # (audit-cap discipline — freed the slot transcripts_conv_stats holds)
    "transcripts_templates": q_transcripts_templates,
    "transcripts_structured": q_transcripts_structured,
    "transcripts_conv_stats": q_transcripts_conv_stats,
    # round 5: oracled via read_text() + the header DSL's own regex
    "rawlog_structured": q_rawlog_structured,
    # MinHash pairs + SimHash pairs + simhash clusters, consolidated
    # (audit-cap discipline — freed the slots docs_curation and
    # docs_tfidf_topk now hold)
    "docs_near_dup_audit": q_docs_near_dup_audit,
    # round 5: langid confusion alone, SQL-oracled via the generated
    # argmax CASE (fingerprint/xent audits moved into docs_near_dup_audit)
    "docs_textstats_extras": q_docs_textstats_extras,
    # the three approximate-ANN paths consolidated into one tagged union
    # (audit-cap discipline; pytest pins their exactness properties)
    "embeddings_ann_approx": q_embeddings_ann_approx,
    # round 5: oracled via the golden-label fixture parquet (decode vs
    # the generator's width/height/sample_rate labels)
    "media_features": q_media_features,
    "evaluator_drain": q_evaluator_drain,
    # evaluator_fixture is pytest-owned (tests/test_extras.py) — not
    # registered, to stay under the driver's 50-entry audit cap
}

assert len(QUERIES) <= 50, "driver audits only the first 50 registry entries"

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

def _split_oracle_case(digest_expr: str) -> str:
    """CASE expression replicating ``split_by_hash(ratios=SPLIT_RATIOS)``:
    cumulative thresholds accumulate in the SAME float order as the engine
    (label order, not re-derived literals), so both sides floor identical
    hex boundaries by construction."""
    labels = list(SPLIT_RATIOS)
    cum = 0.0
    arms = []
    for lbl in labels[:-1]:
        cum += SPLIT_RATIOS[lbl]
        thr = format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x")
        arms.append(f"WHEN substr({digest_expr}, 1, 8) < '{thr}' THEN '{lbl}'")
    return "CASE " + " ".join(arms) + f" ELSE '{labels[-1]}' END"


ORACLE = {
    # part='by_type': grouped counts; part='retention': the weekly
    # cohort-retention triangle (distinct users per cohort-week × offset)
    "events_by_type": (
        "WITH c AS (SELECT user_id, min(date_trunc('week', ts)) AS w0 "
        "FROM events GROUP BY 1), "
        "a AS (SELECT DISTINCT e.user_id, c.w0, "
        "CAST((epoch(date_trunc('week', e.ts)) - epoch(c.w0)) // (7 * 86400) "
        "AS BIGINT) AS off FROM events e JOIN c USING (user_id)) "
        "SELECT 'by_type' AS part, event_type AS grp, count(*) AS n "
        "FROM events GROUP BY 2 "
        "UNION ALL "
        "SELECT 'retention', strftime(w0, '%Y-%m-%d') || ':' || off::VARCHAR, "
        "count(*)::BIGINT FROM a GROUP BY 2"
    ),
    # part='hourly': grouped hourly counts; part='align_month': FULL OUTER
    # month alignment of event vs order counts (-1 = side absent)
    "events_hourly": (
        "SELECT 'hourly' AS part, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS grp, "
        "event_type AS sub, count(*) AS n, CAST(-1 AS BIGINT) AS n2 "
        "FROM events GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'align_month' AS part, month AS grp, '' AS sub, "
        "coalesce(e.n, -1) AS n, coalesce(o.n, -1) AS n2 FROM "
        "(SELECT strftime(ts, '%Y-%m') AS month, count(*)::BIGINT AS n "
        "FROM events GROUP BY 1) e "
        "FULL OUTER JOIN "
        "(SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*)::BIGINT AS n "
        "FROM orders GROUP BY 1) o USING (month)"
    ),
    "events_json_k": (
        "SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) // 10 AS k_bucket, "
        "count(*) AS n, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
        "FROM events GROUP BY 1"
    ),
    "events_filter": (
        "SELECT event_id, event_type, value FROM events "
        "WHERE event_type = 'error' AND value > 100"
    ),
    "events_sessionize": (
        "SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions FROM ("
        "  SELECT user_id, CASE WHEN prev_ts IS NULL OR "
        "    epoch(ts - prev_ts) > 1800 THEN 1 ELSE 0 END AS is_new FROM ("
        "    SELECT user_id, ts, lag(ts) OVER "
        "      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)) "
        "GROUP BY user_id"
    ),
    "events_avg_gap": (
        "SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps, "
        "CAST(COALESCE(sum(CAST(floor(gap) AS BIGINT)), 0) AS BIGINT) AS sum_gap_s FROM ("
        "  SELECT user_id, epoch(ts - lag(ts) OVER "
        "    (PARTITION BY user_id ORDER BY ts, event_id)) AS gap FROM events) "
        "GROUP BY user_id"
    ),
    "events_value_bands": (
        "SELECT b.band, count(*) AS n FROM events e JOIN (VALUES "
        "('low', 0.0, 100.0), ('mid', 100.0, 300.0), ('high', 300.0, 1e12)"
        ") AS b(band, lo, hi) ON e.value >= b.lo AND e.value < b.hi "
        "GROUP BY b.band"
    ),
    "events_rolling_sum": (
        "SELECT event_id, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_cents "
        "FROM events"
    ),
    "purchase_asof_click": (
        "SELECT purchase_id, click_id, gap_s FROM ("
        "  SELECT event_id AS purchase_id, event_type, "
        "  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) "
        "    OVER w AS click_id, "
        "  CAST(floor(epoch(ts - last_value(CASE WHEN event_type = 'click' THEN ts END "
        "    IGNORE NULLS) OVER w)) AS BIGINT) AS gap_s "
        "  FROM events "
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ") WHERE event_type = 'purchase' AND click_id IS NOT NULL"
    ),
    "events_tumbling": (
        "SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS win_start, "
        "event_type, count(*) AS n, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
        "FROM events GROUP BY 1, 2"
    ),
    "events_hopping": (
        "SELECT win_start, event_type, count(*) AS n, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
        "FROM ("
        "  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS win_start, "
        "    event_type, value FROM events "
        "  UNION ALL "
        "  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - 300 AS win_start, "
        "    event_type, value FROM events"
        ") GROUP BY 1, 2"
    ),
    "docs_regex_route": (
        "SELECT CASE "
        "WHEN regexp_matches(text, '^the ') THEN 'r_the' "
        "WHEN regexp_matches(text, ' join ') THEN 'r_join' "
        "WHEN regexp_matches(text, ' spark ') THEN 'r_spark' "
        "ELSE '_fallthrough' END AS route, count(*) AS n "
        "FROM documents GROUP BY route"
    ),
    # seq_id = greedy document-boundary sequence packing: the bin the
    # exclusive prefix token count falls in (budget 1024)
    "docs_token_counts": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) "
        "AS BIGINT) AS n_tok_bpe, "
        # CAST the windowed sum: DuckDB sum() OVER returns HUGEINT, which
        # pandas renders as float64 and breaks the driver's exact value-hash
        "CAST(coalesce(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "// 1024 AS BIGINT) AS seq_id FROM documents"
    ),
    # part='unigram': SLCT-style token frequency; part='bigram': the
    # doc-boundary-respecting bigram top-k (ngram_freq_topk, n=2)
    "docs_word_freq_topk": (
        "SELECT 'unigram' AS part, tok, n FROM "
        "(SELECT tok, count(*) AS n FROM "
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
        "GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20) "
        "UNION ALL "
        "SELECT 'bigram' AS part, tok, n FROM "
        "(SELECT bg AS tok, count(*)::BIGINT AS n FROM "
        "(SELECT t.toks[i] || ' ' || t.toks[i + 1] AS bg "
        "FROM (SELECT string_split(text, ' ') AS toks FROM documents) t, "
        "unnest(range(1, len(t.toks))) AS r(i)) "
        "GROUP BY 1 ORDER BY n DESC, tok ASC LIMIT 20)"
    ),
    # part='doc': exact representatives; part='span': C4-style 10-token
    # span dedup re-derived via row_number over chunk occurrences +
    # string_agg reassembly — md5(text) pins the rebuilt text exactly
    "docs_dedup_exact": (
        "WITH reps AS (SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n "
        "  FROM documents GROUP BY text), "
        "toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), "
        "chunks AS (SELECT doc_id, i AS cidx, "
        "  array_to_string(tk[(i * 10 + 1):(i * 10 + 10)], ' ') AS chunk, "
        "  CAST(ceil(len(tk) / 10.0) AS BIGINT) AS n_total "
        "  FROM toks, unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) "
        "  AS r(i)), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY chunk "
        "  ORDER BY doc_id, cidx) AS rn FROM chunks), "
        "spans AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS txt, "
        "  count(*)::BIGINT AS n_kept, max(n_total) - count(*)::BIGINT "
        "  AS n_dropped FROM ranked WHERE rn = 1 GROUP BY doc_id) "
        "SELECT 'doc' AS part, doc_id, n AS a, CAST(0 AS BIGINT) AS b, "
        "  '' AS h FROM reps "
        "UNION ALL "
        "SELECT 'span', doc_id, n_kept, n_dropped, md5(txt) FROM spans"
    ),
    # the md5 hex digest is the shared deterministic ordering key: DuckDB's
    # md5(text) emits the identical lowercase hex the Ray operator computes
    # with hashlib, so both engines draw the SAME 20 docs per language
    # two deterministic samplers, one union: the md5 hex digest is the
    # shared "random" order/threshold both engines reproduce bit-for-bit
    # (hex-string comparison ≡ 32-bit numeric comparison); the mixture
    # CASE thresholds are format(int(rate·2³²), '08x') of MIXTURE_RATES
    "docs_sampling": (
        "SELECT 'stratified' AS part, lang AS grp, doc_id FROM ("
        "SELECT lang, doc_id, row_number() OVER ("
        "PARTITION BY lang ORDER BY md5(text) ASC, doc_id ASC) AS rn "
        "FROM documents) WHERE rn <= 20 "
        "UNION ALL "
        "SELECT 'mixture' AS part, source AS grp, doc_id FROM documents "
        "WHERE substr(md5(text), 1, 8) < (CASE source "
        + " ".join(
            f"WHEN '{g}' THEN '{format(min(int(r * (1 << 32)), (1 << 32) - 1), '08x')}'"
            for g, r in sorted(MIXTURE_RATES.items())
        )
        + " ELSE '0ccccccc' END) "
        "UNION ALL "
        "SELECT 'split' AS part, ("
        # generated from SPLIT_RATIOS with the SAME float accumulation
        # split_by_hash uses (editing the dict keeps both sides in step —
        # review r4: hand-written 0.8/0.9 literals only matched by luck)
        + _split_oracle_case("md5(text || 'r4')")
        + ") AS grp, doc_id FROM documents"
    ),
    # curation gate + PII redaction: the synthetic PII suffix is built
    # identically on both sides; redacted_md5 pins the exact RE2 rewrite
    # chain (Arrow and DuckDB both run RE2), and the keep gate uses integer
    # cross-multiplications so no float ratio can diverge
    "docs_curation": (
        "WITH aug AS (SELECT doc_id, text || ' contact u' || doc_id || "
        "'@example.com ip 10.0.' || (doc_id % 200) || '.7 acct 9' || doc_id "
        "|| '00000001' AS text FROM documents), "
        "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM aug), "
        "wf AS (SELECT doc_id, tok, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2), "
        "words AS (SELECT doc_id, max(n) AS max_word_n, count(*)::BIGINT AS n_distinct, "
        "sum(n)::BIGINT AS n_words, "
        f"sum(CASE WHEN tok IN ({_STOPLIST_SQL}) THEN n ELSE 0 END)::BIGINT AS n_stop "
        "FROM wf GROUP BY 1), "
        "bi AS (SELECT t.doc_id, t.toks[i] || ' ' || t.toks[i + 1] AS bg "
        "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM aug) t, "
        "unnest(range(1, len(t.toks))) AS r(i)), "
        "bf AS (SELECT doc_id, bg, count(*)::BIGINT AS n FROM bi GROUP BY 1, 2), "
        "bmax AS (SELECT doc_id, max(n) AS top_bigram_n FROM bf GROUP BY 1), "
        "pii AS (SELECT doc_id, "
        "length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::BIGINT AS n_symbol, "
        "len(regexp_extract_all(text, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email, "
        "regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
        "'<EMAIL>', 'g') AS red1 FROM aug), "
        "pii2 AS (SELECT doc_id, n_symbol, n_email, "
        "len(regexp_extract_all(red1, "
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4, "
        "regexp_replace(red1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
        "'<IP>', 'g') AS red2 FROM pii), "
        "pii3 AS (SELECT doc_id, n_symbol, n_email, n_ipv4, "
        "len(regexp_extract_all(red2, '\\b\\d{9,}\\b'))::BIGINT AS n_idnum, "
        "md5(regexp_replace(red2, '\\b\\d{9,}\\b', '<ID>', 'g')) AS redacted_md5 "
        "FROM pii2) "
        "SELECT w.doc_id, w.n_words, w.n_distinct, w.max_word_n, "
        "coalesce(b.top_bigram_n, 0) AS top_bigram_n, w.n_stop, p.n_symbol, "
        "CASE WHEN w.n_words >= 10 AND w.n_words <= 100000 "
        "AND w.max_word_n * 8 <= w.n_words "
        "AND coalesce(b.top_bigram_n, 0) * 16 <= w.n_words "
        "THEN 1 ELSE 0 END::BIGINT AS keep, "
        "p.n_email, p.n_ipv4, p.n_idnum, p.redacted_md5 "
        "FROM words w LEFT JOIN bmax b USING (doc_id) JOIN pii3 p USING (doc_id)"
    ),
    # integer basis-point scores (floor(tf·ln(N/df)·1e4 + 0.5)) make the
    # per-doc ranking engine-exact; ties break on term ascending
    "docs_tfidf_topk": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        "tf AS (SELECT doc_id, tok AS term, count(*)::BIGINT AS tf FROM toks "
        "GROUP BY 1, 2), "
        "df AS (SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM toks GROUP BY 1), "
        "n AS (SELECT count(*)::DOUBLE AS n FROM documents), "
        "scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, "
        "CAST(floor(tf.tf * ln(n.n / df.df) * 10000 + 0.5) AS BIGINT) AS score_bp "
        "FROM tf JOIN df USING (term) CROSS JOIN n WHERE tf.doc_id < 30), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_bp DESC, term ASC) AS rnk FROM scored) "
        "SELECT doc_id, term, tf, df, score_bp, rnk FROM ranked WHERE rnk <= 3"
    ),
    # avg_stop_ratio via EXACT integer algebra on both sides (ADVICE r03:
    # float ratio sums across unordered distributed partials were fragile
    # at the 3-decimal rounding boundary): per-doc half-up basis points
    # (n_stop*20000 + denom) // (2*denom), int64 sum, half-up milli-units,
    # ONE exact float division by 1000
    "docs_lang_profile": (
        "WITH d AS (SELECT lang, n_chars, "
        "CAST(len(list_filter(string_split(text, ' '), "
        f"x -> x IN ({_STOPLIST_SQL}))) AS BIGINT) AS n_stop, "
        "CAST(greatest(len(string_split(text, ' ')), 1) AS BIGINT) AS denom "
        "FROM documents) "
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
        "max(n_chars) AS max_chars, "
        "CAST((2 * sum((n_stop * 20000 + denom) // (2 * denom)) + 10 * count(*)) "
        "// (20 * count(*)) AS BIGINT) / 1000.0 AS avg_stop_ratio "
        "FROM d GROUP BY lang"
    ),
    # 13-gram decontamination: benchmark = every 97th doc; DuckDB list
    # slicing is 1-based inclusive, so toks[i:i+12] is a 13-gram
    "docs_decontaminate": (
        "WITH bench AS (SELECT text FROM documents WHERE doc_id % 97 = 0), "
        "bgrams AS (SELECT DISTINCT array_to_string(t.toks[i:i+12], ' ') AS g "
        "FROM (SELECT string_split(text, ' ') AS toks FROM bench) t, "
        "unnest(range(1, len(t.toks) - 11)) AS r(i)), "
        "dgrams AS (SELECT doc_id, array_to_string(t.toks[i:i+12], ' ') AS g "
        "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t, "
        "unnest(range(1, len(t.toks) - 11)) AS r(i)), "
        "hits AS (SELECT d.doc_id, count(*)::BIGINT AS n_hits FROM dgrams d "
        "JOIN bgrams b USING (g) GROUP BY 1) "
        "SELECT doc.doc_id, coalesce(h.n_hits, 0) AS n_hits, "
        "(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END)::BIGINT "
        "AS contaminated FROM documents doc LEFT JOIN hits h USING (doc_id)"
    ),
    "top_sources": (
        "SELECT source, count(*) AS n FROM documents GROUP BY source "
        "ORDER BY n DESC, source ASC LIMIT 10"
    ),
    "orders_customer_join": (
        "SELECT c.c_mktsegment, count(*) AS n_orders, "
        "CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
    "customers_semi_anti": (
        "SELECT c_mktsegment, "
        "CAST(sum(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_with, "
        "CAST(sum(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) "
        "THEN 0 ELSE 1 END) AS BIGINT) AS n_without "
        "FROM customer GROUP BY c_mktsegment"
    ),
    "revenue_by_nation": (
        "SELECT n.n_name, "
        "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents, count(*) AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
    # table profiler: per-column stats re-derived column by column (the
    # min/max renderings are CAST-to-VARCHAR for ints, epoch_us for
    # timestamps, identity for strings — float min/max absent by design),
    # plus the grouped exact-distinct rows the former events_distinct_users
    # entry carried. Built by _profile_oracle_sql() below the dict.
    "events_profile": None,  # filled in right after the dict literal
    "tpch_group_aggs": (
        "SELECT 'orders_monthly' AS part, strftime(o_orderdate, '%Y-%m') AS grp, "
        "count(*) AS n, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents "
        "FROM orders GROUP BY 1, 2 "
        "UNION ALL "
        "SELECT 'parts_by_type' AS part, regexp_extract(p_type, '^(\\S+)', 1) AS grp, "
        "count(*) AS n, "
        "CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents "
        "FROM part GROUP BY 1, 2 "
        "UNION ALL "
        "SELECT 'rollup' AS part, "
        "coalesce(y, '*') || ':' || coalesce(m, '*') AS grp, "
        "count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents "
        "FROM (SELECT strftime(o_orderdate, '%Y') AS y, "
        "strftime(o_orderdate, '%m') AS m, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders) "
        "GROUP BY ROLLUP(y, m) "
        "UNION ALL "
        "SELECT 'cube' AS part, "
        "coalesce(y, '*') || ':' || coalesce(m, '*') AS grp, "
        "count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents "
        "FROM (SELECT strftime(o_orderdate, '%Y') AS y, "
        "strftime(o_orderdate, '%m') AS m, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders) "
        "GROUP BY CUBE(y, m)"
    ),
    # the composed prep pipeline, end to end: gate → (identity) redact →
    # mixture → dedup-first-per-text → pack. Thresholds are the hex of
    # PREP_RATES / default 0.7; packing budget 1024
    "docs_corpus_prep": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        "wf AS (SELECT doc_id, tok, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2), "
        "words AS (SELECT doc_id, sum(n)::BIGINT AS n_words, max(n) AS max_word_n "
        "FROM wf GROUP BY 1), "
        "bi AS (SELECT t.doc_id, t.toks[i] || ' ' || t.toks[i + 1] AS bg "
        "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t, "
        "unnest(range(1, len(t.toks))) AS r(i)), "
        "bmax AS (SELECT doc_id, max(n) AS top_bigram_n FROM "
        "(SELECT doc_id, bg, count(*)::BIGINT AS n FROM bi GROUP BY 1, 2) GROUP BY 1), "
        "kept AS (SELECT d.doc_id, d.text, d.source FROM documents d "
        "JOIN words w USING (doc_id) LEFT JOIN bmax b USING (doc_id) "
        "WHERE w.n_words >= 10 AND w.n_words <= 100000 "
        "AND w.max_word_n * 8 <= w.n_words "
        "AND coalesce(b.top_bigram_n, 0) * 16 <= w.n_words), "
        "mixed AS (SELECT * FROM kept WHERE substr(md5(text), 1, 8) < "
        "(CASE source "
        + " ".join(
            f"WHEN '{g}' THEN '{format(min(int(r * (1 << 32)), (1 << 32) - 1), '08x')}'"
            for g, r in sorted(PREP_RATES.items())
        )
        + f" ELSE '{format(int(0.7 * (1 << 32)), '08x')}' END)), "
        "dedup AS (SELECT doc_id, text FROM (SELECT doc_id, text, "
        "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM mixed) "
        "WHERE rn = 1), "
        "counted AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok "
        "FROM dedup) "
        # CAST: DuckDB windowed sum() yields HUGEINT → pandas float64,
        # which would break the driver's exact value-hash vs our int64
        "SELECT doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1024 AS BIGINT) "
        "AS seq_id FROM counted"
    ),
    "top_orders_per_segment": (
        "SELECT c_mktsegment, o_orderkey, price_cents FROM ("
        "  SELECT c.c_mktsegment, o.o_orderkey, "
        "  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, "
        "  row_number() OVER (PARTITION BY c.c_mktsegment "
        "    ORDER BY floor(o.o_totalprice * 100 + 0.5) DESC, o.o_orderkey ASC) AS rn "
        "  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) "
        "WHERE rn <= 3"
    ),
    # corr_qp_e6: Pearson corr(quantity, price-cents) from exact HUGEINT
    # moments — the DOUBLE formula runs on identical exact integers on both
    # sides, so floor(·1e6 + 0.5) is bit-deterministic
    "lineitem_pricing": (
        "WITH m AS (SELECT l_returnflag, l_linestatus, "
        "count(*)::HUGEINT AS n, "
        "sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::HUGEINT AS sx, "
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::HUGEINT AS sy, "
        "sum(CAST(floor(l_quantity + 0.5) AS BIGINT)::HUGEINT "
        "    * CAST(floor(l_quantity + 0.5) AS BIGINT)::HUGEINT) AS sxx, "
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)::HUGEINT "
        "    * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)::HUGEINT) AS syy, "
        "sum(CAST(floor(l_quantity + 0.5) AS BIGINT)::HUGEINT "
        "    * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)::HUGEINT) AS sxy "
        "FROM lineitem GROUP BY 1, 2) "
        "SELECT b.l_returnflag, b.l_linestatus, b.sum_qty, b.revenue_cents, b.n, "
        "CASE WHEN m.n * m.sxx - m.sx * m.sx <= 0 "
        "OR m.n * m.syy - m.sy * m.sy <= 0 THEN -2000000 "
        "ELSE CAST(floor(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) "
        "/ sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) "
        "* CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) "
        "END AS corr_qp_e6 "
        "FROM (SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents, count(*) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus) b "
        "JOIN m USING (l_returnflag, l_linestatus)"
    ),
    "suppliers_star": (
        "SELECT r.r_name, n.n_name, count(*) AS n_suppliers FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name, n.n_name"
    ),
    # per-user-first/last have no lag/lead: encoded -1 on both sides so
    # the value comparison stays integer-exact (no nullable-int coercion)
    "events_lag_lead": (
        "SELECT event_id, user_id, "
        "coalesce(lag(event_id) OVER w, -1) AS prev_id, "
        "coalesce(lead(event_id) OVER w, -1) AS next_id "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    # part='extremes': union counts; part='funnel': the ordered-cascade
    # conversion funnel (each stage strictly after the previous stage's
    # per-user qualifying min-ts — the same k-pass chain the engine runs)
    "events_union_extremes": (
        "WITH s0 AS (SELECT user_id, min(ts) AS t FROM events "
        "WHERE event_type = 'view' GROUP BY 1), "
        "s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN s0 USING (user_id) "
        "WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN s1 USING (user_id) "
        "WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1) "
        "SELECT 'extremes' AS part, event_type AS grp, count(*) AS n FROM ("
        "  SELECT event_type, value FROM events WHERE event_type = 'error' "
        "  UNION ALL SELECT event_type, value FROM events WHERE value > 400) "
        "GROUP BY 2 "
        "UNION ALL SELECT 'funnel', '0:view', count(*) FROM s0 "
        "UNION ALL SELECT 'funnel', '1:click', count(*) FROM s1 "
        "UNION ALL SELECT 'funnel', '2:purchase', count(*) FROM s2 "
        "UNION ALL SELECT 'funnel_dt', '1:click', "
        "coalesce(CAST(sum(epoch_us(s1.t) - epoch_us(s0.t)) AS BIGINT), 0) "
        "FROM s1 JOIN s0 USING (user_id) "
        "UNION ALL SELECT 'funnel_dt', '2:purchase', "
        "coalesce(CAST(sum(epoch_us(s2.t) - epoch_us(s1.t)) AS BIGINT), 0) "
        "FROM s2 JOIN s1 USING (user_id)"
    ),
    "embeddings_knn": (
        "SELECT e.vec_id, CAST(floor(list_cosine_similarity("
        "CAST(e.embedding AS DOUBLE[]), "
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
        ") * 10000 + 0.5) AS BIGINT) AS cos_bp "
        "FROM embeddings e ORDER BY cos_bp DESC, e.vec_id ASC LIMIT 5"
    ),
    # the structural miners' deterministic projections (VERDICT r03 #4):
    # AEL categorize+abstract (dynamic = token matching [0-9=] → '<*>',
    # bin = (n_tokens, n_dyn)), and IPLoM steps 1-2 + leaf templatize
    # (split position = fewest distinct tokens among >1-cardinality
    # positions, ties → lowest pos; leaf template keeps a position's token
    # iff it is the partition's ONLY distinct value there)
    "docs_struct_templates": (
        "WITH tok AS (SELECT string_split(text, ' ') AS toks FROM documents), "
        "ael AS (SELECT 'ael' AS miner, CAST(len(toks) AS BIGINT) AS n_tokens, "
        "  CAST(CAST(len(list_filter(toks, x -> regexp_matches(x, '[0-9=]'))) "
        "    AS BIGINT) AS VARCHAR) AS part, "
        "  array_to_string(list_transform(toks, x -> CASE WHEN "
        "    regexp_matches(x, '[0-9=]') THEN '<*>' ELSE x END), ' ') AS template, "
        "  count(*)::BIGINT AS n FROM tok GROUP BY 2, 3, 4), "
        "ex AS (SELECT len(toks) AS ntok, i - 1 AS pos, toks[i] AS tok "
        "  FROM tok, unnest(range(1, len(toks) + 1)) AS r(i)), "
        "cards AS (SELECT ntok, pos, count(DISTINCT tok) AS card "
        "  FROM ex GROUP BY 1, 2), "
        "split AS (SELECT ntok, pos AS spos FROM ("
        "  SELECT ntok, pos, row_number() OVER (PARTITION BY ntok "
        "    ORDER BY card, pos) AS rn FROM cards WHERE card > 1) WHERE rn = 1), "
        "keyed AS (SELECT t.toks, len(t.toks) AS ntok, "
        "  CASE WHEN s.spos IS NULL THEN '' "
        "    ELSE t.toks[CAST(s.spos AS BIGINT) + 1] END AS skey "
        "  FROM tok t LEFT JOIN split s ON len(t.toks) = s.ntok), "
        "ex2 AS (SELECT ntok, skey, i - 1 AS pos, toks[i] AS tok "
        "  FROM keyed, unnest(range(1, len(toks) + 1)) AS r(i)), "
        "leafpos AS (SELECT ntok, skey, pos, CASE WHEN count(DISTINCT tok) = 1 "
        "  THEN min(tok) ELSE '<*>' END AS ptok FROM ex2 GROUP BY 1, 2, 3), "
        "leaftpl AS (SELECT ntok, skey, string_agg(ptok, ' ' ORDER BY pos) "
        "  AS template FROM leafpos GROUP BY 1, 2), "
        "leafn AS (SELECT ntok, skey, count(*)::BIGINT AS n "
        "  FROM keyed GROUP BY 1, 2), "
        "ipl AS (SELECT 'iplom' AS miner, CAST(ntok AS BIGINT) AS n_tokens, "
        "  skey AS part, template, n FROM leaftpl JOIN leafn USING (ntok, skey)) "
        "SELECT * FROM ael UNION ALL SELECT * FROM ipl"
    ),
    "docs_freq_templates": (
        # one UNION ALL over four independent re-derivations: SLCT
        # ((n_tokens, pos, word) support keys), LFA ((n_tokens, pos, word)
        # frequencies cut at the sharpest relative drop in each row's sorted
        # profile, ≥2× ratio + ≤half-params guards — stages/mine.py:lfa_fit),
        # LogCluster (position-independent frequent words, both
        # thresholds), Logram (bigram dictionary with '^' row-start anchor)
        "WITH docs AS (SELECT row_number() OVER () AS rid, "
        "  string_split(text, ' ') AS toks FROM documents), "
        "sup AS (SELECT greatest(2, CAST((count(*) + 249) // 250 AS BIGINT)) AS s "
        "  FROM documents), "
        "flat AS (SELECT rid, len(toks) AS ntok, unnest(toks) AS tok, "
        "  generate_subscripts(toks, 1) AS pos FROM docs), "
        "slct_freq AS (SELECT ntok, pos, tok FROM flat GROUP BY ntok, pos, tok "
        "  HAVING count(*) >= (SELECT s FROM sup)), "
        "slct_tmpl AS (SELECT flat.rid, string_agg(CASE WHEN f.tok IS NOT NULL "
        "  THEN flat.tok ELSE '<*>' END, ' ' ORDER BY flat.pos) AS template "
        "  FROM flat LEFT JOIN slct_freq f ON flat.ntok = f.ntok "
        "  AND flat.pos = f.pos AND flat.tok = f.tok GROUP BY flat.rid), "
        "slct_banks AS (SELECT template, count(*) AS n FROM slct_tmpl "
        "  GROUP BY template HAVING count(*) >= (SELECT s FROM sup)), "
        "lfa_freq AS (SELECT ntok, pos, tok, count(*) AS n FROM flat "
        "  GROUP BY ntok, pos, tok), "
        "lfa_j AS (SELECT flat.rid, flat.ntok, flat.pos, flat.tok, f.n "
        "  FROM flat JOIN lfa_freq f ON flat.ntok = f.ntok "
        "  AND flat.pos = f.pos AND flat.tok = f.tok), "
        "lfa_r AS (SELECT rid, n, lag(n) OVER "
        "  (PARTITION BY rid ORDER BY n, pos) AS prev_n FROM lfa_j), "
        "lfa_best AS (SELECT rid, max(n * 1.0 / prev_n) AS best FROM lfa_r "
        "  WHERE prev_n IS NOT NULL GROUP BY rid), "
        "lfa_split AS (SELECT r.rid, min(r.prev_n) AS split FROM lfa_r r "
        "  JOIN lfa_best b ON r.rid = b.rid "
        "  AND r.n * 1.0 / r.prev_n = b.best GROUP BY r.rid), "
        "lfa_gate AS (SELECT j.rid, "
        "  (b.best >= 2.0 AND 2 * count(*) FILTER (WHERE j.n <= s.split) "
        "   <= max(j.ntok)) AS gate, s.split FROM lfa_j j "
        "  JOIN lfa_best b ON j.rid = b.rid "
        "  JOIN lfa_split s ON j.rid = s.rid GROUP BY j.rid, b.best, s.split), "
        "lfa_tmpl AS (SELECT j.rid, string_agg(CASE WHEN g.gate AND "
        "  j.n <= g.split THEN '<*>' ELSE j.tok END, ' ' ORDER BY j.pos) "
        "  AS template FROM lfa_j j LEFT JOIN lfa_gate g ON j.rid = g.rid "
        "  GROUP BY j.rid), "
        "lfa_banks AS (SELECT template, count(*) AS n FROM lfa_tmpl "
        "  GROUP BY template), "
        "lc_freq AS (SELECT tok FROM flat GROUP BY tok "
        "  HAVING count(*) >= (SELECT s FROM sup)), "
        "lc_tmpl AS (SELECT flat.rid, string_agg(CASE WHEN f.tok IS NOT NULL "
        "  THEN flat.tok ELSE '<*>' END, ' ' ORDER BY flat.pos) AS template "
        "  FROM flat LEFT JOIN lc_freq f ON flat.tok = f.tok GROUP BY flat.rid), "
        "lc_banks AS (SELECT template, count(*) AS n FROM lc_tmpl "
        "  GROUP BY template HAVING count(*) >= (SELECT s FROM sup)), "
        "lgm_bi AS (SELECT rid, pos, tok, coalesce(lag(tok) OVER "
        "  (PARTITION BY rid ORDER BY pos), '^') AS prev FROM flat), "
        "lgm_freq AS (SELECT prev, tok FROM lgm_bi GROUP BY prev, tok "
        "  HAVING count(*) >= (SELECT s FROM sup)), "
        "lgm_tmpl AS (SELECT b.rid, string_agg(CASE WHEN f.tok IS NOT NULL "
        "  THEN b.tok ELSE '<*>' END, ' ' ORDER BY b.pos) AS template "
        "  FROM lgm_bi b LEFT JOIN lgm_freq f ON b.prev = f.prev "
        "  AND b.tok = f.tok GROUP BY b.rid), "
        "lgm_banks AS (SELECT template, count(*) AS n FROM lgm_tmpl "
        "  GROUP BY template) "
        "SELECT 'lfa' AS miner, CAST(row_number() OVER "
        "  (ORDER BY n DESC, template ASC) - 1 AS BIGINT) AS priority, "
        "  substring(md5(template), 1, 8) AS template_id, template "
        "  FROM lfa_banks "
        "UNION ALL SELECT 'logcluster', CAST(row_number() OVER "
        "  (ORDER BY n DESC, template ASC) - 1 AS BIGINT), "
        "  substring(md5(template), 1, 8), template FROM lc_banks "
        "UNION ALL SELECT 'logram', CAST(row_number() OVER "
        "  (ORDER BY n DESC, template ASC) - 1 AS BIGINT), "
        "  substring(md5(template), 1, 8), template FROM lgm_banks "
        "UNION ALL SELECT 'slct', CAST(row_number() OVER "
        "  (ORDER BY n DESC, template ASC) - 1 AS BIGINT), "
        "  substring(md5(template), 1, 8), template FROM slct_banks"
    ),
    "events_sketches_exact": (
        # both sketches run in their exact regime (caps ≫ cardinality), so
        # plain GROUP BY / COUNT(DISTINCT) reproduce them bit-for-bit; the
        # binned quantiles need NO exact regime — floor(value/width)
        # histograms + ceil(q·n) ranks are deterministic in both engines
        "WITH qbins AS ("
        "  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, "
        "         CAST(count(*) AS BIGINT) AS n "
        "  FROM events WHERE value IS NOT NULL GROUP BY 1), "
        "qcum AS ("
        "  SELECT bin, CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS c "
        "  FROM qbins), "
        "qtot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM qbins), "
        "qpick AS ("
        "  SELECT qv.v AS v, min(qcum.bin) AS bin "
        "  FROM (VALUES ('0.5', 0.5), ('0.95', 0.95), ('0.99', 0.99)) "
        "       AS qv(v, q), qtot, qcum "
        "  WHERE qcum.c >= ceil(qv.q * qtot.t) GROUP BY qv.v), "
        "gbins AS ("
        "  SELECT event_type AS g, CAST(floor(value / 10.0) AS BIGINT) AS bin, "
        "         CAST(count(*) AS BIGINT) AS n "
        "  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL "
        "  GROUP BY 1, 2), "
        "gcum AS ("
        "  SELECT g, bin, CAST(sum(n) OVER (PARTITION BY g ORDER BY bin) "
        "  AS BIGINT) AS c FROM gbins), "
        "gtot AS (SELECT g, CAST(sum(n) AS BIGINT) AS t FROM gbins GROUP BY g), "
        "gpick AS ("
        "  SELECT gcum.g AS g, qv.v AS v, min(gcum.bin) AS bin "
        "  FROM (VALUES ('0.5', 0.5), ('0.95', 0.95), ('0.99', 0.99)) "
        "       AS qv(v, q), gtot, gcum "
        "  WHERE gcum.g = gtot.g AND gcum.c >= ceil(qv.q * gtot.t) "
        "  GROUP BY gcum.g, qv.v) "
        "SELECT 'hh_event_type' AS part, "
        "  coalesce(CAST(event_type AS VARCHAR), '') AS v, "
        "  event_type IS NULL AS is_null, "
        "  CAST(count(*) AS BIGINT) AS count_min, "
        "  CAST(count(*) AS BIGINT) AS count_max "
        "FROM events GROUP BY event_type "
        "UNION ALL "
        "SELECT 'distinct_users', '', FALSE, "
        "  CAST(count(DISTINCT user_id) AS BIGINT), "
        "  CAST(count(DISTINCT user_id) AS BIGINT) FROM events "
        "UNION ALL "
        "SELECT 'q_value_bin', qpick.v, FALSE, qpick.bin, "
        "  (SELECT c FROM qcum WHERE qcum.bin = qpick.bin) "
        "FROM qpick "
        "UNION ALL "
        "SELECT 'q_value_by_type', gpick.g || ':' || gpick.v, FALSE, "
        "  gpick.bin, (SELECT c FROM gcum WHERE gcum.g = gpick.g "
        "              AND gcum.bin = gpick.bin) "
        "FROM gpick"
    ),
    "embeddings_near_dupes": (
        "SELECT a.vec_id AS a, b.vec_id AS b, "
        "CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) AS cos_bp "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.4"
    ),
}


def _profile_oracle_sql() -> str:
    """Generated long-format profile oracle over ``events`` — one UNION ALL
    branch per (column, stat), matching q_events_profile row for row."""
    cols = {
        "event_id": "int",
        "ts": "ts",
        "user_id": "int",
        "event_type": "str",
        "value": "float",
        "props": "str",
    }
    minmax = {
        "int": ("CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"),
        "ts": (
            "CAST(epoch_us(min({c})) AS VARCHAR)",
            "CAST(epoch_us(max({c})) AS VARCHAR)",
        ),
        "str": ("min({c})", "max({c})"),
        # floats: the profiler's IEEE total-order key fold + repr rendering
        # is byte-identical to DuckDB's shortest-round-trip CAST (verified
        # incl. nan/inf/-inf and exponent thresholds)
        "float": ("CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"),
    }
    parts = []
    for c, t in cols.items():
        parts.append(
            f"SELECT 'profile' AS part, '{c}.n_rows' AS k, "
            f"CAST(count(*) AS VARCHAR) AS v FROM events"
        )
        parts.append(
            f"SELECT 'profile', '{c}.n_null', "
            f"CAST(count(*) - count({c}) AS VARCHAR) FROM events"
        )
        parts.append(
            f"SELECT 'profile', '{c}.n_distinct', "
            f"CAST(count(DISTINCT {c}) AS VARCHAR) FROM events"
        )
        if t in minmax:
            mn, mx = minmax[t]
            parts.append(
                f"SELECT 'profile', '{c}.min_repr', "
                + mn.format(c=c)
                + " FROM events"
            )
            parts.append(
                f"SELECT 'profile', '{c}.max_repr', "
                + mx.format(c=c)
                + " FROM events"
            )
    parts.append(
        "SELECT 'distinct_users', event_type, "
        "CAST(count(DISTINCT user_id) AS VARCHAR) FROM events "
        "GROUP BY event_type"
    )
    return " UNION ALL ".join(parts)


ORACLE["events_profile"] = _profile_oracle_sql()


def _transcripts_oracles() -> dict[str, str]:
    """DuckDB oracles for the transcripts family via ``read_parquet()`` on
    the DETERMINISTIC fixture paths (VERDICT r04 #1): the driver registers
    only the testdata views, but the transcripts fixture and its golden are
    content-addressed parquet under the cache dir, so file-path SQL can
    re-derive every aggregate — and the golden's per-turn labels make the
    structured/templates/sink oracles a proof that the distributed matcher
    reproduces the generator's ground truth exactly."""
    root = fixtures.transcripts_cache_dir()
    tp = f"read_parquet('{os.path.join(root, 'transcripts_n60000_s42', 'part-*.parquet')}')"
    gp = f"read_parquet('{os.path.join(root, 'golden_n60000_s42.parquet')}')"
    return {
        "transcripts_conv_stats": (
            "SELECT conv_id, count(*) AS n_turns, "
            "CAST(sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_tool_turns, "
            "CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars, "
            "CAST(max(coalesce(length(text), 0)) AS BIGINT) AS max_chars, "
            "CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 "
            "AS BIGINT) AS span_s "
            f"FROM {tp} GROUP BY conv_id"
        ),
        "transcripts_sink_counts": (
            "SELECT role, tool, template_id, count(*) AS n_turns "
            f"FROM {gp} GROUP BY 1, 2, 3"
        ),
        "transcripts_templates": (
            "SELECT 'templates' AS part, template_id AS a, template AS b, "
            f"count(*) AS n FROM {gp} GROUP BY 1, 2, 3 "
            "UNION ALL "
            "SELECT 'conv_hash', conv_id, "
            "substr(md5(string_agg(text, chr(10) ORDER BY turn_idx)), 1, 16), "
            f"count(*) FROM {tp} GROUP BY conv_id"
        ),
        "transcripts_structured": (
            "WITH roles(role, role_class) AS (VALUES "
            "('system', 'control'), ('user', 'human'), "
            "('assistant', 'model'), ('tool', 'machine')), "
            "tools(tool, tool_family, is_sandboxed) AS (VALUES "
            "('bash', 'exec', TRUE), ('python', 'exec', TRUE), "
            "('read', 'fs', FALSE), ('write', 'fs', FALSE), "
            "('edit', 'fs', FALSE), ('search', 'net', TRUE), "
            "('fetch', 'net', TRUE)) "
            "SELECT g.conv_id, g.turn_idx, g.role, g.text, g.tool, g.ts, "
            "g.template_id, g.template, "
            # array_to_string([]) is NULL in DuckDB; binary_join([]) is ''
            "coalesce(array_to_string(g.params, chr(31)), '') AS params_str, "
            # '' = no dim row, on both sides (see flatten_params: nullable
            # bool/str stringify as 'None' vs 'nan' across engines and
            # break the sort-then-hash compare)
            "coalesce(r.role_class, '') AS role_class, "
            "coalesce(t.tool_family, '') AS tool_family, "
            "coalesce(CAST(t.is_sandboxed AS VARCHAR), '') AS is_sandboxed "
            f"FROM {gp} g "
            "LEFT JOIN roles r USING (role) LEFT JOIN tools t USING (tool)"
        ),
    }


ORACLE.update(_transcripts_oracles())


def _rawlog_oracle_sql() -> str:
    """DuckDB oracle for the raw-log file source (S1-S2), same
    fixture-path technique as ``_transcripts_oracles``: ``read_text()`` on
    the deterministic ``.log`` fixture, split to lines, and the header
    DSL's OWN generated regex (RE2 on both engines — pyarrow
    ``extract_regex`` and DuckDB share RE2 semantics) re-applied via
    ``regexp_extract``; non-matching lines are the quarantine set."""
    from logparser_ray.core.headerdsl import HeaderFormat

    # pure-Python, idempotent and tiny (500 lines): writing it here makes
    # the oracle independent of whether the driver runs SQL before the Ray
    # query that would otherwise create it
    path, _ = fixtures.ensure_rawlog(n_lines=500)
    rx = HeaderFormat(fixtures.RAWLOG_FORMAT).regex
    assert "'" not in rx
    return (
        "WITH lines AS (SELECT unnest(string_split(rtrim(content, chr(10)), "
        f"chr(10))) AS line FROM read_text('{path}')), "
        "parsed AS (SELECT "
        f"regexp_extract(line, '{rx}', "
        "['Date', 'Time', 'Pid', 'Level', 'Component', 'Content']) AS s, "
        f"NOT regexp_matches(line, '{rx}') AS q FROM lines) "
        # quarantined rows: the engine's groupby folds the null Level key
        # to '' — mirror that here so both sides stay null-free
        "SELECT CASE WHEN q THEN '' ELSE s.Level END AS Level, "
        "q AS _quarantined, count(*) AS n FROM parsed GROUP BY 1, 2"
    )


ORACLE["rawlog_structured"] = _rawlog_oracle_sql()


def _media_oracle_sql() -> str:
    """Golden-label oracle for the multimodal decode: the fixture parquet
    carries the generator's width/height/sample_rate; the engine side
    re-derives them by DECODING the payload bytes. ``octet_length`` pins
    the payload plumbing too."""
    path = fixtures.ensure_media(n=64, seed=5)
    return (
        "SELECT media_id, kind, CAST(width AS BIGINT) AS width, "
        "CAST(height AS BIGINT) AS height, "
        "CAST(sample_rate AS BIGINT) AS sample_rate, "
        "CAST(octet_length(payload) AS BIGINT) AS n_bytes "
        f"FROM read_parquet('{path}')"
    )


ORACLE["media_features"] = _media_oracle_sql()


def _langid_oracle_sql() -> str:
    """Generated replica of ``langid_batch``: per-language marker-token
    OCCURRENCE counts (``list_filter`` keeps duplicates, like the
    engine's ``is_in`` sum), argmax with first-max-wins in sorted
    language order (each CASE branch requires >= only against LATER
    languages — an earlier language holding the max would have taken an
    earlier branch), zero hits → 'und'."""
    from logparser_ray.stages.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    count_exprs = []
    for i, lang in enumerate(langs):
        toks = ", ".join(f"'{t}'" for t in sorted(LANG_MARKERS[lang]))
        count_exprs.append(
            f"len(list_filter(toks, t -> t IN ({toks}))) AS c{i}"
        )
    zero = " AND ".join(f"c{i} = 0" for i in range(len(langs)))
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"c{i} >= c{j}" for j in range(i + 1, len(langs))]
        cond = " AND ".join(conds) if conds else "TRUE"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    case = f"CASE WHEN {zero} THEN 'und' " + " ".join(branches) + " END"
    return (
        "WITH t AS (SELECT lang, string_split(text, ' ') AS toks "
        "FROM documents), "
        "c AS (SELECT lang, " + ", ".join(count_exprs) + " FROM t) "
        f"SELECT 'langid' AS part, lang AS a, {case} AS b, "
        "count(*) AS n FROM c GROUP BY 1, 2, 3"
    )


ORACLE["docs_textstats_extras"] = _langid_oracle_sql()
