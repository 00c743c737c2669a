"""Deterministic synthetic fixtures (FIXTURES.md F1–F5).

All generators are seeded (default 42), fully vectorized (numpy → Arrow),
and byte-reproducible across runs and parallelism levels. The transcripts
generator also computes the *golden* outputs (true template per row, per-sink
aggregate counts) — the ground-truth analogue of loghub's ``_structured.csv``
(SURVEY.md §5.1).

No Ray imports here: callers write the Arrow tables to Parquet and read them
back with ``ray.data.read_parquet`` so pipelines exercise the real source
path.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logparser_ray.core.bank import FALLTHROUGH_ID, PatternBank, Template

BASE_TS_US = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)

# ---------------------------------------------------------------------------
# F2. pattern bank — 12 templates spanning the required shapes
# ---------------------------------------------------------------------------
# (template, slot vocabularies in slot order). Shapes per FIXTURES.md F2:
# pure-constant, leading-wildcard, trailing-wildcard, multi-slot, digit-only
# slot, two same-n_tokens siblings differing in one token, and a
# specialization/generalization pair (ordered first-match-wins).
_TEMPLATE_SPECS: list[tuple[str, list[list[str]]]] = [
    ("Session started", []),
    ("Heartbeat ok", []),
    ("<*> connected to workspace", [["alice", "bob", "carol", "dave", "erin"]]),
    ("User asked about <*>", [["arrow", "ray", "parquet", "shuffles", "actors"]]),
    (
        "Tool <*> returned exit code <*> in <*> ms",
        [
            ["bash", "python", "read", "write", "edit", "search", "fetch", "ghost"],
            ["0", "1", "2", "127"],
            ["3", "12", "48", "250", "1999"],
        ],
    ),
    ("Retry attempt <*> scheduled", [["1", "2", "3", "4", "5"]]),
    ("Agent replied with plan <*>", [["alpha", "beta", "gamma", "delta"]]),
    ("Agent replied with task <*>", [["t100", "t200", "t300"]]),
    ("Model produced <*> tokens in <*> ms", [["16", "128", "512", "2048"], ["9", "87", "640"]]),
    ("File <*> written successfully", [["a.txt", "b.py", "c.md", "d.json"]]),
    # specialization (priority 10) before its generalization (priority 11):
    # first-match-wins sends "Command git ..." rows to the specialized id.
    ("Command git finished with status <*>", [["ok", "fail"]]),
    (
        "Command <*> finished with status <*>",
        # "git" deliberately absent so golden labels stay unambiguous
        [["make", "pytest", "mypy", "cargo"], ["ok", "fail", "skip"]],
    ),
]

# drawn-template weights: skewed so template frequency is realistic
_TEMPLATE_WEIGHTS = np.array([8, 4, 6, 14, 20, 5, 7, 6, 12, 8, 4, 6], dtype=np.float64)

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["bash", "python", "read", "write", "edit", "search", "fetch", "ghost"]


def pattern_bank() -> PatternBank:
    """The F2 fixture bank, priorities = spec order."""
    return PatternBank(
        [Template.from_string(t, prio) for prio, (t, _) in enumerate(_TEMPLATE_SPECS)]
    )


def roles_dim() -> pa.Table:
    """F3 roles enrichment dim."""
    return pa.table(
        {
            "role": ["system", "user", "assistant", "tool"],
            "role_class": ["control", "human", "model", "machine"],
        }
    )


def tools_dim() -> pa.Table:
    """F3 tools enrichment dim — 'ghost' deliberately absent (null-fill path)."""
    return pa.table(
        {
            "tool": ["bash", "python", "read", "write", "edit", "search", "fetch"],
            "tool_family": ["exec", "exec", "fs", "fs", "fs", "net", "net"],
            "is_sandboxed": [True, True, False, False, False, True, True],
        }
    )


# ---------------------------------------------------------------------------
# F1. transcripts
# ---------------------------------------------------------------------------


def make_transcripts(
    n_turns: int = 2_000,
    n_convs: int | None = None,
    seed: int = 42,
    fallthrough_frac: float = 0.03,
    conv_offset: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Generate the canonical transcripts table + its golden structured table.

    Returns ``(transcripts, golden)`` where transcripts has exactly the
    BASELINE.json:15 input_hint schema ``(conv_id:string, turn_idx:int32,
    role:string, text:string, tool:string, ts:timestamp[us])`` and golden
    additionally carries ``template_id``/``template``/``params`` (the true
    assignment, identical to what first-match-wins matching must produce).

    conv ids are Zipf(a=1.2)-skewed (hot conversations — exercises the
    salted-key repartition, BASELINE.json:6); ``(conv_id, turn_idx)`` is
    unique and contiguous per conv; ``ts`` is monotone within a conversation.
    """
    if n_convs is None:
        n_convs = max(8, n_turns // 10)
    rng = np.random.default_rng(seed)

    # --- conversation structure -------------------------------------------
    ranks = rng.zipf(1.2, size=n_turns).astype(np.int64)
    conv_idx = (ranks - 1) % n_convs  # rank 1 (most probable) → conv 0, etc.
    order = np.argsort(conv_idx, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(n_turns)
    sorted_conv = conv_idx[order]
    # cumcount within conv over the sorted view → turn_idx (contiguous, 0-based)
    is_new = np.ones(n_turns, dtype=bool)
    is_new[1:] = sorted_conv[1:] != sorted_conv[:-1]
    group_start = np.maximum.accumulate(np.where(is_new, np.arange(n_turns), 0))
    turn_idx_sorted = np.arange(n_turns) - group_start
    turn_idx = turn_idx_sorted[inv].astype(np.int32)

    conv_id = np.char.add(
        "conv", np.char.zfill((conv_idx + conv_offset).astype("U9"), 9)
    )

    # --- roles: system at turn 0, else cycle user/assistant/tool w/ noise --
    cycle = np.array(["user", "assistant", "tool"], dtype=object)
    role = cycle[(turn_idx.astype(np.int64) - 1) % 3]
    noise = rng.random(n_turns) < 0.10
    role[noise] = cycle[rng.integers(0, 3, size=int(noise.sum()))]
    role[turn_idx == 0] = "system"

    # --- tool column: only for role == 'tool' ------------------------------
    tool = np.full(n_turns, "", dtype=object)
    tool_rows = role == "tool"
    tool[tool_rows] = np.array(TOOLS, dtype=object)[
        rng.integers(0, len(TOOLS), size=int(tool_rows.sum()))
    ]

    # --- text: template-rendered + ~3% fallthrough free text --------------
    probs = _TEMPLATE_WEIGHTS / _TEMPLATE_WEIGHTS.sum()
    t_choice = rng.choice(len(_TEMPLATE_SPECS), size=n_turns, p=probs)
    is_fall = rng.random(n_turns) < fallthrough_frac
    t_choice[is_fall] = -1

    text = np.empty(n_turns, dtype=object)
    template_id = np.empty(n_turns, dtype=object)
    template_str = np.empty(n_turns, dtype=object)
    params_offsets = np.zeros(n_turns + 1, dtype=np.int64)
    bank = pattern_bank()
    id_by_prio = [t.template_id for t in bank]
    str_by_prio = [t.template for t in bank]
    slot_fills: list[np.ndarray] = []

    n_slots_per = np.array(
        [len(spec[1]) for spec in _TEMPLATE_SPECS] + [0], dtype=np.int64
    )
    params_counts = n_slots_per[t_choice]  # t_choice==-1 indexes the trailing 0
    np.cumsum(params_counts, out=params_offsets[1:])
    params_values = np.empty(int(params_offsets[-1]), dtype=object)

    for ti, (tmpl, vocabs) in enumerate(_TEMPLATE_SPECS):
        rows = np.flatnonzero(t_choice == ti)
        if rows.size == 0:
            continue
        pieces = tmpl.split("<*>")
        rendered = np.full(rows.size, pieces[0], dtype=object)
        starts = params_offsets[rows]
        for s, vocab in enumerate(vocabs):
            fills = np.array(vocab, dtype=object)[rng.integers(0, len(vocab), rows.size)]
            rendered = np.char.add(rendered.astype("U"), fills.astype("U")).astype(object)
            rendered = np.char.add(rendered.astype("U"), pieces[s + 1]).astype(object)
            params_values[starts + s] = fills
        text[rows] = rendered
        template_id[rows] = id_by_prio[ti]
        template_str[rows] = str_by_prio[ti]
        slot_fills.append(rows)

    fall_rows = np.flatnonzero(is_fall)
    if fall_rows.size:
        fall_ids = rng.integers(0, 10_000, size=fall_rows.size)
        text[fall_rows] = np.array(
            [f"unstructured musing {i} with no known shape" for i in fall_ids],
            dtype=object,
        )
        template_id[fall_rows] = FALLTHROUGH_ID
        template_str[fall_rows] = ""

    # --- ts: per-conv start offset + cumulative 1–90 s per turn -----------
    conv_start = rng.integers(0, 86_400, size=n_convs).astype(np.int64) * 1_000_000
    deltas = rng.integers(1, 91, size=n_turns).astype(np.int64) * 1_000_000
    deltas_sorted = deltas[order]
    cum = np.cumsum(deltas_sorted)
    base_cum = np.maximum.accumulate(np.where(is_new, cum - deltas_sorted, 0))
    within = cum - base_cum
    ts_us = BASE_TS_US + conv_start[conv_idx] + within[inv]

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
    golden = transcripts.append_column(
        "template_id", pa.array(template_id, pa.string())
    ).append_column("template", pa.array(template_str, pa.string())).append_column(
        "params",
        pa.ListArray.from_arrays(
            pa.array(params_offsets, type=pa.int32()),
            pa.array(params_values, type=pa.string()),
        ),
    )
    return transcripts, golden


def golden_sink_counts(golden: pa.Table) -> pa.Table:
    """Per-sink aggregate ``(role, tool, template_id) → n_turns`` (F1 golden)."""
    agg = (
        golden.group_by(["role", "tool", "template_id"])
        .aggregate([("conv_id", "count")])
        .rename_columns(["role", "tool", "template_id", "n_turns"])
    )
    return agg.sort_by(
        [("role", "ascending"), ("tool", "ascending"), ("template_id", "ascending")]
    )


# ---------------------------------------------------------------------------
# F4. rawlog — loghub-style header-DSL conformance fixture
# ---------------------------------------------------------------------------

RAWLOG_FORMAT = "<Date> <Time> <Pid> <Level> <Component>: <Content>"
RAWLOG_REX = [r"blk_-?\d+", r"(\d{1,3}\.){3}\d{1,3}(:\d+)?", r"\d+"]

_RAWLOG_CONTENT: list[tuple[str, list[list[str]]]] = [
    (
        "Received block blk_<*> of size <*> from 10.0.0.<*>",
        [["884", "1721", "-330", "42"], ["67108864", "1048576"], ["12", "7", "201"]],
    ),
    ("Verification succeeded for blk_<*>", [["884", "1721", "55"]]),
    ("Deleting block blk_<*> file /data/<*>", [["9", "10", "11"], ["f1", "f2"]]),
    ("Starting thread to transfer block blk_<*> to 10.0.0.<*>", [["77", "78"], ["3", "4"]]),
]


def make_rawlog(n_lines: int = 500, seed: int = 43) -> tuple[list[str], pa.Table]:
    """Raw log lines + golden header fields; ~2% malformed lines (quarantine)."""
    rng = np.random.default_rng(seed)
    levels = ["INFO", "WARN", "ERROR"]
    comps = ["dfs.DataNode", "dfs.FSNamesystem", "dfs.PacketResponder"]
    lines: list[str] = []
    rows: list[dict] = []
    for i in range(n_lines):
        if rng.random() < 0.02:
            lines.append(f"!!corrupt frame {i}")
            rows.append({"LineId": i + 1, "_quarantined": True})
            continue
        tmpl, vocabs = _RAWLOG_CONTENT[rng.integers(0, len(_RAWLOG_CONTENT))]
        pieces = tmpl.split("<*>")
        content = pieces[0]
        for s, vocab in enumerate(vocabs):
            content += vocab[rng.integers(0, len(vocab))] + pieces[s + 1]
        sec = int(rng.integers(0, 86_400))
        hh, mm, ss = sec // 3600, (sec // 60) % 60, sec % 60
        rec = {
            "LineId": i + 1,
            "Date": "2026-01-01",
            "Time": f"{hh:02d}:{mm:02d}:{ss:02d}",
            "Pid": str(int(rng.integers(1, 5000))),
            "Level": levels[rng.integers(0, 3)],
            "Component": comps[rng.integers(0, 3)],
            "Content": content,
            "_quarantined": False,
        }
        lines.append(
            f"{rec['Date']} {rec['Time']} {rec['Pid']} {rec['Level']} "
            f"{rec['Component']}: {rec['Content']}"
        )
        rows.append(rec)
    golden = pa.Table.from_pylist(rows)
    return lines, golden


def ensure_rawlog(n_lines: int = 500, seed: int = 43) -> tuple[str, pa.Table]:
    """Write the F4 raw-log fixture to a ``.log`` file under the cache dir
    (exercises the real ``read_text``-style file source); returns
    ``(path, golden)``."""
    lines, golden = make_rawlog(n_lines=n_lines, seed=seed)
    path = os.path.join(transcripts_cache_dir(), f"rawlog_n{n_lines}_s{seed}.log")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return path, golden


# ---------------------------------------------------------------------------
# F7. labeled conformance corpora — additional miner-accuracy families
# ---------------------------------------------------------------------------
# Second synthetic family so miner accuracy is not proven on ONE grammar
# only (the real loghub_2k corpus cannot exist in this sandbox — VERDICT r1
# Missing #4): HDFS-like DataNode/NameSystem shapes with block-id and
# ip:port vocabularies, structurally close to the most-studied upstream
# dataset (public knowledge of HDFS logs; † data/loghub_2k/HDFS).

_BLKS = [f"blk_{v}" for v in (884, 1721, -330, 42, 9, 10, 5501, 77)]
_IPS = [f"10.0.0.{h}:500{p}0" for h in (3, 4, 12, 201) for p in (1, 7)]

_HDFS_SPECS: list[tuple[str, list[list[str]]]] = [
    ("Receiving block <*> src: <*> dest: <*>", [_BLKS, _IPS, _IPS]),
    ("PacketResponder <*> for block <*> terminating", [["0", "1", "2"], _BLKS]),
    ("Verification succeeded for <*>", [_BLKS]),
    ("Deleting block <*> file /data/current/<*>", [_BLKS, ["f1", "f2", "f3"]]),
    ("Served block <*> to <*>", [_BLKS, _IPS]),
    ("Starting thread to transfer block <*> to <*>", [_BLKS, _IPS]),
    ("BLOCK* NameSystem.allocateBlock: /user/job<*>", [["1", "2", "3", "4"]]),
    ("Exception in receiveBlock for block <*> java.io.IOException", [_BLKS]),
]

_PATHS = ["/index.html", "/api/v1/users", "/api/v1/orders", "/static/app.js", "/login"]
_AGENTS = ["curl/8.1", "Mozilla/5.0", "python-requests/2.31"]
_MS = ["3", "12", "48", "150", "1200"]

# third conformance family: web-access/nginx-like grammar — different
# shape stressors than HDFS (a zero-wildcard template, adjacent wildcard
# slots, shared vocab across templates, and one constant-light template)
_WEBLOG_SPECS: list[tuple[str, list[list[str]]]] = [
    ("client <*> request <*> <*> status <*>",
     [_IPS, ["GET", "POST", "PUT"], _PATHS, ["200", "404", "500", "302"]]),
    ("response sent bytes <*> in <*> ms", [["512", "2048", "81920", "33"], _MS]),
    ("cache miss for <*> fetching upstream", [_PATHS]),
    ("cache hit for <*>", [_PATHS]),
    ("tls handshake from <*> cipher <*>",
     [_IPS, ["aes128", "aes256", "chacha20"]]),
    ("rate limit exceeded for <*> retry after <*> s", [_IPS, ["1", "5", "30"]]),
    ("worker <*> reloaded configuration", [["w0", "w1", "w2", "w3"]]),
    ("upstream timeout contacting <*> after <*> ms", [_IPS, _MS]),
    ("session <*> expired for agent <*>",
     [[f"s{v}" for v in (11, 93, 207, 5)], _AGENTS]),
    ("healthcheck ok", []),
]

_CORPUS_FAMILIES: dict[str, list[tuple[str, list[list[str]]]]] = {
    "hdfs": _HDFS_SPECS,
    "weblog": _WEBLOG_SPECS,
}


def make_labeled_corpus(
    family: str = "hdfs", n_lines: int = 2_000, seed: int = 44
) -> tuple[pa.Table, pa.Table, PatternBank]:
    """Labeled single-column corpus for miner-accuracy benchmarks.

    Returns ``(corpus, golden, bank)``: corpus ``(line_id:int64,
    text:string)``, golden additionally carries the true ``template_id``,
    and ``bank`` is the generating grammar as a PatternBank.
    """
    specs = _CORPUS_FAMILIES[family]
    rng = np.random.default_rng(seed)
    choice = rng.integers(0, len(specs), size=n_lines)
    bank = PatternBank(
        [Template.from_string(t, prio) for prio, (t, _) in enumerate(specs)]
    )
    ids = [t.template_id for t in bank]
    text = np.empty(n_lines, dtype=object)
    tid = np.empty(n_lines, dtype=object)
    for ti, (tmpl, vocabs) in enumerate(specs):
        rows = np.flatnonzero(choice == ti)
        if rows.size == 0:
            continue
        pieces = tmpl.split("<*>")
        rendered = np.full(rows.size, pieces[0], dtype=object)
        for s, vocab in enumerate(vocabs):
            fills = np.array(vocab, dtype=object)[
                rng.integers(0, len(vocab), rows.size)
            ]
            rendered = np.char.add(rendered.astype("U"), fills.astype("U")).astype(object)
            rendered = np.char.add(rendered.astype("U"), pieces[s + 1]).astype(object)
        text[rows] = rendered
        tid[rows] = ids[ti]
    corpus = pa.table(
        {
            "line_id": pa.array(np.arange(n_lines, dtype=np.int64)),
            "text": pa.array(text, pa.string()),
        }
    )
    golden = corpus.append_column("template_id", pa.array(tid, pa.string()))
    return corpus, golden, bank


# ---------------------------------------------------------------------------
# F5. evaluator fixture — known grouping accuracy
# ---------------------------------------------------------------------------


def make_evaluator_fixture() -> tuple[pa.Table, pa.Table, float]:
    """40 keys; truth groups A(34)/B(3)/C(3); parsed merges B∪C → accuracy 0.85."""
    keys = [(f"conv{k:06d}", 0) for k in range(40)]
    truth_ids = ["A"] * 34 + ["B"] * 3 + ["C"] * 3
    parsed_ids = ["A"] * 34 + ["BC"] * 6
    truth = pa.table(
        {
            "conv_id": [k for k, _ in keys],
            "turn_idx": pa.array([t for _, t in keys], pa.int32()),
            "event_id": truth_ids,
        }
    )
    parsed = truth.set_column(2, "event_id", pa.array(parsed_ids))
    return truth, parsed, 34 / 40


# ---------------------------------------------------------------------------
# Parquet caching helpers (atomic write, reproducible path)
# ---------------------------------------------------------------------------


def ensure_parquet(table: pa.Table, path: str, row_group_size: int = 65_536) -> str:
    """Write ``table`` to ``path`` atomically if absent; return ``path``."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def transcripts_cache_dir() -> str:
    return os.environ.get("RAYPARSE_CACHE", "/tmp/rayparse_cache")


_CHUNK_TURNS = 2_400_000  # generation chunk: independent conv universe each


def _gen_chunk(args) -> str:
    """Generate one deterministic chunk of a large fixture (worker process)."""
    i, n, seed, tdir, files_per_chunk = args
    # disjoint conv universes per chunk via conv_offset; rng seeded per chunk
    transcripts, _ = make_transcripts(
        n_turns=n, seed=seed + 7_919 * i, conv_offset=i * 10_000_000
    )
    step = (transcripts.num_rows + files_per_chunk - 1) // files_per_chunk
    for j in range(files_per_chunk):
        part = transcripts.slice(j * step, step)
        ensure_parquet(
            part, os.path.join(tdir, f"part-{i * files_per_chunk + j:04d}.parquet")
        )
    return tdir


def ensure_transcripts(
    n_turns: int, seed: int = 42, with_golden: bool = False
) -> tuple[str, str | None]:
    """Materialize the transcripts fixture (and optionally its golden) to
    deterministic Parquet paths under the cache dir; returns the path(s).

    Multiple Parquet files are written for n_turns > 250k so the read stage
    starts with several shards (parallel read + resumable routing units).
    Fixtures above ``_CHUNK_TURNS`` are generated as independent seeded
    chunks in parallel worker processes (disjoint conv-id universes), so
    bench-scale inputs build in ~1 min instead of ~10.
    """
    root = transcripts_cache_dir()
    # the cache dir is KEYED ON GENERATION MODE: chunked and unchunked modes
    # produce different (both deterministic) data for the same (n, seed), and
    # ensure_parquet skips existing files — an unkeyed dir could end up with
    # chunked part files next to an unchunked golden (ADVICE r01)
    chunked = n_turns > _CHUNK_TURNS and not with_golden
    tdir = os.path.join(
        root, f"transcripts_n{n_turns}_s{seed}" + ("_chunked" if chunked else "")
    )
    gpath = os.path.join(root, f"golden_n{n_turns}_s{seed}.parquet")
    done = os.path.join(tdir, "_SUCCESS")
    if os.path.exists(done) and (not with_golden or os.path.exists(gpath)):
        return tdir, (gpath if with_golden else None)
    os.makedirs(tdir, exist_ok=True)
    if chunked:
        from concurrent.futures import ProcessPoolExecutor

        n_chunks = (n_turns + _CHUNK_TURNS - 1) // _CHUNK_TURNS
        base, rem = divmod(n_turns, n_chunks)
        # remainder rows spread over the first `rem` chunks so the fixture
        # has EXACTLY n_turns rows (n // n_chunks silently dropped up to
        # n_chunks-1 rows before — ADVICE r01)
        ns = [base + (1 if i < rem else 0) for i in range(n_chunks)]
        files_per_chunk = max(1, min(32, base // 75_000))
        jobs = [(i, ns[i], seed, tdir, files_per_chunk) for i in range(n_chunks)]
        with ProcessPoolExecutor(max_workers=min(8, n_chunks)) as pool:
            list(pool.map(_gen_chunk, jobs))
    else:
        transcripts, golden = make_transcripts(n_turns=n_turns, seed=seed)
        n_files = max(1, min(128, n_turns // 75_000))
        step = (transcripts.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            part = transcripts.slice(i * step, step)
            ensure_parquet(part, os.path.join(tdir, f"part-{i:04d}.parquet"))
        ensure_parquet(golden, gpath)
    with open(done, "w") as f:
        f.write("ok\n")
    return tdir, (gpath if with_golden else None)


def ensure_media(n: int = 64, seed: int = 5) -> str:
    """Write the F-media fixture (decodable PPM/WAV payloads + the
    GENERATOR'S golden width/height/sample_rate columns) to a
    deterministic cache parquet — the multimodal analogue of the
    transcripts golden: the engine decodes the payload bytes, the DuckDB
    oracle reads the generator's labels from the same file, and equality
    proves the decode end to end. Pure pyarrow (no Ray); idempotent."""
    from logparser_ray.stages.multimodal import make_real_media_table

    path = os.path.join(transcripts_cache_dir(), f"media_n{n}_s{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        os.close(fd)
        pq.write_table(make_real_media_table(n=n, seed=seed), tmp)
        os.replace(tmp, path)
    return path
