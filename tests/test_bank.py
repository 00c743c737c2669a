"""Unit tests for the pattern-bank core (no Ray needed)."""

import hashlib

import pyarrow as pa
import pytest

from logparser_ray.core import (
    FALLTHROUGH_ID,
    CompiledBank,
    PatternBank,
    Template,
    template_id_of,
)
from logparser_ray import fixtures


def test_template_id_is_md5_prefix():
    t = "Tool <*> returned exit code <*> in <*> ms"
    assert template_id_of(t) == hashlib.md5(t.encode()).hexdigest()[:8]
    assert Template.from_string(t).template_id == template_id_of(t)


def test_template_regexes():
    t = Template.from_string("File <*> written successfully")
    assert t.n_tokens == 4
    assert t.n_slots == 1
    assert t.anchored_regex() == r"^File\s+(\S+)\s+written\s+successfully$"
    assert "(?P<p0>" in t.named_regex()


def test_first_match_wins_specialization():
    bank = PatternBank()
    bank.add("Command git finished with status <*>", priority=0)
    bank.add("Command <*> finished with status <*>", priority=1)
    cb = bank.compile()
    tid, tmpl, params = cb.match_array(
        pa.array(
            [
                "Command git finished with status ok",
                "Command make finished with status fail",
            ]
        )
    )
    assert tmpl.to_pylist() == [
        "Command git finished with status <*>",
        "Command <*> finished with status <*>",
    ]
    assert params.to_pylist() == [["ok"], ["make", "fail"]]


def test_fallthrough_and_nulls():
    cb = PatternBank([Template.from_string("Heartbeat ok", 0)]).compile()
    tid, _, params = cb.match_array(pa.array(["Heartbeat ok", "nope", None]))
    assert tid.to_pylist() == [template_id_of("Heartbeat ok"), FALLTHROUGH_ID, FALLTHROUGH_ID]
    assert params.to_pylist() == [[], [], []]


def test_bank_arrow_roundtrip_and_dedup():
    bank = fixtures.pattern_bank()
    rt = PatternBank.from_arrow(bank.to_arrow())
    assert [t.template for t in rt] == [t.template for t in bank]
    doubled = PatternBank(list(bank) + [Template.from_string(t.template, 99) for t in bank])
    assert len(doubled.dedup()) == len(bank)


def test_match_table_appends_columns():
    cb = fixtures.pattern_bank().compile()
    batch = pa.table({"text": ["Session started"], "conv_id": ["c0"]})
    out = cb.match_table(batch)
    assert out.column_names == ["text", "conv_id", "template_id", "template", "params"]


def test_property_parse_render_roundtrip():
    """parse(render(template, params)) == (template, params) — SURVEY.md §5.2 #4."""
    bank = fixtures.pattern_bank()
    cb = bank.compile()
    texts, want_params = [], []
    for t in bank:
        fills = [f"v{i}" for i in range(t.n_slots)]
        it = iter(fills)
        texts.append(" ".join(next(it) if tok == "<*>" else tok for tok in t.tokens))
        want_params.append(fills)
    # the generalization pair: the specialized template would never render
    # "Command v0 ..." so all renders must come back as themselves
    tid, tmpl, params = cb.match_array(pa.array(texts))
    assert tmpl.to_pylist() == [t.template for t in bank]
    assert params.to_pylist() == want_params


def test_trie_match_identical_to_flat_on_large_bank():
    """The n_tokens-pruned trie path (used for banks ≥ TRIE_MIN_TEMPLATES)
    must be byte-identical to the flat first-match-wins scan — token-count
    pruning is exact for anchored token templates."""
    import random

    import pyarrow as pa

    from logparser_ray.core.bank import CompiledBank, PatternBank, Template

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "node", "disk", "net", "cpu", "err"]
    templates = []
    for i in range(40):
        n = rng.randint(3, 7)
        toks = [rng.choice(words + ["<*>"]) for _ in range(n)]
        toks[0] = rng.choice(words)
        templates.append(" ".join(toks))
    bank = PatternBank(
        [Template.from_string(t, i) for i, t in enumerate(templates)]
    ).dedup()
    assert len(bank) >= CompiledBank.TRIE_MIN_TEMPLATES

    texts = []
    for _ in range(5_000):
        t = templates[rng.randrange(len(templates))]
        texts.append(
            " ".join(rng.choice(words) if x == "<*>" else x for x in t.split())
        )
    texts += ["no such shape at all", "", "one"]
    arr = pa.array(texts, pa.string())

    trie = bank.compile()
    flat = bank.compile()
    flat.TRIE_MIN_TEMPLATES = 10**9  # force the flat path
    id_t, s_t, p_t = trie.match_array(arr)
    id_f, s_f, p_f = flat.match_array(arr)
    assert id_t.equals(id_f) and s_t.equals(s_f) and p_t.equals(p_f)


# -- property tests (SURVEY.md §5.2 #4) -------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)


@settings(max_examples=60, deadline=None)
@given(
    tokens=st.lists(st.one_of(_token, st.just("<*>")), min_size=1, max_size=10),
    fills=st.lists(_token, min_size=10, max_size=10),
)
def test_parse_render_roundtrip(tokens, fills):
    """parse(render(template, params)) == (template, params) — the core
    first-match-wins invariant over arbitrary token templates."""
    import pyarrow as pa

    from logparser_ray.core.bank import PatternBank, Template

    t = Template(tuple(tokens), priority=0)
    it = iter(fills)
    rendered_toks = [next(it) if tok == "<*>" else tok for tok in tokens]
    rendered = " ".join(rendered_toks)
    cb = PatternBank([t]).compile()
    tid, tmpl, params = cb.match_array(pa.array([rendered]))
    assert tid[0].as_py() == t.template_id
    expected_params = [f for tok, f in zip(tokens, rendered_toks) if tok == "<*>"]
    assert params[0].as_py() == expected_params


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.lists(_token, min_size=1, max_size=6).map(" ".join), min_size=1, max_size=40
    )
)
def test_match_conserves_rows_and_fallthrough(texts):
    """Count conservation: every row gets exactly one template_id; rows not
    matching any bank entry land in _fallthrough, never dropped."""
    import pyarrow as pa

    from logparser_ray import fixtures
    from logparser_ray.core.bank import FALLTHROUGH_ID

    cb = fixtures.pattern_bank().compile()
    tid, _, _ = cb.match_array(pa.array(texts, pa.string()))
    assert len(tid) == len(texts)
    ids = set(tid.to_pylist())
    known = {t.template_id for t in fixtures.pattern_bank()} | {FALLTHROUGH_ID}
    assert ids <= known


def test_bank_save_load_roundtrip(tmp_path):
    from logparser_ray import fixtures
    from logparser_ray.core.bank import PatternBank

    bank = fixtures.pattern_bank()
    p = str(tmp_path / "bank.parquet")
    bank.save(p)
    loaded = PatternBank.load(p)
    assert [(t.priority, t.template) for t in loaded] == [
        (t.priority, t.template) for t in bank
    ]
    assert [t.template_id for t in loaded] == [t.template_id for t in bank]
