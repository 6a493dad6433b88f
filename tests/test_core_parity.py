"""Kernel-vs-oracle parity at the core (no-Spark) level.

Mirrors the reference's test strategy (SURVEY.md §5): exact per-turn text
and span equality under stable ordering, for every flag combination.
"""

import pytest

from pdftext_spark.config import ExtractConfig
from pdftext_spark.core.api import process_batch
from pdftext_spark.core.links import resolve_conversation_refs, rewrite_page_urls
from tests.oracle_naive import oracle_dictionary, oracle_plain, oracle_tables


def deep_eq(a, b, path=""):
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a) != set(b):
            return f"{path} keys differ: {set(a) ^ set(b)}"
        for k in a:
            r = deep_eq(a[k], b[k], f"{path}.{k}")
            if r:
                return r
        return None
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b):
            return f"{path} len {len(a)} vs {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            r = deep_eq(x, y, f"{path}[{i}]")
            if r:
                return r
        return None
    if isinstance(a, float) and isinstance(b, float):
        return None if a == b else f"{path} {a} vs {b}"
    return None if a == b else f"{path} {a!r} vs {b!r}"


def _doc_turns(fixture_rows):
    for cid, turns in fixture_rows["convs"].items():
        doc = [t for t in turns if t["role"] != "tool"]
        if doc:
            yield cid, [t["text"] for t in doc], [t["turn_idx"] for t in doc]


def _run_kernel(texts, ids, **flags):
    cfg = ExtractConfig(keep_chars=True, **flags)
    outs = process_batch(texts, ["user"] * len(texts), ids, cfg)
    regs = [(ids[i], *r) for i, o in enumerate(outs) for r in o.registrations]
    url_map, refs_by_page = resolve_conversation_refs(regs)
    for o in outs:
        rewrite_page_urls(o.page, url_map, refs_by_page)
    return outs


def _norm_oracle_page(page):
    """Align oracle page dicts with kernel output shape: kernel char dicts
    omit the font (identical to the span font by construction)."""
    for blk in page["blocks"]:
        for ln in blk["lines"]:
            for sp in ln["spans"]:
                for c in sp.get("chars", []):
                    c.pop("font", None)
    return page


def _norm_kernel_page(page):
    for blk in page["blocks"]:
        for ln in blk["lines"]:
            for sp in ln["spans"]:
                for c in sp.get("chars", []):
                    c.pop("font", None)
    return page


@pytest.mark.parametrize("flags", [{}, {"sort": True}, {"hyphens": True},
                                   {"sort": True, "hyphens": True}])
def test_plain_text_parity(fixture_rows, flags):
    n = 0
    for cid, texts, ids in _doc_turns(fixture_rows):
        outs = process_batch(texts, ["user"] * len(texts), ids,
                             ExtractConfig(emit_struct=False, emit_tables=False,
                                           disable_links=True, **flags))
        exp = oracle_plain(texts, page_ids=ids, **flags)
        for o, e in zip(outs, exp):
            assert o.text == e, cid
            n += 1
    assert n > 50


def test_struct_parity_with_links(fixture_rows):
    for cid, texts, ids in _doc_turns(fixture_rows):
        outs = _run_kernel(texts, ids)
        exp = oracle_dictionary(texts, keep_chars=True, page_ids=ids)
        for o, e in zip(outs, exp):
            r = deep_eq(_norm_kernel_page(o.page), _norm_oracle_page(e))
            assert r is None, f"{cid}: {r}"


def test_struct_parity_sorted(fixture_rows):
    for cid, texts, ids in _doc_turns(fixture_rows):
        outs = _run_kernel(texts, ids, sort=True)
        exp = oracle_dictionary(texts, keep_chars=True, sort=True, page_ids=ids)
        for o, e in zip(outs, exp):
            r = deep_eq(_norm_kernel_page(o.page), _norm_oracle_page(e))
            assert r is None, f"{cid}: {r}"


def test_tables_parity(fixture_rows):
    n_tables = 0
    for cid, texts, ids in _doc_turns(fixture_rows):
        outs = _run_kernel(texts, ids)
        exp = oracle_tables(texts, page_ids=ids)
        for o, e in zip(outs, exp):
            r = deep_eq(o.tables, e)
            assert r is None, f"{cid}: {r}"
            n_tables += len(o.tables)
    assert n_tables > 0


def test_quote_loosebox_toggle(fixture_rows):
    """quote_loosebox=False must pick tight boxes for quotes (chars.py:21-23)
    and still match the oracle."""
    any_diff = False
    for cid, texts, ids in _doc_turns(fixture_rows):
        cfg = ExtractConfig(quote_loosebox=False, emit_struct=False,
                            emit_tables=False, disable_links=True)
        outs = process_batch(texts, ["user"] * len(texts), ids, cfg)
        exp = oracle_plain(texts, page_ids=ids)  # loosebox default True
        exp_tight = [t for t in exp]
        from tests.oracle_naive import build_page, merge_text_naive
        exp_tight = [merge_text_naive(build_page(t, i, quote_loosebox=False)).strip()
                     for t, i in zip(texts, ids)]
        for o, e in zip(outs, exp_tight):
            assert o.text == e
        any_diff = any_diff or exp != exp_tight
    # the fixture injects quotes with tight boxes, so the toggle must matter
    assert any_diff


def test_superscript_facts(fixture_rows):
    """Generator-known superscripts must be flagged (analog of the
    reference's ∞ test, tests/test_extraction.py:29-37)."""
    sups = {(s["conv_id"], s["turn_idx"]): [] for s in fixture_rows["sups"]}
    for s in fixture_rows["sups"]:
        sups[(s["conv_id"], s["turn_idx"])].append(s["sup_text"])
    assert sups
    by_conv = fixture_rows["convs"]
    checked = 0
    for cid, turns in by_conv.items():
        doc = [t for t in turns if t["role"] != "tool"]
        if not doc:
            continue
        texts = [t["text"] for t in doc]
        ids = [t["turn_idx"] for t in doc]
        outs = _run_kernel(texts, ids)
        for t, o in zip(doc, outs):
            expected = sups.get((cid, t["turn_idx"]))
            if not expected:
                continue
            flagged = [sp["text"] for b in o.page["blocks"] for l in b["lines"]
                       for sp in l["spans"] if sp["superscript"]]
            for se in expected:
                assert se in flagged, (cid, t["turn_idx"], se, flagged)
                checked += 1
    assert checked > 5


def test_table_facts(fixture_rows):
    """Generator-known table shapes: cell count + last cell text (analog of
    tests/test_tables.py:33-38)."""
    facts = {(f["conv_id"], f["turn_idx"]): f for f in fixture_rows["tables"]}
    assert facts
    checked = 0
    for cid, turns in fixture_rows["convs"].items():
        doc = [t for t in turns if t["role"] != "tool"]
        if not doc:
            continue
        outs = _run_kernel([t["text"] for t in doc], [t["turn_idx"] for t in doc])
        for t, o in zip(doc, outs):
            f = facts.get((cid, t["turn_idx"]))
            if not f:
                continue
            assert len(o.tables) == f["n_tables"]
            cells = o.tables[0]
            assert len(cells) == f["n_cells"], (cid, t["turn_idx"])
            assert cells[-1]["text"].strip() == f["last_text"]
            for c in cells:
                assert all(v >= -1e-9 for v in c["bbox"][:2])
            checked += 1
    assert checked > 0


def test_html_facts(fixture_rows):
    from pdftext_spark.core.html_main import extract_main_text
    exp = {(h["conv_id"], h["turn_idx"]): h["main_text"] for h in fixture_rows["html"]}
    assert exp
    checked = 0
    for cid, turns in fixture_rows["convs"].items():
        for t in turns:
            if t["role"] != "tool":
                continue
            got = extract_main_text(t["text"])
            assert got == exp[(cid, t["turn_idx"])], (cid, t["turn_idx"], got[:200])
            checked += 1
    assert checked > 10


def test_html_deep_spine():
    """Pages nested beyond the recursion limit must parse (iterative
    walks), and scoring must pick the content-dense spine node."""
    from pdftext_spark.core.html_main import extract_main_text
    depth = 3000
    deep = ("<body>"
            + "".join(f"<div><p>paragraph {i} body text for scoring</p>"
                      f"<a href=x>l{i}</a>" for i in range(depth))
            + "</div>" * depth + "</body>")
    out = extract_main_text(deep)
    assert "paragraph 0 body text for scoring" in out
    assert f"paragraph {depth - 1} body text for scoring" in out
    # link text may appear, boilerplate must not dominate: sanity on shape
    assert out.count("\n") >= depth - 1
