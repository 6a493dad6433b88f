"""Oracle-expected output tables, materialized to parquet.

The driver's correctness gate runs our Spark queries against DuckDB SQL.
Extraction semantics are not SQL-expressible, so the oracle SQL for those
queries is `SELECT ... FROM read_parquet('<expected parquet>')` where the
parquet is produced HERE by the independent naive oracle
(tests/oracle_naive.py) over the same deterministic fixture corpus the
Spark query reads. That turns the driver's value-hash comparison into a
genuine two-implementation check (vectorized Spark kernel vs naive
reference-semantics oracle).
"""

from __future__ import annotations

import collections
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdftext_spark.sources.fixture_io import ensure_fixture_dir


def expected_dir(tier: str) -> str:
    return ensure_fixture_dir(tier)


def ensure_expected_outputs(tier: str) -> str:
    """Run the naive oracle over the fixture corpus and write expected
    tables next to the inputs. Idempotent (marker file)."""
    out = ensure_fixture_dir(tier)
    marker = os.path.join(out, "_EXPECTED_COMPLETE")
    stamp = "v4"  # bump when the set of expected tables changes
    if os.path.exists(marker) and open(marker).read() == stamp:
        return out

    from tests.oracle_naive import oracle_dictionary, oracle_plain, oracle_tables

    # HTML tool-turn truth comes from the GENERATOR's own fact table
    # (fixtures.py html_exp), never from the extract_main_text code under
    # test — keeps the driver gate a two-implementation check for HTML too.
    # Both corpus and fact table are read BACK from the parquet
    # ensure_fixture_dir just materialized (byte-stable, one generator run
    # per tier) instead of regenerating the whole corpus in memory — at
    # the sf0.1 tier that regeneration was the expensive half of a cold
    # expected-output build.
    rows = pq.read_table(
        os.path.join(out, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text"]).to_pylist()
    html_exp = pq.read_table(
        os.path.join(out, "expected_html.parquet")).to_pylist()
    html_truth = {(h["conv_id"], h["turn_idx"]): h["main_text"] for h in html_exp}
    convs = collections.defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(r)

    plain_rows, span_rows, block_rows, ref_rows, meta_rows, table_rows = \
        [], [], [], [], [], []
    char_rows = []
    sorted_rows, hyph_rows = [], []
    for cid in sorted(convs):
        turns = sorted(convs[cid], key=lambda r: r["turn_idx"])
        doc = [t for t in turns if t["role"] != "tool"]
        texts = [t["text"] for t in doc]
        ids = [t["turn_idx"] for t in doc]
        pages = oracle_dictionary(texts, page_ids=ids, keep_chars=True)
        plains = oracle_plain(texts, page_ids=ids)
        plains_sorted = oracle_plain(texts, sort=True, page_ids=ids)
        plains_hyph = oracle_plain(texts, hyphens=True, page_ids=ids)
        tables = oracle_tables(texts, page_ids=ids)
        for t in turns:
            if t["role"] == "tool":
                row = {"conv_id": cid, "turn_idx": t["turn_idx"],
                       "text": html_truth[(cid, t["turn_idx"])]}
                plain_rows.append(row)
                sorted_rows.append(dict(row))   # sort/hyphens are no-ops
                hyph_rows.append(dict(row))     # for HTML tool turns
        for tid, page, plain, psort, phyph, tabs in zip(
                ids, pages, plains, plains_sorted, plains_hyph, tables):
            key = {"conv_id": cid, "turn_idx": tid}
            plain_rows.append({**key, "text": plain})
            sorted_rows.append({**key, "text": psort})
            hyph_rows.append({**key, "text": phyph})
            meta_rows.append({**key, "width": page["width"], "height": page["height"],
                              "rotation": page["rotation"],
                              "b0": page["bbox"][0], "b1": page["bbox"][1],
                              "b2": page["bbox"][2], "b3": page["bbox"][3]})
            for r in page["refs"]:
                ref_rows.append({**key, "idx": r["idx"], "ref": r["ref"],
                                 "url": r["url"], "x": r["coord"][0], "y": r["coord"][1]})
            for bi, blk in enumerate(page["blocks"]):
                bb = blk["bbox"]
                block_rows.append({**key, "block_idx": bi, "n_lines": len(blk["lines"]),
                                   "x1": bb[0], "y1": bb[1], "x2": bb[2], "y2": bb[3]})
                for li, ln in enumerate(blk["lines"]):
                    for si, sp in enumerate(ln["spans"]):
                        span_rows.append({
                            **key, "block_idx": bi, "line_idx": li, "span_idx": si,
                            "text": sp["text"],
                            "font_name": sp["font"]["name"],
                            "font_flags": sp["font"]["flags"],
                            "font_size": sp["font"]["size"],
                            "font_weight": sp["font"]["weight"],
                            "char_start_idx": sp["char_start_idx"],
                            "char_end_idx": sp["char_end_idx"],
                            "rotation": sp["rotation"],
                            "url": sp["url"] if sp["url"] is not None else "",
                            "superscript": sp["superscript"],
                            "subscript": sp["subscript"],
                            "x1": sp["bbox"][0], "y1": sp["bbox"][1],
                            "x2": sp["bbox"][2], "y2": sp["bbox"][3],
                        })
                        for ch in sp["chars"]:
                            char_rows.append({
                                **key, "block_idx": bi, "line_idx": li,
                                "span_idx": si,
                                "char_idx": ch["char_idx"],
                                "char": ch["char"],
                                "rotation": float(ch["rotation"]),
                                "x1": ch["bbox"][0], "y1": ch["bbox"][1],
                                "x2": ch["bbox"][2], "y2": ch["bbox"][3],
                            })
            for ti_, cells in enumerate(tabs):
                for ci, cell in enumerate(cells):
                    table_rows.append({**key, "table_idx": ti_, "cell_idx": ci,
                                       "text": cell["text"],
                                       "x1": cell["bbox"][0], "y1": cell["bbox"][1],
                                       "x2": cell["bbox"][2], "y2": cell["bbox"][3]})

    # Full column schemas so an EMPTY table still carries the columns its
    # oracle SQL selects (a conv_id-only placeholder made DuckDB raise a
    # Binder Error instead of comparing an empty result set). Types mirror
    # what from_pylist infers on non-empty data (int64/float64/bool/str).
    s, i, f, b = pa.string(), pa.int64(), pa.float64(), pa.bool_()
    base = [("conv_id", s), ("turn_idx", i)]
    box = [("x1", f), ("y1", f), ("x2", f), ("y2", f)]
    _EMPTY_SCHEMAS = {
        "expected_plain.parquet": base + [("text", s)],
        "expected_plain_sorted.parquet": base + [("text", s)],
        "expected_plain_hyphens.parquet": base + [("text", s)],
        "expected_spans.parquet": base + [
            ("block_idx", i), ("line_idx", i), ("span_idx", i), ("text", s),
            ("font_name", s), ("font_flags", i), ("font_size", f),
            ("font_weight", i), ("char_start_idx", i), ("char_end_idx", i),
            ("rotation", f), ("url", s), ("superscript", b),
            ("subscript", b)] + box,
        "expected_chars.parquet": base + [
            ("block_idx", i), ("line_idx", i), ("span_idx", i),
            ("char_idx", i), ("char", s), ("rotation", f)] + box,
        "expected_blocks.parquet": base + [("block_idx", i),
                                           ("n_lines", i)] + box,
        "expected_refs.parquet": base + [("idx", i), ("ref", s), ("url", s),
                                         ("x", f), ("y", f)],
        "expected_pagemeta.parquet": base + [
            ("width", i), ("height", i), ("rotation", i),
            ("b0", f), ("b1", f), ("b2", f), ("b3", f)],
        "expected_tables.parquet": base + [
            ("table_idx", i), ("cell_idx", i), ("text", s)] + box,
    }

    def write(name, data, schema=None):
        if data:
            table = pa.Table.from_pylist(data)
        else:
            table = pa.Table.from_pylist(
                [], schema=pa.schema(_EMPTY_SCHEMAS[name]))
        pq.write_table(table, os.path.join(out, name))

    write("expected_plain.parquet", plain_rows)
    write("expected_plain_sorted.parquet", sorted_rows)
    write("expected_plain_hyphens.parquet", hyph_rows)
    write("expected_spans.parquet", span_rows)
    write("expected_chars.parquet", char_rows)
    write("expected_blocks.parquet", block_rows)
    write("expected_refs.parquet", ref_rows)
    write("expected_pagemeta.parquet", meta_rows)
    write("expected_tables.parquet", table_rows)
    with open(marker, "w") as f:
        f.write(stamp)
    return out
