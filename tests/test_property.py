"""Property-based kernel-vs-oracle parity (hypothesis, derandomized).

The fixture generator covers realistic layouts; these tests throw
adversarial random char streams (degenerate boxes, stacked coordinates,
rotation mixes, hyphen/newline storms, random links) at both
implementations and require bit-exact agreement.
"""

import json
import os

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from pdftext_spark.config import ExtractConfig
from pdftext_spark.core.api import process_batch
from pdftext_spark.core.links import resolve_conversation_refs, rewrite_page_urls
from pdftext_spark.core.textproc import handle_hyphens, postprocess_text
from tests.oracle_naive import hyphens_text, oracle_dictionary, oracle_plain, pp_text
from tests.test_core_parity import deep_eq

# HYP_EXAMPLES=2000 for a heavy pre-release shake-out run
SETTINGS = dict(max_examples=int(os.environ.get("HYP_EXAMPLES", "150")),
                deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.too_slow])

_CHAR_POOL = list("abcXY z12.'-∞ﬁﬀ") + ["\n", "\x02", " ", "\xa0", "\x7f", "\r", "\t"]
_GRID = [0.0, 3.5, 7.25, 11.0, 14.5, 21.0, 29.5, 36.0, 50.0, 72.0, 100.0]

_char_st = st.tuples(
    st.sampled_from(_CHAR_POOL),
    st.sampled_from(_GRID),                      # x1
    st.sampled_from(_GRID),                      # y1
    st.sampled_from([0.0, 0.5, 3.0, 6.5, 11.0]),  # width
    st.sampled_from([0.0, 4.0, 6.5, 8.0, 11.0, 14.0]),  # height
    st.sampled_from([0.0, 0.0, 0.0, 90.0]),      # char rotation
    st.integers(0, 2),                           # font id
)

_FONTS = [
    {"name": "A", "flags": 4, "size": 11.0, "weight": 400},
    {"name": "A", "flags": 4, "size": 6.5, "weight": 400},
    {"name": "B", "flags": 1, "size": 11.0, "weight": 700},
]

_link_st = st.tuples(
    st.sampled_from(_GRID), st.sampled_from(_GRID),
    st.sampled_from([5.0, 20.0, 60.0]), st.sampled_from([5.0, 12.0]),
    st.sampled_from([None, 0, 1, 2]),            # dest_page
    st.sampled_from([None, (0.0, 0.0), (72.0, 100.0), (3.5, 3.5)]),
    st.sampled_from([None, "https://x.example/a"]),
)

_payload_st = st.builds(
    lambda chars, rotation, links: _payload(chars, rotation, links),
    st.lists(_char_st, max_size=40),
    st.sampled_from([0, 0, 0, 90, 180, 270]),
    st.lists(_link_st, max_size=3),
)


def _payload(chars, rotation, links):
    text = "".join(c[0] for c in chars)
    bbox = []
    rots = []
    fids = []
    for _, x1, y1, w, h, rot, fid in chars:
        bbox.extend([x1, y1, x1 + w, y1 + h])
        rots.append(rot)
        fids.append(fid)
    obj = {
        "kind": "chars",
        "page_bbox": [0.0, 0.0, 200.0, 300.0],
        "rotation": rotation,
        "text": text,
        "bbox": bbox,
        "charrot": rots if any(rots) else 0.0,
        "fonts": _FONTS,
        "font_id": fids,
    }
    if links:
        obj["links"] = [
            {"bbox": [x, y, x + w, y + h], "dest_page": dp,
             "dest_pos": list(pos) if pos else None, "url": url}
            for x, y, w, h, dp, pos, url in links
        ]
    return json.dumps(obj, ensure_ascii=False)


@given(texts=st.lists(_payload_st, min_size=1, max_size=4))
@settings(**SETTINGS)
def test_plain_and_struct_parity(texts):
    ids = list(range(len(texts)))
    outs = process_batch(texts, ["user"] * len(texts), ids,
                         ExtractConfig(keep_chars=True))
    regs = [(ids[i], *r) for i, o in enumerate(outs) for r in o.registrations]
    url_map, refs_by_page = resolve_conversation_refs(regs)
    for o in outs:
        rewrite_page_urls(o.page, url_map, refs_by_page)
    exp_plain = oracle_plain(texts, page_ids=ids)
    exp_pages = oracle_dictionary(texts, keep_chars=True, page_ids=ids)
    for o, ep, eg in zip(outs, exp_plain, exp_pages):
        assert o.text == ep
        for page in (eg, o.page):
            for blk in page["blocks"]:
                for ln in blk["lines"]:
                    for sp in ln["spans"]:
                        for c in sp.get("chars", []):
                            c.pop("font", None)
        r = deep_eq(o.page, eg)
        assert r is None, r


_table_payload_st = st.builds(
    lambda chars, rotation: _table_payload(chars, rotation),
    st.lists(_char_st, min_size=1, max_size=30),
    st.sampled_from([0, 90, 180, 270]),
)


def _table_payload(chars, rotation):
    obj = json.loads(_payload(chars, rotation, []))
    # one table covering the whole (rotated) page in image coords at 1.5x —
    # every line passes the containment filter, so the rotation-specific
    # cell-adjacency branches (tables.py:28-56) all get exercised
    pw, ph = 200.0, 300.0
    if rotation in (90, 270):
        pw, ph = ph, pw
    obj["tables"] = [[-10.0 * 1.5, -10.0 * 1.5, (pw + 10) * 1.5, (ph + 10) * 1.5]]
    obj["img_size"] = [pw * 1.5, ph * 1.5]
    return json.dumps(obj, ensure_ascii=False)


@given(texts=st.lists(_table_payload_st, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_table_clustering_parity(texts):
    from tests.oracle_naive import oracle_tables
    ids = list(range(len(texts)))
    outs = process_batch(texts, ["user"] * len(texts), ids,
                         ExtractConfig(keep_chars=True))
    exp = oracle_tables(texts, page_ids=ids)
    for o, e in zip(outs, exp):
        r = deep_eq(o.tables, e)
        assert r is None, r


_tbox_payload_st = st.builds(
    lambda chars, rotation, ql: (_tbox_payload(chars, rotation), ql),
    st.lists(_char_st, min_size=1, max_size=30),
    st.sampled_from([0, 0, 90, 180, 270]),
    st.booleans(),
)


def _tbox_payload(chars, rotation):
    obj = json.loads(_payload(chars, rotation, []))
    # tight boxes for every other char — exercised only where the loose-box
    # rule turns them on (rotated chars, bare quotes w/ quote_loosebox=False)
    tbox = {}
    for i in range(0, len(chars), 2):
        x1, y1 = chars[i][1], chars[i][2]
        tbox[str(i)] = [x1 + 0.5, y1 + 0.25, x1 + 2.0, y1 + 3.0]
    obj["tbox"] = tbox
    return json.dumps(obj, ensure_ascii=False)


@given(items=st.lists(_tbox_payload_st, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_tbox_loosebox_parity(items):
    """S3 tight-box substitution (chars.py:21-23): rotated chars and — with
    quote_loosebox=False — bare quotes take the char's tight box."""
    for ql in (True, False):
        texts = [t for t, _ in items]
        ids = list(range(len(texts)))
        outs = process_batch(texts, ["user"] * len(texts), ids,
                             ExtractConfig(keep_chars=True, quote_loosebox=ql))
        exp_pages = oracle_dictionary(texts, keep_chars=True,
                                      quote_loosebox=ql, page_ids=ids)
        for o, eg in zip(outs, exp_pages):
            for page in (eg, o.page):
                for blk in page["blocks"]:
                    for ln in blk["lines"]:
                        for sp in ln["spans"]:
                            for c in sp.get("chars", []):
                                c.pop("font", None)
            r = deep_eq(o.page, eg)
            assert r is None, r


def test_table_dynamic_gap_thresh_parity():
    """>100 same-span char pairs flips the A5 statistic from the default
    0.01 to a data-driven p80 (tables.py:8-25); check against the oracle
    at every rotation."""
    from tests.oracle_naive import oracle_tables
    texts = []
    for rotation in (0, 90, 180, 270):
        bbox, fids = [], []
        x = 0.0
        for i in range(140):
            w = 1.0
            bbox.extend([x, 10.0, x + w, 18.0])
            fids.append(0)
            # mostly tight gaps, every 12th char a wide one -> p80 small,
            # wide gaps exceed it and split cells
            x += w + (14.0 if i % 12 == 11 else 0.2)
        obj = {
            "kind": "chars", "page_bbox": [0.0, 0.0, max(x, 200.0), 300.0],
            "rotation": rotation, "text": "ab" * 70, "bbox": bbox,
            "charrot": 0.0, "fonts": _FONTS, "font_id": fids,
        }
        pw, ph = max(x, 200.0), 300.0
        if rotation in (90, 270):
            pw, ph = ph, pw
        obj["tables"] = [[-10.0, -10.0, (pw + 10) * 1.5, (ph + 10) * 1.5]]
        obj["img_size"] = [pw * 1.5, ph * 1.5]
        texts.append(json.dumps(obj))
    ids = list(range(len(texts)))
    outs = process_batch(texts, ["user"] * len(texts), ids,
                         ExtractConfig(keep_chars=True))
    exp = oracle_tables(texts, page_ids=ids)
    n_cells = 0
    for o, e in zip(outs, exp):
        r = deep_eq(o.tables, e)
        assert r is None, r
        n_cells += sum(len(t) for t in o.tables)
    assert n_cells > 4  # the split actually happened somewhere


@given(s=st.text(max_size=200))
@settings(**SETTINGS)
def test_postprocess_property(s):
    assert postprocess_text(s) == pp_text(s)


@given(s=st.text(alphabet=st.sampled_from(list("ab \x02\n\r\xa0\t")), max_size=80),
       keep=st.booleans())
@settings(**SETTINGS)
def test_hyphens_property(s, keep):
    assert handle_hyphens(s, keep) == hyphens_text(s, keep)


def _arrow_rows(texts, cfg):
    """Run the Arrow fast path (route_batch + assemble_record_batch) on an
    in-process RecordBatch — the exact code Spark's mapInArrow executes —
    and return python rows."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from pdftext_spark.core.api import route_batch
    from pdftext_spark.core.arrow_out import assemble_record_batch
    from pdftext_spark.operators.schema import EXTRACTED

    target = to_arrow_schema(EXTRACTED)
    n = len(texts)
    ids = list(range(n))
    batch = pa.RecordBatch.from_arrays([
        pa.array([f"c{i}" for i in ids]),
        pa.array(ids, pa.int32()),
        pa.array(["user"] * n),
        pa.array(texts),
        pa.array([0] * n, target.field("ts").type),
    ], names=["conv_id", "turn_idx", "role", "text", "ts"])
    rb = route_batch(texts, ["user"] * n, ids, cfg)
    return assemble_record_batch(batch, rb, cfg, target).to_pylist()


@given(texts=st.lists(_payload_st, min_size=1, max_size=4),
       keep_chars=st.booleans(), sort=st.booleans())
@settings(**SETTINGS)
def test_arrow_path_equals_dict_path(texts, keep_chars, sort):
    """The columnar Arrow assembly must be value-identical to the dict
    kernel for every flag combination, including link splits and
    keep_chars char gathers, on adversarial payloads."""
    cfg = ExtractConfig(keep_chars=keep_chars, sort=sort)
    rows = _arrow_rows(texts, cfg)
    outs = process_batch(texts, ["user"] * len(texts),
                         list(range(len(texts))), cfg)
    assert len(rows) == len(outs)
    for row, o in zip(rows, outs):
        assert row["text"] == o.text
        assert row["n_chars"] == o.n_chars
        assert row["n_spans"] == o.n_spans
        dests = [{"ord": r[0], "gid": r[1], "dest_page": r[2],
                  "x": r[3], "y": r[4]} for r in o.registrations]
        assert deep_eq(row["link_dests"], dests) is None
        exp_page = o.page
        if exp_page is not None:
            for blk in exp_page["blocks"]:
                for ln in blk["lines"]:
                    for sp in ln["spans"]:
                        if keep_chars:
                            for c in sp.get("chars", []):
                                c.pop("font", None)
                        else:
                            sp.setdefault("chars", None)
        r = deep_eq(row["page"], exp_page)
        assert r is None, r


@given(s=st.lists(st.sampled_from(
    list("<>/&;=\"' abcdiv!-[]CDATA\n\tspan") + ["<div", "<a href=", "</div>",
         "<script>", "</script>", "<!--", "-->", "<![CDATA[", "]]>", "&amp;",
         "<p>", "<body>", "<template>", "<br/>"]), max_size=120).map("".join))
@settings(**SETTINGS)
def test_html_tag_soup_never_crashes(s):
    """100 TB of scraped HTML contains every malformed construct there is;
    the scorer must always terminate and return a string, never raise."""
    from pdftext_spark.core.html_main import extract_main_text
    out = extract_main_text(s)
    assert isinstance(out, str)


@given(st.integers(0, 10**15), st.integers(0, 10**15))
@settings(**SETTINGS)
def test_mix_thresholds_properties(cw, cc):
    """sample_mix invariants for ANY group volumes: thresholds stay in
    [0, DENOM] (never upsample), a non-empty binding group keeps rate 1,
    an empty group rates 0, and the realized volume ratio honors the
    3:7 target direction (the web threshold satisfies
    tw*cw*7 <= tc*cc*3 + slack of one rounding unit scaled)."""
    from pdftext_spark.queries import _MIX_DENOM, _mix_thresholds

    tw, tc = _mix_thresholds(cw, cc)
    D = _MIX_DENOM
    assert 0 <= tw <= D and 0 <= tc <= D
    # empty group -> rate 0; the converse does not hold (under extreme
    # imbalance the non-binding rate legitimately floors to 0)
    if cw == 0:
        assert tw == 0
    if cc == 0:
        assert tc == 0
    if cw and cc:
        assert tw == D or tc == D          # one group always binds
        # floor-rounding may only UNDERSHOOT the non-binding group:
        # realized web:curated volume <= 3:7 when web is downsampled
        # (and symmetrically), never overshoot
        if tc == D:
            assert tw * cw * 7 <= D * cc * 3
        if tw == D:
            assert tc * cc * 3 <= D * cw * 7


@given(st.integers(1, 4000), st.integers(1, 4000), st.integers(0, 40),
       st.binary(max_size=200), st.integers(1, 512))
@settings(**SETTINGS)
def test_resize_media_properties(w, h, fr, body, max_dim):
    """resize_media invariants for ANY synthetic container: result dims
    respect the budget, output stays a decodable IMG1 payload with the
    frame count preserved, within-budget inputs pass through
    byte-identical, and resize is idempotent."""
    from pdftext_spark.operators.multimodal import decode_media, resize_media

    payload = f"IMG1;W={w};H={h};F={fr};".encode() + body
    out, nw, nh = resize_media(payload, max_dim)
    assert max(nw, nh) <= max(max_dim, 1)
    w2, h2, fr2, _ = decode_media(out)
    assert (w2, h2, fr2) == (nw, nh, fr)
    if max(w, h) <= max_dim:
        assert out == payload
    out2, nw2, nh2 = resize_media(out, max_dim)
    assert (out2, nw2, nh2) == (out, nw, nh)


@settings(**SETTINGS)
@given(st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=14)
      .map(lambda cs: " ".join(cs)),
    min_size=1, max_size=6))
def test_repeated_intervals_matches_naive_window_oracle(texts):
    """Suffix-array exact repeats == brute-force window counting: a
    position is covered iff its w-window (as a token tuple) occurs >= 2
    times across the corpus; intervals merge at gap > w. Tiny binary
    vocabulary forces dense repeat structure."""
    from collections import Counter

    from pdftext_spark.operators.substring import repeated_intervals

    w = 3
    toks = [t.split(" ") if t else [] for t in texts]
    toks = [[x for x in ts if x] for ts in toks]
    counts = Counter()
    for ts in toks:
        for i in range(len(ts) - w + 1):
            counts[tuple(ts[i:i + w])] += 1
    expected = []
    for di, ts in enumerate(toks):
        cov = [i + 1 for i in range(len(ts) - w + 1)
               if counts[tuple(ts[i:i + w])] >= 2]
        s = prev = None
        for p in cov:
            if s is None:
                s = prev = p
            elif p > prev + w:
                expected.append((di, s, prev + w - 1))
                s = prev = p
            else:
                prev = p
        if s is not None:
            expected.append((di, s, prev + w - 1))
    got = repeated_intervals(toks, w)
    assert sorted(got) == sorted(expected)
