"""HTML boilerplate stripping + DOM-heuristic main-content scoring.

Applied to tool-output turns (``role='tool'``), per BASELINE.json's
north_star. This operator has no pdftext reference — the heuristic is our
own, in the readability/boilerpipe tradition (tag pruning, text-density
and link-density scoring), implemented deterministically on the stdlib
``html.parser`` so the same bytes always give the same main text.

Contract (tested against generator-known fixtures):
- script/style/noscript/template/svg/iframe/head subtrees are removed;
- nav/header/footer/aside/form/button/menu subtrees count as boilerplate
  (never part of the winning candidate's emitted text);
- candidates are article/main/section/div/td/body elements; score =
  text_len * (1 - link_density) + 30 * #direct-paragraphs + 50 if the tag
  is article/main; the highest score wins, document order breaks ties;
- output: the winner's block-level texts (whitespace runs collapsed to a
  single space, trimmed), non-empty blocks joined by "\\n".
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

STRIP_TAGS = frozenset(
    "script style noscript template svg iframe head canvas object embed".split())
BOILERPLATE_TAGS = frozenset("nav header footer aside form button menu".split())
BLOCK_TAGS = frozenset(
    "p div article main section li td th h1 h2 h3 h4 h5 h6 pre blockquote "
    "tr ul ol table body br".split())
CANDIDATE_TAGS = frozenset("article main section div td body".split())
VOID_TAGS = frozenset("br hr img input meta link area base col source wbr".split())

_WS_RE = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "children", "parent")

    def __init__(self, tag: str, parent):
        self.tag = tag
        self.children: list = []  # _Node | str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None)
        self.cur = self.root
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.skip_depth:
            if tag not in VOID_TAGS:
                self.skip_depth += 1
            return
        if tag in STRIP_TAGS:
            self.skip_depth = 1
            return
        if tag in VOID_TAGS:
            self.cur.children.append(_Node(tag, self.cur))
            return
        node = _Node(tag, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_endtag(self, tag):
        if self.skip_depth:
            self.skip_depth -= 1
            return
        # close up to the nearest matching open tag (tolerant of bad nesting)
        node = self.cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cur = node.parent

    def handle_data(self, data):
        if not self.skip_depth and data:
            self.cur.children.append(data)


def _collect(node: _Node, stats: dict, in_link: bool, in_boiler: bool) -> None:
    for child in node.children:
        if isinstance(child, str):
            n = len(child.strip())
            if n and not in_boiler:
                stats["text"] += n
                if in_link:
                    stats["link"] += n
            continue
        if child.tag in BOILERPLATE_TAGS:
            _collect(child, stats, in_link, True)
        else:
            if child.tag == "p" and child is not None and not in_boiler and node is stats["self"]:
                stats["p"] += 1
            _collect(child, stats, in_link or child.tag == "a", in_boiler)


def _emit_blocks(node: _Node, blocks: list[list[str]]) -> None:
    for child in node.children:
        if isinstance(child, str):
            blocks[-1].append(child)
            continue
        if child.tag in BOILERPLATE_TAGS:
            continue
        is_block = child.tag in BLOCK_TAGS
        if is_block:
            blocks.append([])
        _emit_blocks(child, blocks)
        if is_block:
            blocks.append([])


def _walk_candidates(node: _Node, out: list[_Node]) -> None:
    for child in node.children:
        if isinstance(child, str):
            continue
        if child.tag in CANDIDATE_TAGS:
            out.append(child)
        _walk_candidates(child, out)


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML document (see module contract)."""
    if not html:
        return ""
    builder = _TreeBuilder()
    try:
        builder.feed(unescape_entities_safe(html))
        builder.close()
    except Exception:
        return ""
    candidates: list[_Node] = []
    _walk_candidates(builder.root, candidates)
    if not candidates:
        candidates = [builder.root]
    best = None
    best_score = float("-inf")
    for cand in candidates:
        stats = {"text": 0, "link": 0, "p": 0, "self": cand}
        _collect(cand, stats, False, False)
        if stats["text"] == 0:
            continue
        link_density = stats["link"] / stats["text"]
        score = stats["text"] * (1.0 - link_density) + 30.0 * stats["p"]
        if cand.tag in ("article", "main"):
            score += 50.0
        if score > best_score:
            best_score = score
            best = cand
    if best is None:
        return ""
    blocks: list[list[str]] = [[]]
    _emit_blocks(best, blocks)
    out = []
    for block in blocks:
        text = _WS_RE.sub(" ", "".join(block)).strip()
        if text:
            out.append(text)
    return "\n".join(out)


def unescape_entities_safe(html: str) -> str:
    # convert_charrefs already unescapes character data; this hook exists so
    # malformed numeric refs in attributes can't raise. unescape() on the
    # whole doc would corrupt markup, so it's intentionally a no-op.
    return html


__all__ = ["extract_main_text", "unescape"]
