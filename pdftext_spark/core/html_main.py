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


# Single-pass tokenizer: comments / doctype / processing instructions /
# end tags / start tags / text. Attributes are irrelevant to the scorer,
# so they are skipped without parsing (quoted '>' tolerated). ~10x faster
# than html.parser for this workload.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                                    # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"                          # cdata
    r"|<![^>]*>"                                           # doctype
    r"|<\?[^>]*>"                                          # proc. instruction
    r"|</([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>"                   # end tag
    r"|<([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"  # start
    r"|([^<]+)"                                            # text
    r"|<",                                                 # stray '<'
    re.S)

# raw-text elements whose content must not be tokenized as markup
_RAWTEXT = frozenset(("script", "style", "textarea", "title", "noscript",
                      "template"))


def _build_tree(html: str) -> _Node:
    root = _Node("#root", None)
    cur = root
    pos = 0
    n = len(html)
    lower = None  # lazily-lowered copy for raw-text close scans
    while pos < n:
        m = _TOKEN_RE.match(html, pos)
        if m is None:
            break
        pos = m.end()
        end_tag, start_tag, _attrs, self_close, text = m.group(1, 2, 3, 4, 5)
        if text is not None:
            if "&" in text:
                text = unescape(text)
            cur.children.append(text)
            continue
        if start_tag is not None:
            tag = start_tag.lower()
            if tag in _RAWTEXT:
                # swallow raw content up to the matching close tag
                if lower is None:
                    lower = html.lower()
                close = lower.find("</" + tag, pos)
                raw = html[pos:close if close != -1 else n]
                pos = n if close == -1 else lower.find(">", close) + 1 or n
                if tag not in STRIP_TAGS:
                    node = _Node(tag, cur)
                    if raw:
                        node.children.append(raw)
                    cur.children.append(node)
                continue
            if tag in STRIP_TAGS:
                # skip the whole subtree by depth counting; raw-text
                # children (a <script> inside <head>) are swallowed so '<'
                # inside them can't unbalance the count
                depth = 1
                while pos < n and depth:
                    m2 = _TOKEN_RE.match(html, pos)
                    if m2 is None:
                        break
                    pos = m2.end()
                    t2 = m2.group(2)
                    if t2 is not None:
                        t2 = t2.lower()
                        if t2 in _RAWTEXT and not m2.group(4):
                            if lower is None:
                                lower = html.lower()
                            close = lower.find("</" + t2, pos)
                            pos = n if close == -1 else (lower.find(">", close) + 1 or n)
                        elif t2 not in VOID_TAGS and not m2.group(4):
                            depth += 1
                    elif m2.group(1) is not None:
                        depth -= 1
                continue
            if tag in VOID_TAGS or self_close:
                cur.children.append(_Node(tag, cur))
                continue
            node = _Node(tag, cur)
            cur.children.append(node)
            cur = node
            continue
        if end_tag is not None:
            tag = end_tag.lower()
            # close up to the nearest matching open tag (tolerant nesting)
            node = cur
            while node is not None and node.tag != tag:
                node = node.parent
            if node is not None and node.parent is not None:
                cur = node.parent
            continue
        # comments/doctype/PI/stray '<': ignored
    return root


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
    try:
        root = _build_tree(html)
    except Exception:
        return ""
    candidates: list[_Node] = []
    _walk_candidates(root, candidates)
    if not candidates:
        candidates = [root]
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


__all__ = ["extract_main_text"]
