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


class _Node:
    __slots__ = ("tag", "children", "parent", "text", "link", "p")

    def __init__(self, tag: str, parent):
        self.tag = tag
        self.children: list = []  # _Node | str
        self.parent = parent
        # subtree stats, filled by one bottom-up pass in _fill_stats:
        self.text = 0   # non-boilerplate text chars in the subtree
        self.link = 0   # of those, chars under an <a>
        self.p = 0      # direct <p> children


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


_WS = (" ", "\t", "\n", "\r", "\f")
# attr name, '=', then a COMPLETE quoted value — the only way a closing
# quote directly before '/' really ends a value (html5 attribute states)
_QUOTED_VALUE_RE = re.compile(r"[^\s=\"']+=(\"[^\"]*\"|'[^']*')\Z")


def _self_close(attrs: str) -> bool:
    """True when the attrs text ends in a self-closing solidus.

    HTML5 only treats the '/' before '>' as self-close when it is a
    standalone solidus: in ``<a href=http://x.com/>`` the '/' is the last
    character of the *unquoted attribute value* and the tag stays open.
    A '/' preceded by whitespace, a complete quoted value, or the tag
    name itself (``<br/>``), or one terminating a bare attribute name
    (``<br foo/>``, solidus ends the name per the attribute-name state)
    self-closes. Two subtleties from review: whitespace after '=' is
    skipped in the before-attribute-value state, so in
    ``<a href= http://x.com/>`` the value token does not itself contain
    '=' — the PRECEDING token ending in '=' marks it as value data; and
    a quote INSIDE an unquoted value (``<a href=ab"/>``) is value data,
    so a quote directly before '/' self-closes only when the tail token
    is a complete name="value" pair.
    """
    if not attrs.endswith("/"):
        return False
    prev = attrs[-2:-1]
    if prev == "" or prev in _WS:
        return True
    body = attrs[:-1]
    tokens = body.split()
    tail = tokens[-1] if tokens else ""
    if prev in ('"', "'"):
        # search the body, not the tail token: quoted values may contain
        # whitespace ('href="x y"')
        return bool(_QUOTED_VALUE_RE.search(body))
    if "=" in tail:
        return False  # '/' ends an unquoted attr=value token: value data
    # whitespace-separated unquoted value: <a href= VALUE/> — the token
    # before the value ends with '='
    if len(tokens) >= 2 and tokens[-2].endswith("="):
        return False
    return True


def _fold(node: _Node, parent: _Node) -> None:
    """Accumulate a closing node's subtree stats into its parent —
    boilerplate subtrees contribute nothing to any ancestor; text under
    an <a> (boilerplate excluded) is link text; p counts direct children
    only. Folding each node exactly once at close time replaces the old
    whole-tree _fill_stats pass (verified equal on the fixture corpus)."""
    tag = node.tag
    if tag not in BOILERPLATE_TAGS:
        parent.text += node.text
        parent.link += node.text if tag == "a" else node.link
        if tag == "p":
            parent.p += 1


def _build_tree_stats(html: str) -> tuple[_Node, list[_Node]]:
    """One finditer-driven pass building the tree, the per-node subtree
    stats AND the candidate list (in document pre-order = start-tag
    order). Every token position is matched by some alternative of
    _TOKEN_RE, so a finditer walk yields exactly the token sequence of
    the old match-at-pos loop while skipping two Python calls per token;
    the only absolute jumps (raw-text close scans) restart the iterator.
    A strip-subtree skip is a mode (strip_depth > 0) of the same loop so
    it survives those restarts."""
    root = _Node("#root", None)
    cur = root
    cands: list[_Node] = []
    pos = 0
    n = len(html)
    lower = None  # lazily-lowered copy for raw-text close scans
    strip_depth = 0
    restart = True
    while restart:
        restart = False
        for m in _TOKEN_RE.finditer(html, pos):
            # dispatch on lastindex: 1 = end tag, 4 = start tag (groups
            # 3/4 always participate), 5 = text, None = comment/doctype/
            # PI/stray '<'
            li = m.lastindex
            if strip_depth:
                # skip the whole boilerplate subtree by depth counting;
                # raw-text children (a <script> inside <head>) are
                # swallowed so '<' inside them can't unbalance the count
                if li == 4:
                    t2 = m.group(2).lower()
                    e2 = m.end()
                    sc2 = (html[e2 - 2] == "/"
                           and (bool(m.group(4)) or _self_close(m.group(3))))
                    if t2 in _RAWTEXT and not sc2:
                        if lower is None:
                            lower = html.lower()
                        close = lower.find("</" + t2, e2)
                        pos = n if close == -1 else (lower.find(">", close) + 1 or n)
                        restart = True
                        break
                    if t2 not in VOID_TAGS and not sc2:
                        strip_depth += 1
                elif li == 1 and m.group(1).lower() not in VOID_TAGS:
                    # spurious end tags of void elements (</meta>, </br>)
                    # never had a matching open counted above —
                    # decrementing on them would end the strip early and
                    # leak stripped content (e.g. <title> text)
                    strip_depth -= 1
                continue
            if li == 5:
                text = m.group(5)
                if "&" in text:
                    text = unescape(text)
                cur.children.append(text)
                stripped = text.strip()
                if stripped:
                    cur.text += len(stripped)
                continue
            if li == 4:
                end = m.end()
                # the greedy attribute group absorbs a trailing '/', so
                # the explicit (/?) group never fires; _self_close decides
                # whether that trailing '/' is a solidus or unquoted-value
                # data. The raw char before '>' gates both: when it isn't
                # '/', the tag cannot self-close and the attrs substring
                # (group 3) never needs materializing — the common case.
                self_close = (html[end - 2] == "/"
                              and (bool(m.group(4)) or _self_close(m.group(3))))
                tag = m.group(2).lower()
                if tag in _RAWTEXT:
                    # swallow raw content up to the matching close tag
                    if lower is None:
                        lower = html.lower()
                    close = lower.find("</" + tag, end)
                    raw = html[end:close if close != -1 else n]
                    pos = n if close == -1 else lower.find(">", close) + 1 or n
                    if tag not in STRIP_TAGS:
                        node = _Node(tag, cur)
                        if raw:
                            node.children.append(raw)
                            stripped = raw.strip()
                            if stripped:
                                node.text = len(stripped)
                        cur.children.append(node)
                        _fold(node, cur)
                    restart = True
                    break
                if tag in STRIP_TAGS:
                    strip_depth = 1
                    continue
                if tag in VOID_TAGS or self_close:
                    node = _Node(tag, cur)
                    cur.children.append(node)
                    if tag in CANDIDATE_TAGS:
                        cands.append(node)
                    _fold(node, cur)
                    continue
                node = _Node(tag, cur)
                cur.children.append(node)
                if tag in CANDIDATE_TAGS:
                    cands.append(node)
                cur = node
                continue
            if li == 1:
                tag = m.group(1).lower()
                # close up to the nearest matching open tag (tolerant
                # nesting); every implicitly-closed node folds into ITS
                # parent, innermost first
                node = cur
                while node is not None and node.tag != tag:
                    node = node.parent
                if node is not None and node.parent is not None:
                    c = cur
                    while True:
                        _fold(c, c.parent)
                        if c is node:
                            break
                        c = c.parent
                    cur = node.parent
                continue
            # comments/doctype/PI/stray '<': ignored
    # EOF: fold the still-open chain so ancestors (and root) see it
    while cur.parent is not None:
        _fold(cur, cur.parent)
        cur = cur.parent
    return root, cands


def _build_tree(html: str) -> _Node:
    """Tree-only view of _build_tree_stats (kept for tests/debugging);
    node stats come back pre-filled."""
    return _build_tree_stats(html)[0]


def _emit_blocks(node: _Node, blocks: list[list[str]]) -> None:
    """Winner-subtree text grouped into blocks; iterative for deep pages.
    The stack holds strings (text), _Node (to descend), and None (block
    close marker emitted after a block element's children)."""
    stack: list = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if child is None:
            blocks.append([])
            continue
        if isinstance(child, str):
            blocks[-1].append(child)
            continue
        if child.tag in BOILERPLATE_TAGS:
            continue
        if child.tag in BLOCK_TAGS:
            blocks.append([])
            stack.append(None)
        for gc in reversed(child.children):
            stack.append(gc)


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML document (see module contract)."""
    if not html:
        return ""
    try:
        root, candidates = _build_tree_stats(html)
    except Exception:
        return ""
    if not candidates:
        candidates = [root]
    best = None
    best_score = float("-inf")
    for cand in candidates:
        if cand.text == 0:
            continue
        link_density = cand.link / cand.text
        score = cand.text * (1.0 - link_density) + 30.0 * cand.p
        if cand.tag in ("article", "main"):
            score += 50.0
        if score > best_score:
            best_score = score
            best = cand
    if best is None:
        # candidates existed but all were text-empty (spacer divs, ad
        # slots): fall back to the whole document like the no-candidates
        # path, instead of dropping content that lives outside candidate
        # containers
        if root.text == 0:
            return ""
        best = root
    blocks: list[list[str]] = [[]]
    _emit_blocks(best, blocks)
    out = []
    for block in blocks:
        # identical to re.sub(r"\s+", " ", s).strip(): str.split() splits
        # on the same whitespace set and drops leading/trailing — but runs
        # in one C pass instead of a regex scan (measured ~2x on this slice)
        text = " ".join("".join(block).split())
        if text:
            out.append(text)
    return "\n".join(out)


__all__ = ["extract_main_text"]
