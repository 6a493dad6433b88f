"""Text postprocessing — exact parity with the reference's string pipeline.

Reference semantics (SURVEY.md §2.8):
- postprocess_text: ``\\r\\n``->``\\n``, special-char map, control-char
  filter, ligature expansion, in that order
  (reference pdftext/postprocessing.py:22-28).
- special chars: SPACES {" ", U+FFFE, U+FEFF, NBSP} -> " ";
  LINE_BREAKS {"\\n", "\\r"} -> "\\n"; TABS {"\\t"} -> "\\t"
  (pdftext/pdf/utils.py:8-11, postprocessing.py:56-63).
- control-char filter: drop Unicode category C* except the hyphen
  sentinel \\x02 and {"\\n","\\r","\\f","\\t"," "} — MUST use Python
  ``unicodedata`` categories, not Java regex classes
  (postprocessing.py:66-67).
- ligatures: ff/ffi/ffl/fi/fl/st/st expansion (postprocessing.py:7-15).
- handle_hyphens(keep=True): ``\\x02`` -> ``-\\n`` (postprocessing.py:32-33).
- handle_hyphens(keep=False): stateful scan with two parity quirks we
  reproduce bit-for-bit: (a) the scan runs over ``range(len(text)-1)`` so
  the final input character is always dropped; (b) the found-hyphen flag
  stays set until a SPACE character arrives — line breaks are skipped and
  word characters are appended while the flag is still set
  (postprocessing.py:31-53).

Implementation note: because every special/ligature source is a single
codepoint, steps 2-4 of postprocess_text compose into ONE ``str.translate``
table (each source char maps to its final fate: replacement string, or
None for deleted control chars). The \\r\\n collapse must stay a separate
first pass since it is a 2-char pattern. This keeps the hot path a single
C-level pass per string.
"""

from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache

HYPHEN_SENTINEL = "\x02"

SPACE_CHARS = (" ", "￾", "﻿", "\xa0")
LINE_BREAK_CHARS = ("\n", "\r")
TAB_CHARS = ("\t",)
KEPT_WHITESPACE = frozenset(["\n", "\r", "\f", "\t", " "])

LIGATURE_MAP = {
    "ﬀ": "ff",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬆ": "st",
    "ﬅ": "st",
}


@lru_cache(maxsize=1)
def _postprocess_table() -> dict:
    """Combined translate table for special chars + control filter + ligatures.

    Built once per Python worker (worker reuse amortizes the full-plane
    unicodedata scan, ~0.5 s). Precedence mirrors the reference's pass
    order: special-char replacement happens before the control filter, so
    U+FFFE (Cn) and U+FEFF (Cf) become spaces rather than being dropped.
    """
    table: dict[int, str | None] = {}
    # Control chars -> delete (category C*), minus the exceptions.
    for cp in range(sys.maxunicode + 1):
        ch = chr(cp)
        if unicodedata.category(ch)[0] == "C" and ch != HYPHEN_SENTINEL and ch not in KEPT_WHITESPACE:
            table[cp] = None
    # Specials override (replacement results all survive the filter).
    for ch in SPACE_CHARS:
        table[ord(ch)] = " "
    for ch in LINE_BREAK_CHARS:
        table[ord(ch)] = "\n"
    for ch in TAB_CHARS:
        table[ord(ch)] = "\t"
    for src, dst in LIGATURE_MAP.items():
        table[ord(src)] = dst
    return table


def postprocess_text(text: str) -> str:
    """F1+F2+F3+F4 (postprocessing.py:22-28) as two C-level passes."""
    return text.replace("\r\n", "\n").translate(_postprocess_table())


def handle_hyphens(text: str, keep_hyphens: bool = False) -> str:
    """F5/F6 (postprocessing.py:31-53), quirks reproduced exactly."""
    if keep_hyphens:
        return text.replace(HYPHEN_SENTINEL, "-\n")
    if not text:
        return text
    pieces: list[str] = []
    joining = False  # reference's found_hyphen flag
    # Parity quirk: the reference iterates range(len(text)-1), dropping the
    # last input character unconditionally.
    for ch in text[:-1]:
        if ch == HYPHEN_SENTINEL:
            joining = True
        elif joining:
            if ch in LINE_BREAK_CHARS:
                continue
            if ch in SPACE_CHARS:
                # rstrip accumulated text, then a single newline
                joined = "".join(pieces).rstrip()
                pieces = [joined, "\n"]
                joining = False
            else:
                pieces.append(ch)
        else:
            pieces.append(ch)
    return "".join(pieces)


def merge_line_text(span_texts: list[str]) -> str:
    """Per-line assembly inside merge_text (postprocessing.py:104-107)."""
    return postprocess_text("".join(span_texts)).rstrip() + "\n"


def finish_block_text(line_texts: list[str]) -> str:
    """Per-block assembly (postprocessing.py:109-110)."""
    return "".join(line_texts).rstrip() + "\n\n"


def finish_page_text(block_texts: list[str], hyphens: bool) -> str:
    """Page-level hyphen handling (postprocessing.py:112)."""
    return handle_hyphens("".join(block_texts), keep_hyphens=hyphens)


def span_output_text(text: str) -> str:
    """F8 — dictionary-output span text always keeps hyphens
    (extraction.py:85)."""
    return handle_hyphens(postprocess_text(text), keep_hyphens=True)


def is_math_symbol(ch: str) -> bool:
    """Unicode Sm check (pages.py:15-20)."""
    return len(ch) == 1 and unicodedata.category(ch) == "Sm"


def script_text_ok(text: str) -> bool:
    """Text gate for super/subscript flagging (pages.py:51-55):
    stripped text is a single char or all digits, AND alnum or a math
    symbol."""
    t = text.strip()
    return (len(t) == 1 or t.isdigit()) and (t.isalnum() or is_math_symbol(t))
