"""Batch-level extraction API — the function the Spark layer maps over
Arrow batches, also directly callable in tests.

Routing per SURVEY.md §7.0: tool turns (``role='tool'``) carry HTML and go
through the boilerplate-strip/main-content scorer; everything else is a
char-stream payload (or plain prose, which degrades to a synthesized
monospace layout) and goes through the segmentation kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pdftext_spark.config import ExtractConfig
from pdftext_spark.core.assemble import plain_text_batch, struct_page
from pdftext_spark.core.html_main import extract_main_text
from pdftext_spark.core.links import merge_turn_links
from pdftext_spark.core.payload import decode_any_turn
from pdftext_spark.core.segment import Segmentation, segment_batch
from pdftext_spark.core.tables import table_cells_turn


@dataclass
class TurnOutput:
    text: str                      # plain-text render (merge_text(...).strip())
    page: Optional[dict] = None    # dictionary_output page (None for HTML turns)
    tables: list = field(default_factory=list)
    registrations: list = field(default_factory=list)  # (ord, dest_page, x, y)
    n_chars: int = 0
    n_spans: int = 0
    n_blocks: int = 0
    is_html: bool = False
    error: Optional[str] = None


def process_batch(texts: list, roles: list, turn_idxs: list,
                  cfg: ExtractConfig = ExtractConfig()) -> list[TurnOutput]:
    n = len(texts)
    outputs: list[Optional[TurnOutput]] = [None] * n

    doc_pos: list[int] = []
    decoded = []
    for i in range(n):
        if roles[i] == "tool":
            try:
                main = extract_main_text(texts[i] or "")
            except Exception as exc:  # defensive: never kill the batch
                outputs[i] = TurnOutput(text="", is_html=True, error=repr(exc))
                continue
            outputs[i] = TurnOutput(text=main, is_html=True)
        else:
            try:
                dt = decode_any_turn(texts[i], cfg.quote_loosebox)
            except Exception as exc:
                # A bad payload must not kill the whole Arrow batch at scale;
                # route it to the error/lineage channel instead.
                outputs[i] = TurnOutput(text="", error=repr(exc))
                continue
            doc_pos.append(i)
            decoded.append(dt)

    if decoded:
        seg = segment_batch(
            decoded,
            superscript_height_threshold=cfg.superscript_height_threshold,
            line_distance_threshold=cfg.line_distance_threshold,
            tolerance_factor=cfg.block_tolerance_factor,
        )
        plains = plain_text_batch(seg, cfg.sort, cfg.hyphens)
        want_extras = cfg.emit_struct or cfg.emit_tables
        span_start_mask = _span_start_mask(seg) if want_extras else None
        n_local = len(decoded)
        char_counts = np.bincount(seg.chars.turn_of, minlength=n_local)
        span_counts = np.bincount(seg.spans.turn, minlength=n_local)
        for local, i in enumerate(doc_pos):
            dt = decoded[local]
            page_id = int(turn_idxs[i])
            splits = None
            registrations: list = []
            if want_extras and not cfg.disable_links and dt.links:
                res = merge_turn_links(seg, local, page_id, dt.links)
                if res is not None:
                    splits = res.span_splits or None
                    registrations = res.registrations
                    if splits:
                        for ovs in splits.values():
                            for ov in ovs:
                                span_start_mask[ov["start"]] = True
            page = None
            if cfg.emit_struct:
                page = struct_page(seg, local, page_id, keep_chars=cfg.keep_chars,
                                   sort=cfg.sort, span_splits=splits)
            tables = []
            if cfg.emit_tables and dt.tables and dt.img_size:
                tables = table_cells_turn(
                    seg, local, dt.tables, dt.img_size, span_start_mask,
                    table_thresh=cfg.table_thresh, space_thresh=cfg.space_thresh)
            blo, bhi = int(seg.turn_block_lo[local]), int(seg.turn_block_hi[local])
            outputs[i] = TurnOutput(
                text=plains[local],
                page=page,
                tables=tables,
                registrations=registrations,
                n_chars=int(char_counts[local]),
                n_spans=int(span_counts[local]),
                n_blocks=bhi - blo,
            )
    return outputs  # type: ignore[return-value]


def _span_start_mask(seg: Segmentation) -> np.ndarray:
    mask = np.zeros(len(seg.chars.cps), dtype=bool)
    mask[seg.spans.start] = True
    return mask
