"""Table-cell text clustering (A5, J4, W8, P6, O1 on cells).

Reference: pdftext/tables.py. Operates on one turn's segmentation plus the
payload-provided table regions (`tables`: bboxes in image coordinates,
`img_size`: [w, h]) — the analog of TableInput (schema.py:177-179).

The link-split structure matters: the dynamic-gap statistic (A5,
tables.py:8-25) only looks at consecutive chars *within the same span*,
and splits remove pairs from that statistic. Callers pass the effective
span-start mask (base spans ∪ link splits) to reproduce that.
"""

from __future__ import annotations

import numpy as np

from pdftext_spark.core.assemble import sort_order
from pdftext_spark.core.geometry import rescale_boxes
from pdftext_spark.core.segment import Segmentation


def dynamic_gap_thresh(seg: Segmentation, turn: int, img_size: list,
                       effective_span_start: np.ndarray,
                       default_thresh: float = 0.01, min_chars: int = 100) -> float:
    """A5 — p80 of rotation-aware inter-char gaps when >min_chars samples
    (tables.py:8-25). Gaps use PAGE coordinates divided by image dims,
    exactly as the reference does."""
    cb = seg.chars
    dt = cb.turns[turn]
    c_lo = int(seg.turn_char_lo[turn])
    c_hi = int(seg.turn_char_hi[turn])
    if c_lo >= c_hi:
        return default_thresh
    boxes = cb.boxes[c_lo:c_hi]
    # consecutive pairs within the same (post-split) span
    pair = ~effective_span_start[c_lo:c_hi]
    pair[0] = False
    prev = np.roll(boxes, 1, axis=0)
    rot = dt.rotation
    if rot == 90:
        dists = (boxes[:, 0] - prev[:, 2]) / img_size[0]
    elif rot == 180:
        dists = (boxes[:, 1] - prev[:, 3]) / img_size[1]
    elif rot == 270:
        dists = (prev[:, 0] - boxes[:, 2]) / img_size[0]
    else:
        dists = (prev[:, 1] - boxes[:, 3]) / img_size[1]
    samples = dists[pair]
    if len(samples) > min_chars:
        return float(np.percentile(samples, 80))
    return default_thresh


def _same_cell(bbox, curr_box, img_size, space_thresh, rotation) -> bool:
    """W8 adjacency predicate (tables.py:28-56), including the
    divides-by-height quirk in the third condition."""
    iw, ih = img_size[0], img_size[1]
    if rotation == 90:
        return ((bbox[0] - curr_box[0]) / iw < space_thresh
                and abs(bbox[1] - curr_box[3]) / ih < space_thresh
                and abs(bbox[0] - curr_box[0]) / iw < space_thresh * 5)
    if rotation == 180:
        return ((bbox[2] - curr_box[0]) / iw < space_thresh
                and abs(bbox[1] - curr_box[1]) / ih < space_thresh
                and abs(bbox[2] - curr_box[0]) / ih < space_thresh * 5)
    if rotation == 270:
        return ((bbox[0] - curr_box[0]) / iw < space_thresh
                and abs(bbox[3] - curr_box[1]) / ih < space_thresh
                and abs(bbox[0] - curr_box[0]) / ih < space_thresh * 5)
    return ((bbox[0] - curr_box[2]) / iw < space_thresh
            and abs(bbox[1] - curr_box[1]) / ih < space_thresh
            and abs(bbox[0] - curr_box[2]) / ih < space_thresh * 5)


def table_cells_turn(seg: Segmentation, turn: int, tables: list, img_size: list,
                     effective_span_start: np.ndarray,
                     table_thresh: float = 0.8, space_thresh: float = 0.01,
                     min_chars: int = 100) -> list:
    """table_cell_text for one turn (tables.py:59-110) → list of tables,
    each a list of {"text", "bbox"} cells in reading order."""
    cb = seg.chars
    dt = cb.turns[turn]
    rotation = dt.rotation
    page_w, page_h = dt.page_width, dt.page_height
    if rotation in (90, 270):
        # table_output reads the dictionary page's post-rotation dims
        # (extraction.py:128-129 swaps width/height before tables.py uses them)
        page_w, page_h = page_h, page_w
    iw, ih = float(img_size[0]), float(img_size[1])

    space_thresh = max(space_thresh,
                       dynamic_gap_thresh(seg, turn, img_size, effective_span_start,
                                          default_thresh=space_thresh,
                                          min_chars=min_chars))

    # lines of this turn with their char ranges (lines.turn is sorted)
    line_ids = range(int(seg.turn_line_lo[turn]), int(seg.turn_line_hi[turn]))
    out_tables = []
    for table in tables:
        tb = [float(v) for v in table]
        cells: list[dict] = []
        for li in line_ids:
            lb = rescale_boxes(seg.lines.bbox[li:li + 1], iw, ih, page_w, page_h)[0]
            area = (lb[2] - lb[0]) * (lb[3] - lb[1])
            if area == 0:
                continue  # intersection_pct of a degenerate box is 0 (schema.py:76-77)
            w = max(0.0, min(lb[2], tb[2]) - max(lb[0], tb[0]))
            h = max(0.0, min(lb[3], tb[3]) - max(lb[1], tb[1]))
            if (w * h) / area < table_thresh:
                continue  # J4 containment filter (tables.py:74-76)
            a = int(seg.spans.start[int(seg.lines.start[li])])
            b = int(seg.spans.end[int(seg.lines.end[li]) - 1])
            # plain-float rows: the per-char loop below does only scalar
            # compares/min/max, and numpy row indexing + numpy-scalar
            # arithmetic cost ~3x the same ops on Python floats
            bl = rescale_boxes(cb.boxes[a:b], iw, ih, page_w, page_h).tolist()
            gt = cb.gtext
            curr_lo = a  # cell chars are consecutive: text is a slice
            curr_box = None
            for ci in range(a, b):
                bbox = bl[ci - a]
                # clustering persists across span boundaries within a line
                # (tables.py:79-97 resets curr_span only per line); the
                # adjacency test is what separates cells.
                if curr_box is None:
                    curr_lo = ci
                    curr_box = list(bbox)
                elif _same_cell(bbox, curr_box, img_size, space_thresh,
                                rotation):
                    if bbox[0] < curr_box[0]:
                        curr_box[0] = bbox[0]
                    if bbox[1] < curr_box[1]:
                        curr_box[1] = bbox[1]
                    if bbox[2] > curr_box[2]:
                        curr_box[2] = bbox[2]
                    if bbox[3] > curr_box[3]:
                        curr_box[3] = bbox[3]
                else:
                    text = gt[curr_lo:ci]
                    if text.strip():
                        cells.append({"text": text, "bbox": curr_box})
                    curr_lo = ci
                    curr_box = list(bbox)
            if curr_box is not None:
                text = gt[curr_lo:b]
                if text.strip():
                    cells.append({"text": text, "bbox": curr_box})
        # translate to table-relative coords (tables.py:100-107)
        for cell in cells:
            cell["bbox"] = [cell["bbox"][0] - tb[0], cell["bbox"][1] - tb[1],
                            cell["bbox"][2] - tb[0], cell["bbox"][3] - tb[1]]
        order = sort_order([c["bbox"] for c in cells])
        out_tables.append([cells[i] for i in order])
    return out_tables
