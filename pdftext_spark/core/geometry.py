"""Vectorized bbox geometry over ``(N, 4)`` float64 arrays.

Semantics match the reference Bbox class (SURVEY.md §1.1; reference
pdftext/schema.py:7-126) but operate on whole arrays at once — the same
vectorization the reference itself uses for its link join
(pdftext/pdf/utils.py:41-59).

Boxes are ``[x1, y1, x2, y2]`` in top-left-origin page coordinates.
"""

from __future__ import annotations

import numpy as np


def rotate_boxes(boxes: np.ndarray, page_w: float, page_h: float, rotation: int) -> np.ndarray:
    """Rotate boxes by the page rotation (schema.py:82-114).

    Only 0/90/180/270 are legal; anything else raises, matching
    schema.py:83-84. Output corners are min/max-normalized.
    """
    if rotation not in (0, 90, 180, 270):
        raise ValueError("Rotation must be one of [0, 90, 180, 270] degrees.")
    if len(boxes) == 0 or rotation == 0:
        return boxes
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if rotation == 90:
        nx1, ny1, nx2, ny2 = page_h - y2, x1, page_h - y1, x2
    elif rotation == 180:
        nx1, ny1, nx2, ny2 = page_w - x2, page_h - y2, page_w - x1, page_h - y1
    else:  # 270
        nx1, ny1, nx2, ny2 = y1, page_w - x2, y2, page_w - x1
    out = np.empty_like(boxes)
    out[:, 0] = np.minimum(nx1, nx2)
    out[:, 1] = np.minimum(ny1, ny2)
    out[:, 2] = np.maximum(nx1, nx2)
    out[:, 3] = np.maximum(ny1, ny2)
    return out


def normalize_boxes(boxes: np.ndarray) -> np.ndarray:
    """Min/max-normalize corners (chars.py:34)."""
    out = np.empty_like(boxes)
    out[:, 0] = np.minimum(boxes[:, 0], boxes[:, 2])
    out[:, 1] = np.minimum(boxes[:, 1], boxes[:, 3])
    out[:, 2] = np.maximum(boxes[:, 0], boxes[:, 2])
    out[:, 3] = np.maximum(boxes[:, 1], boxes[:, 3])
    return out


def rescale_boxes(boxes: np.ndarray, img_w: float, img_h: float, page_w: float, page_h: float) -> np.ndarray:
    """Rescale page-coordinate boxes to image coordinates (schema.py:116-126)."""
    scale = np.array([img_w / page_w, img_h / page_h, img_w / page_w, img_h / page_h])
    return boxes * scale


def envelope_reduceat(boxes: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment bbox envelope (min x1/y1, max x2/y2) for contiguous
    segments given their start offsets — the A1 merge fold
    (schema.py:58-64) over every segment at once."""
    lo = np.minimum.reduceat(boxes[:, :2], starts, axis=0)
    hi = np.maximum.reduceat(boxes[:, 2:], starts, axis=0)
    return np.hstack([lo, hi])


def intersection_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Dense N×M intersection-area matrix — the J1/J2 spatial-join kernel
    (pdf/utils.py:41-59)."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)))
    a = boxes1[:, None, :]
    b = boxes2[None, :, :]
    w = np.maximum(0.0, np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]))
    h = np.maximum(0.0, np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]))
    return w * h


def intersection_pct(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """Scalar intersection area / area(a) (schema.py:75-80); 0 when a is
    degenerate."""
    area = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    if area == 0:
        return 0.0
    w = max(0.0, min(box_a[2], box_b[2]) - max(box_a[0], box_b[0]))
    h = max(0.0, min(box_a[3], box_b[3]) - max(box_a[1], box_b[1]))
    return (w * h) / area


def ensure_nonzero_area(boxes: np.ndarray) -> np.ndarray:
    """Pad degenerate boxes: x2=max(x1, x2+1), y2=max(y1, y2+1)
    (schema.py:8-12)."""
    out = boxes.copy()
    out[:, 2] = np.maximum(out[:, 0], out[:, 2] + 1)
    out[:, 3] = np.maximum(out[:, 1], out[:, 3] + 1)
    return out


class Bbox:
    """Single-box convenience view over the vectorized kernels — the public
    geometry surface a user porting reference code expects (reference
    pdftext/schema.py:7-126). The engine itself never loops over these;
    everything hot runs on the ``(N, 4)`` array functions above."""

    __slots__ = ("bbox",)

    def __init__(self, bbox, ensure_nonzero_area: bool = False):
        b = [float(v) for v in bbox]
        if ensure_nonzero_area:
            b[2] = max(b[0], b[2] + 1)
            b[3] = max(b[1], b[3] + 1)
        self.bbox = b

    def __getitem__(self, item):
        return self.bbox[item]

    def __repr__(self):
        return f"Bbox({self.bbox})"

    def __eq__(self, other):
        return isinstance(other, Bbox) and self.bbox == other.bbox

    @property
    def height(self) -> float:
        return self.bbox[3] - self.bbox[1]

    @property
    def width(self) -> float:
        return self.bbox[2] - self.bbox[0]

    @property
    def area(self) -> float:
        return self.width * self.height

    @property
    def center(self) -> list:
        return [(self.bbox[0] + self.bbox[2]) / 2, (self.bbox[1] + self.bbox[3]) / 2]

    @property
    def size(self) -> list:
        return [self.width, self.height]

    @property
    def x_start(self) -> float:
        return self.bbox[0]

    @property
    def y_start(self) -> float:
        return self.bbox[1]

    @property
    def x_end(self) -> float:
        return self.bbox[2]

    @property
    def y_end(self) -> float:
        return self.bbox[3]

    def merge(self, other: "Bbox") -> "Bbox":
        """Envelope of the two boxes (schema.py:58-64)."""
        return Bbox([min(self.bbox[0], other.bbox[0]),
                     min(self.bbox[1], other.bbox[1]),
                     max(self.bbox[2], other.bbox[2]),
                     max(self.bbox[3], other.bbox[3])])

    def overlap_x(self, other: "Bbox") -> float:
        return max(0.0, min(self.bbox[2], other.bbox[2])
                    - max(self.bbox[0], other.bbox[0]))

    def overlap_y(self, other: "Bbox") -> float:
        return max(0.0, min(self.bbox[3], other.bbox[3])
                    - max(self.bbox[1], other.bbox[1]))

    def intersection_area(self, other: "Bbox") -> float:
        return self.overlap_x(other) * self.overlap_y(other)

    def intersection_pct(self, other: "Bbox") -> float:
        return intersection_pct(np.asarray(self.bbox), np.asarray(other.bbox))

    def rotate(self, page_width: float, page_height: float, rotation: int) -> "Bbox":
        out = rotate_boxes(np.asarray([self.bbox]), page_width, page_height, rotation)
        return Bbox(out[0].tolist())

    def rescale(self, img_size=None, page=None, *extra, img_w=None,
                img_h=None, page_w=None, page_h=None) -> "Bbox":
        """Reference signature (schema.py:116-126): ``rescale(img_size,
        page)`` where ``img_size`` is ``[w, h]`` and ``page`` is a dict
        with ``width``/``height`` keys — ported reference code calls it
        exactly that way. The legacy flat-scalar form is also accepted,
        positionally ``rescale(img_w, img_h, page_w, page_h)`` or by
        keyword."""
        if img_w is not None:
            pass  # keyword legacy form, all four given below
        elif len(extra) == 2:
            img_w, img_h = img_size, page
            page_w, page_h = extra
        elif not extra and page is not None:
            img_w, img_h = img_size[0], img_size[1]
            page_w, page_h = page["width"], page["height"]
        else:
            raise TypeError(
                "rescale expects (img_size, page_dict), "
                "(img_w, img_h, page_w, page_h), or the same by keyword")
        if None in (img_w, img_h, page_w, page_h):
            raise TypeError("rescale: missing dimension argument")
        out = rescale_boxes(np.asarray([self.bbox]), float(img_w),
                            float(img_h), float(page_w), float(page_h))
        return Bbox(out[0].tolist())
