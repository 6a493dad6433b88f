"""Multimodal columns: opaque binary media with typed metadata and a
decode/feature-extract pipeline.

Media travels as an opaque ``binary`` column; all Spark plumbing (schema,
Arrow batch shape, partitioning) is real. The actual image/audio decode is
STUBBED — this container ships no PIL/cv2/ffmpeg — behind a clearly-marked
seam: synthetic ``IMG1;...`` payloads decode to deterministic fake
features, anything else raises NotImplementedError where a real decoder
would plug in.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADER_RE = re.compile(rb"^IMG1;W=(\d+);H=(\d+);F=(\d+);")

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_synthetic_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media column: ASCII header + the doc text bytes."""
    header = ("concat('IMG1;W=', cast(64 + doc_id % 192 as string), ';H=', "
              "cast(48 + doc_id % 144 as string), ';F=', "
              "cast(1 + doc_id % 30 as string), ';')")
    return docs.withColumn("media", F.expr(f"cast(concat({header}, text) as binary)"))


def decode_media(payload: bytes) -> tuple:
    """Decode one media payload → (width, height, n_frames, feature).

    STUB SEAM: a real deployment replaces the body below the header parse
    with e.g. ``PIL.Image.open(io.BytesIO(payload))``; here only the
    synthetic container is understood and the feature vector is a
    deterministic function of the bytes (byte-bucket means), so tests can
    assert exact values.
    """
    m = _HEADER_RE.match(payload)
    if not m:
        raise NotImplementedError(
            "real media decode requires an image library (PIL/cv2) not "
            "available in this environment; only synthetic IMG1 payloads "
            "are decodable")
    w, h, fr = (int(m.group(i)) for i in (1, 2, 3))
    body = np.frombuffer(payload[m.end():], dtype=np.uint8)
    if len(body) == 0:
        feat = np.zeros(FEATURE_DIM, dtype=np.float32)
    else:
        pad = (-len(body)) % FEATURE_DIM
        buckets = np.pad(body, (0, pad)).reshape(FEATURE_DIM, -1)
        feat = buckets.mean(axis=1, dtype=np.float64).astype(np.float32)
    return w, h, fr, feat


def decode_media_df(media_df: DataFrame) -> DataFrame:
    """mapInPandas decode over (doc_id, media) — Arrow-batched, one Python
    round-trip, errors isolated per row (bad payloads yield null feature)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "n_frames": [],
                    "feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    w, h, fr, feat = decode_media(bytes(payload))
                except (NotImplementedError, TypeError, ValueError):
                    # per-row isolation: undecodable/null payloads yield a
                    # null-feature row (TypeError covers non-bytes cells a
                    # join or schema drift can produce)
                    w = h = fr = None
                    feat = None
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(fr)
                rows["feature"].append(None if feat is None else feat.tolist())
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "media").mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_media(payload: bytes, max_dim: int) -> tuple:
    """Resize one payload so max(width, height) <= max_dim → (payload,
    width, height).

    STUB SEAM (same contract as decode_media): a real deployment swaps
    the body transform for ``PIL.Image.resize``; the synthetic container
    scales its header dims by the integer-ceil factor and strides the
    body bytes by that factor, so the output is deterministic, smaller
    by ~the area ratio, and still a valid IMG1 payload (resize then
    decode composes). Payloads already within budget pass through
    byte-identical (idempotence)."""
    m = _HEADER_RE.match(payload)
    if not m:
        raise NotImplementedError(
            "real media resize requires an image library (PIL/cv2) not "
            "available in this environment; only synthetic IMG1 payloads "
            "are resizable")
    w, h, fr = (int(m.group(i)) for i in (1, 2, 3))
    if max(w, h) <= max_dim:
        return payload, w, h
    k = -(-max(w, h) // max_dim)          # ceil divide: shrink factor
    nw, nh = max(1, w // k), max(1, h // k)
    body = payload[m.end():]
    header = f"IMG1;W={nw};H={nh};F={fr};".encode()
    return header + body[::k], nw, nh


def resize_media_df(media_df: DataFrame, max_dim: int = 128) -> DataFrame:
    """mapInPandas resize over (doc_id, media): binary in, binary out,
    one Arrow round trip, per-row error isolation (undecodable/null
    payloads yield a null media row rather than failing the task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media": [], "width": [], "height": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    out, w, h = resize_media(bytes(payload), max_dim)
                except (NotImplementedError, TypeError, ValueError):
                    out = w = h = None
                rows["doc_id"].append(doc_id)
                rows["media"].append(out)
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "media").mapInPandas(run, RESIZED_SCHEMA)
