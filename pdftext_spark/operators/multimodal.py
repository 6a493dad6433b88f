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


# one definition of the synthetic IMG1 header, shared by both attach
# helpers so the mixed-corpus fixture can never drift from the pure one
_IMG1_HEADER_EXPR = (
    "concat('IMG1;W=', cast(64 + doc_id % 192 as string), ';H=', "
    "cast(48 + doc_id % 144 as string), ';F=', "
    "cast(1 + doc_id % 30 as string), ';')")


def attach_synthetic_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media column: ASCII header + the doc text bytes."""
    return docs.withColumn("media", F.expr(
        f"cast(concat({_IMG1_HEADER_EXPR}, text) as binary)"))


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
    return w, h, fr, _byte_features(payload[m.end():])


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


_AUD_HEADER_RE = re.compile(rb"^AUD1;SR=(\d+);CH=(\d+);")

MIXED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("error", T.StringType()),
])


def _byte_features(body: bytes) -> np.ndarray:
    if len(body) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(body, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    buckets = np.pad(arr, (0, pad)).reshape(FEATURE_DIM, -1)
    return buckets.mean(axis=1, dtype=np.float64).astype(np.float32)


def decode_audio(payload: bytes) -> tuple:
    """Decode one AUD1 payload → (sample_rate, channels, n_samples,
    feature). Second synthetic container family (header + u8 PCM body;
    n_samples = body bytes // channels): exists to prove the decode
    seam's FORMAT DISPATCH and error isolation on mixed corpora — a
    real deployment swaps the body transform for soundfile/ffmpeg."""
    m = _AUD_HEADER_RE.match(payload)
    if not m:
        raise NotImplementedError(
            "real audio decode requires an audio library (soundfile/"
            "ffmpeg) not available in this environment; only synthetic "
            "AUD1 payloads are decodable")
    sr, ch = int(m.group(1)), int(m.group(2))
    body = payload[m.end():]
    return sr, ch, len(body) // max(1, ch), _byte_features(body)


def attach_synthetic_mixed_media(docs: DataFrame) -> DataFrame:
    """Mixed-corpus fixture: by doc_id mod 4 → IMG1 (0, 1), AUD1 (2), or
    a REAL container magic (PNG, 3) that must hit the stub seam — the
    shape a crawl-derived media column actually has (mostly decodable,
    a tail of formats the fleet's decoder build doesn't handle)."""
    img = f"concat({_IMG1_HEADER_EXPR}, text)"
    aud = ("concat('AUD1;SR=', cast(8000 + (doc_id % 3) * 8000 as string), "
           "';CH=', cast(1 + doc_id % 2 as string), ';', text)")
    png = "concat(unhex('89504E470D0A1A0A'), cast(text as binary))"
    return docs.withColumn("media", F.expr(
        f"CASE WHEN doc_id % 4 = 2 THEN cast({aud} as binary) "
        f"WHEN doc_id % 4 = 3 THEN {png} "
        f"ELSE cast({img} as binary) END"))


def decode_mixed_df(media_df: DataFrame) -> DataFrame:
    """Format-dispatching decode over a MIXED media corpus: sniff the
    container magic per row, route to the matching decoder, and emit a
    PER-ROW ERROR CHANNEL instead of failing the task — at 100 TB a
    0.01% tail of exotic containers must not kill 8-hour stages, and
    the error column makes the undecodable tail a queryable table
    (GROUP BY error) rather than a log grep. Arrow-batched mapInPandas;
    unknown formats surface the stub seam's NotImplementedError text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MIXED_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                vals = dict.fromkeys(cols)
                vals["doc_id"] = doc_id
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    b = bytes(payload)
                    if b.startswith(b"IMG1;"):
                        vals["kind"] = "image"
                        (vals["width"], vals["height"], vals["n_frames"],
                         feat) = decode_media(b)
                    elif b.startswith(b"AUD1;"):
                        vals["kind"] = "audio"
                        (vals["sample_rate"], vals["channels"],
                         vals["n_samples"], feat) = decode_audio(b)
                    else:
                        raise NotImplementedError(
                            "no decoder for container magic "
                            f"{b[:4].hex()}")
                    vals["feature"] = feat.tolist()
                except (NotImplementedError, TypeError, ValueError) as e:
                    vals["error"] = f"{type(e).__name__}: {e}"[:200]
                for c in cols:
                    rows[c].append(vals[c])
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "media").mapInPandas(run, MIXED_SCHEMA)


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
