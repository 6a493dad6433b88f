"""Multimodal decode plumbing + Structured Streaming ingest tests."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdftext_spark.operators.multimodal import (
    attach_synthetic_media,
    decode_media,
    decode_media_df,
    resize_media,
    resize_media_df,
)


def test_decode_media_deterministic():
    payload = b"IMG1;W=100;H=50;F=4;" + bytes(range(16))
    w, h, fr, feat = decode_media(payload)
    assert (w, h, fr) == (100, 50, 4)
    assert len(feat) == 8
    # byte-bucket means of 0..15 over 8 buckets of 2
    assert feat.tolist() == [0.5, 2.5, 4.5, 6.5, 8.5, 10.5, 12.5, 14.5]


def test_decode_media_stub_seam():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n....")  # real image → stubbed


def test_resize_media_semantics():
    """Over-budget payloads shrink by the integer-ceil factor with a
    strided body (still a decodable IMG1 container); within-budget
    payloads pass through byte-identical; real formats hit the stub."""
    body = bytes(range(20))
    payload = b"IMG1;W=300;H=100;F=2;" + body
    out, w, h = resize_media(payload, 128)
    assert (w, h) == (100, 33)          # k = ceil(300/128) = 3
    assert out == b"IMG1;W=100;H=33;F=2;" + body[::3]
    w2, h2, fr2, _ = decode_media(out)  # resize→decode composes
    assert (w2, h2, fr2) == (100, 33, 2)
    small = b"IMG1;W=64;H=48;F=1;" + body
    assert resize_media(small, 128) == (small, 64, 48)   # idempotent
    with pytest.raises(NotImplementedError):
        resize_media(b"\x89PNG\r\n\x1a\n....", 128)


def test_resize_media_df(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 40), (2, "y")], "doc_id long, text string")
    media = attach_synthetic_media(docs)
    out = {r["doc_id"]: r for r in
           resize_media_df(media, max_dim=50).orderBy("doc_id").collect()}
    # doc 1: header W=65,H=49 -> k=ceil(65/50)=2 -> 32x24
    assert (out[1]["width"], out[1]["height"]) == (32, 24)
    local, lw, lh = resize_media(
        bytes(media.where("doc_id = 1").collect()[0]["media"]), 50)
    assert bytes(out[1]["media"]) == local  # Spark path == local stub
    bad = spark.createDataFrame([(9, bytearray(b"\x89PNG..."))],
                                "doc_id long, media binary")
    r = resize_media_df(bad).collect()[0]
    assert r["media"] is None and r["width"] is None


def test_decode_media_df(spark, tmp_path):
    docs = spark.createDataFrame([(1, "abc"), (2, "defgh")], "doc_id long, text string")
    media = attach_synthetic_media(docs)
    out = decode_media_df(media).orderBy("doc_id").collect()
    assert out[0]["width"] == 65 and out[0]["height"] == 49
    assert out[1]["n_frames"] == 3
    # exact parity with the local stub
    row = media.where("doc_id = 1").collect()[0]
    _, _, _, feat = decode_media(bytes(row["media"]))
    assert np.allclose(out[0]["feature"], feat)
    # a non-synthetic payload yields nulls, not a task failure
    bad = spark.createDataFrame([(9, bytearray(b"\x89PNG..."))],
                                "doc_id long, media binary")
    r = decode_media_df(bad).collect()[0]
    assert r["feature"] is None and r["width"] is None


def test_streaming_incremental_ingest(spark, fixture_dir, tmp_path):
    from pdftext_spark.streaming.stream_job import read_stream_output, run_stream
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    full = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    half_a = full.where("pmod(xxhash64(conv_id), 2) = 0")
    half_b = full.where("pmod(xxhash64(conv_id), 2) = 1")
    half_a.write.mode("overwrite").parquet(os.path.join(src, "batch_a"))
    # file-source streams need flat files in the watched dir
    _flatten(os.path.join(src, "batch_a"), src, "a")
    run_stream(spark, src, out, ckpt)
    n1 = read_stream_output(spark, out).count()
    assert n1 == half_a.count()
    half_b.write.mode("overwrite").parquet(os.path.join(src, "batch_b"))
    _flatten(os.path.join(src, "batch_b"), src, "b")
    run_stream(spark, src, out, ckpt)
    df2 = read_stream_output(spark, out)
    assert "epoch" not in df2.columns  # idempotency key, not data
    n2 = df2.count()
    assert n2 == full.count()  # only the new files were processed (checkpoint)
    # the sink is epoch-keyed: a redelivered epoch would OVERWRITE its own
    # directory rather than append beside it (exactly-once mechanics)
    epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
    assert len(epochs) >= 2


def _flatten(subdir: str, dest: str, prefix: str) -> None:
    for i, f in enumerate(sorted(os.listdir(subdir))):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(subdir, f), os.path.join(dest, f"{prefix}_{i}.parquet"))
    shutil.rmtree(subdir)


def test_mixed_corpus_dispatch_and_per_row_error_channel(spark):
    """Round-5 seam proof: a corpus mixing IMG1, AUD1, real-PNG-magic,
    and a NULL payload must decode in ONE pass with per-row error
    isolation — images and audio dispatch to their decoders, the PNG
    rows surface the stub seam's NotImplementedError in the error
    column, nulls surface ValueError, and no task fails."""
    from pdftext_spark.operators.multimodal import (
        attach_synthetic_mixed_media, decode_audio, decode_mixed_df)

    # kernel check first: AUD1 decode semantics
    sr, ch, ns, feat = decode_audio(b"AUD1;SR=16000;CH=2;" + bytes(range(16)))
    assert (sr, ch, ns) == (16000, 2, 8)
    assert feat.tolist() == [0.5, 2.5, 4.5, 6.5, 8.5, 10.5, 12.5, 14.5]

    docs = spark.createDataFrame(
        [(i, f"payload body {i}") for i in range(12)], "doc_id long, text string")
    media = attach_synthetic_mixed_media(docs)
    # plant one null payload on top of the three container families
    media = media.withColumn(
        "media", F.expr("CASE WHEN doc_id = 5 THEN NULL ELSE media END"))
    rows = {r["doc_id"]: r for r in decode_mixed_df(media).collect()}
    assert len(rows) == 12
    for i in range(12):
        r = rows[i]
        if i == 5:
            assert r["error"].startswith("ValueError: null media payload")
            assert r["kind"] is None and r["feature"] is None
        elif i % 4 == 3:
            assert r["error"].startswith(
                "NotImplementedError: no decoder for container magic 89504e47")
            assert r["kind"] is None and r["feature"] is None
        elif i % 4 == 2:
            assert r["kind"] == "audio" and r["error"] is None
            assert r["sample_rate"] == 8000 + (i % 3) * 8000
            assert r["channels"] == 1 + i % 2 and r["width"] is None
            assert len(r["feature"]) == 8
        else:
            assert r["kind"] == "image" and r["error"] is None
            assert r["width"] == 64 + i % 192 and r["sample_rate"] is None
            assert len(r["feature"]) == 8
