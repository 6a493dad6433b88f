"""Streaming trending top-k: append-mode finalized sliding windows must
match an independent python replica exactly (counts, window membership,
watermark closure set), and the rank must be deterministic."""

import os

import duckdb

SF = "/root/testdata/sf0.001"
_WIN_US = 10 * 60 * 1_000_000
_SLIDE_US = 5 * 60 * 1_000_000
_WM_US = 10 * 60 * 1_000_000


def _truth():
    """Python replica: sliding-window counts (epoch-aligned 5-min starts,
    10-min length) and the closure watermark = max event time - delay.
    A window is FINAL iff win_end <= watermark."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT epoch_us(ts) us, event_type FROM "
        f"read_parquet('{SF}/events.parquet')").fetchall()
    counts = {}
    max_us = 0
    for us, term in rows:
        max_us = max(max_us, us)
        first = (us // _SLIDE_US) * _SLIDE_US
        start = first
        while start > us - _WIN_US:
            counts[(start, start + _WIN_US, term)] = \
                counts.get((start, start + _WIN_US, term), 0) + 1
            start -= _SLIDE_US
    wm = max_us - _WM_US
    final = {k: v for k, v in counts.items() if k[1] <= wm}
    return final, wm


def test_trending_stream_finalized_windows_match_truth(spark, tmp_path):
    from pdftext_spark.streaming.trending import top_k, trending_stream

    src = spark.read.parquet(os.path.join(SF, "events.parquet"))
    mid = src.selectExpr("percentile_approx(ts, 0.5) m").collect()[0]["m"]
    d = str(tmp_path / "events_in")
    src.where(src.ts <= mid).coalesce(1).write.parquet(d)
    src.where(src.ts > mid).coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema(src.schema) \
        .option("maxFilesPerTrigger", 1).parquet(d)
    q = (trending_stream(stream).writeStream
         .format("memory").queryName("trend_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    out = spark.sql("SELECT * FROM trend_out")
    got = {(r["ws"], r["we"], r["term"]): r["n"]
           for r in out.selectExpr(
               "unix_micros(win_start) ws", "unix_micros(win_end) we",
               "term", "n").collect()}
    final, _wm = _truth()
    # exactly the watermark-closed windows, with exact counts — no
    # partial emissions, no duplicates (append-mode contract)
    assert got == final
    assert len(got) > 0

    # per-window top-k: deterministic (count desc, term asc) prefix of
    # the replica's own ranking, rk contiguous from 1
    ranked = top_k(out).selectExpr(
        "unix_micros(win_start) ws", "unix_micros(win_end) we",
        "term", "n", "rk").collect()
    by_win = {}
    for r in ranked:
        k = (r["ws"], r["we"])
        by_win.setdefault(k, []).append((r["rk"], r["term"], r["n"]))
    for (ws, we), rows in by_win.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
        full = sorted(((v, t) for (s, e, t), v in final.items()
                       if (s, e) == (ws, we)),
                      key=lambda x: (-x[0], x[1]))
        assert [(t, v) for _, t, v in rows] == [(t, v) for v, t in
                                                full[:len(rows)]]
