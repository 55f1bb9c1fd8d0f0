"""Windowing: batch results pin the semantics; the same code must run as a
real Structured Streaming query (checked with a memory-sink smoke)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from feasibility_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)


def ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def events(spark):
    rows = [
        (1, ts(0), "a", 1.0),
        (2, ts(4), "a", 2.0),
        (3, ts(20), "a", 3.0),   # >10min gap → new session
        (4, ts(7), "b", 4.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user string, v double")


def test_tumbling(spark):
    out = tumbling_agg(events(spark), "ts", "10 minutes", [F.count(F.lit(1)).alias("n")])
    got = {r.window_start.minute: r.n for r in out.collect()}
    assert got == {0: 3, 20: 1}


def test_sliding_every_event_in_two_windows(spark):
    out = sliding_agg(
        events(spark), "ts", "10 minutes", "5 minutes", [F.count(F.lit(1)).alias("n")]
    )
    total = sum(r.n for r in out.collect())
    assert total == 2 * 4


def test_session_gap_semantics(spark):
    out = session_agg(
        events(spark), "ts", "10 minutes", [F.count(F.lit(1)).alias("n")], keys=["user"]
    )
    rows = sorted(
        ((r.user, r.session_start.minute, r.session_end.minute, r.n) for r in out.collect())
    )
    # user a: [0,4] merge (gap 4min) → session end = 4+10=14; event at 20
    # starts a new session ending 30; user b: single event session 7→17
    assert rows == [("a", 0, 14, 2), ("a", 20, 30, 1), ("b", 7, 17, 1)]


def test_same_code_runs_as_streaming_query(spark, tmp_path):
    # the operators must be streaming-legal: rate source → watermark →
    # tumbling agg → memory sink (update mode)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .withColumnRenamed("timestamp", "ts")
    )
    agg = tumbling_agg(
        with_watermark(stream, "ts", "5 seconds"),
        "ts",
        "1 second",
        [F.count(F.lit(1)).alias("n")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("win_smoke").columns == ["window_start", "window_end", "n"]
    finally:
        q.stop()
