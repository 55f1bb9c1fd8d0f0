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


def test_stream_dedup_within_watermark(spark, tmp_path):
    import json

    from feasibility_etl_spark.streaming.windows import stream_dedup

    src_dir = tmp_path / "dedup_in"
    src_dir.mkdir()
    (src_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1},
                {"k": "a", "ts": "2024-01-01T00:00:30", "v": 2},  # dup key in window
                {"k": "b", "ts": "2024-01-01T00:01:00", "v": 3},
            ]
        )
    )
    stream = spark.readStream.schema("k string, ts timestamp, v long").json(str(src_dir))
    out = stream_dedup(stream, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("stream_dedup_t").collect()
        assert sorted((r.k, r.v) for r in rows) == [("a", 1), ("b", 3)]
    finally:
        q.stop()


def test_stream_dedup_batch_fallback(spark):
    from feasibility_etl_spark.streaming.windows import stream_dedup

    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    assert stream_dedup(df, ["k"], ts_col=None).count() == 2


def test_join_streams_batch_semantics(spark):
    from feasibility_etl_spark.streaming.windows import join_streams

    clicks = spark.createDataFrame(
        [("u1", ts(10), 1.0), ("u1", ts(40), 2.0), ("u2", ts(5), 3.0)],
        "user string, ts timestamp, v double",
    )
    imps = spark.createDataFrame(
        [("u1", ts(8), 100.0), ("u1", ts(39), 200.0), ("u3", ts(5), 300.0)],
        "user string, ts timestamp, v double",
    )
    out = join_streams(
        clicks, imps, on="user", max_lag="5 minutes", how="inner"
    )
    got = sorted((r.user, r.v, r.right_v) for r in out.collect())
    # u1@10 matches imp@8 (lag 2m); u1@40 matches imp@39; the 10↔39 pair is
    # outside the 5m bound; u2/u3 have no partner
    assert got == [("u1", 1.0, 100.0), ("u1", 2.0, 200.0)]


def test_join_streams_dual_watermarks_streaming(spark, tmp_path):
    import json

    from feasibility_etl_spark.streaming.windows import join_streams

    l_dir, r_dir = tmp_path / "ss_left", tmp_path / "ss_right"
    l_dir.mkdir(), r_dir.mkdir()
    (l_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user": "u1", "ts": "2024-01-01T00:10:00", "v": 1},
                {"user": "u1", "ts": "2024-01-01T00:40:00", "v": 2},
                {"user": "u2", "ts": "2024-01-01T00:05:00", "v": 3},
            ]
        )
    )
    (r_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user": "u1", "ts": "2024-01-01T00:08:00", "score": 10},
                {"user": "u1", "ts": "2024-01-01T00:39:00", "score": 20},
                {"user": "u3", "ts": "2024-01-01T00:05:00", "score": 30},
            ]
        )
    )
    left = spark.readStream.schema("user string, ts timestamp, v long").json(str(l_dir))
    right = spark.readStream.schema("user string, ts timestamp, score long").json(
        str(r_dir)
    )
    out = join_streams(
        left,
        right,
        on="user",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
        max_lag="5 minutes",
        how="inner",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user, r.v, r.right_score) for r in spark.table("ss_join_t").collect()
        )
        assert got == [("u1", 1, 10), ("u1", 2, 20)]
        # dual watermarks registered → state is evictable, not unbounded
        progress = q.lastProgress
        assert progress is None or "watermark" in str(progress).lower()
    finally:
        q.stop()


def test_enrich_stream_static_join(spark, tmp_path):
    import json

    from feasibility_etl_spark.streaming.windows import enrich_stream

    src_dir = tmp_path / "enrich_in"
    src_dir.mkdir()
    (src_dir / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in [{"k": "a", "v": 1}, {"k": "z", "v": 2}])
    )
    dim = spark.createDataFrame([("a", "Alpha"), ("b", "Beta")], "k string, name string")
    stream = spark.readStream.schema("k string, v long").json(str(src_dir))
    out = enrich_stream(stream, dim, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.k, r.name) for r in spark.table("enrich_t").collect()}
        assert got == {("a", "Alpha"), ("z", None)}  # left join keeps unmatched
    finally:
        q.stop()


def test_join_streams_left_outer_emits_unmatched_on_eviction(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched left row is held in
    state until BOTH watermarks pass its eviction horizon, then emitted
    with null right columns — late batches advance the watermark and flush
    it."""
    import json

    from feasibility_etl_spark.streaming.windows import join_streams

    l_dir, r_dir = tmp_path / "lo_left", tmp_path / "lo_right"
    l_dir.mkdir(), r_dir.mkdir()

    def w(d, name, rows):
        (d / name).write_text("\n".join(json.dumps(r) for r in rows))

    # batch 1: u1 matches; u2 has no right partner
    w(l_dir, "b1.json", [
        {"user": "u1", "ts": "2024-01-01T00:10:00", "v": 1},
        {"user": "u2", "ts": "2024-01-01T00:05:00", "v": 3},
    ])
    w(r_dir, "b1.json", [{"user": "u1", "ts": "2024-01-01T00:08:00", "score": 10}])

    left = spark.readStream.schema("user string, ts timestamp, v long").json(str(l_dir))
    right = spark.readStream.schema("user string, ts timestamp, score long").json(str(r_dir))
    out = join_streams(
        left, right, on="user",
        left_watermark="10 minutes", right_watermark="10 minutes",
        max_lag="5 minutes", how="left_outer",
    )
    q = (
        out.writeStream.format("memory").queryName("ss_lo_t").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lo_ckpt")).start()
    )
    try:
        q.processAllAvailable()
        matched = {(r.user, r.v): r.right_score for r in spark.table("ss_lo_t").collect()}
        assert matched == {("u1", 1): 10}  # u2 still buffered, not yet emitted

        # far-future rows on BOTH sides push both watermarks past u2's horizon
        w(l_dir, "b2.json", [{"user": "u9", "ts": "2024-01-01T02:00:00", "v": 9}])
        w(r_dir, "b2.json", [{"user": "u9", "ts": "2024-01-01T02:00:00", "score": 90}])
        q.processAllAvailable()
        # one more cycle so the post-eviction emission lands in the sink
        w(l_dir, "b3.json", [{"user": "u9", "ts": "2024-01-01T03:00:00", "v": 9}])
        w(r_dir, "b3.json", [{"user": "u9", "ts": "2024-01-01T03:00:00", "score": 91}])
        q.processAllAvailable()

        rows = {(r.user, r.v): r.right_score for r in spark.table("ss_lo_t").collect()}
        assert rows[("u2", 3)] is None, "evicted unmatched left row must emit with nulls"
    finally:
        q.stop()


# ----------------------------------------------------------- resampling

def test_resample_fills_gaps(spark):
    from feasibility_etl_spark.streaming.windows import resample

    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 01:20:00", 2.0),
        ("a", "2024-01-01 03:30:00", 3.0),  # hour 2 is a gap for key a
        ("b", "2024-01-01 05:00:00", 4.0),  # b's spine starts at 05, not 00
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    out = resample(
        df, "ts", "1 hour",
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")],
        keys=["k"], fill={"n": 0},
    )
    got = {(r.k, str(r.window_start)): (r.n, r.total) for r in out.collect()}
    assert got[("a", "2024-01-01 02:00:00")] == (0, None)  # gap: filled n, NULL sum
    assert got[("a", "2024-01-01 00:00:00")] == (1, 1.0)
    assert got[("a", "2024-01-01 03:00:00")] == (1, 3.0)
    # per-key spine: b has exactly one bucket, no phantom hours 0-4
    assert [k for k in got if k[0] == "b"] == [("b", "2024-01-01 05:00:00")]
    assert len([k for k in got if k[0] == "a"]) == 4  # hours 0,1,2,3


def test_resample_no_keys_global_spine(spark):
    from feasibility_etl_spark.streaming.windows import resample

    df = spark.createDataFrame(
        [("2024-01-01 00:00:30",), ("2024-01-01 02:59:00",)], "ts string"
    ).select(F.to_timestamp("ts").alias("ts"))
    out = resample(df, "ts", "1 hour", [F.count(F.lit(1)).alias("n")], fill={"n": 0})
    rows = sorted((str(r.window_start), r.n) for r in out.collect())
    assert rows == [
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 01:00:00", 0),
        ("2024-01-01 02:00:00", 1),
    ]
