"""Streaming SCD2 sink: incremental fold parity + replay idempotency."""

from __future__ import annotations

import datetime as dt

from feasibility_etl_spark.streaming.scd2_sink import scd2_sink
from feasibility_etl_spark.writer.scd2 import scd2_apply


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _rows(hist):
    return sorted(
        (r.k, str(r.tier), str(r.valid_from), str(r.valid_to), r.is_current)
        for r in hist.collect()
    )


B0 = [("alice", "gold", _ts(8)), ("bob", "silver", _ts(8))]
B1 = [("alice", "platinum", _ts(12)), ("bob", "silver", _ts(12)), ("carol", "gold", _ts(12))]


def _stage(spark, tmp_path):
    stage = str(tmp_path / "changes")
    for i, rows in enumerate([B0, B1]):
        spark.createDataFrame(rows, "k string, tier string, ts timestamp").coalesce(
            1
        ).write.parquet(f"{stage}/f{i}")
    return stage


def _run(spark, stage, hist_dir, ckpt):
    src = (
        spark.readStream.schema("k string, tier string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage + "/f*")
    )
    scd2_sink(
        src, hist_dir, ckpt, "k", ["tier"], shuffle_partitions=4
    ).awaitTermination()


def test_streamed_history_equals_batch_fold(spark, tmp_path):
    stage = _stage(spark, tmp_path)
    hist_dir = str(tmp_path / "hist")
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt"))
    streamed = _rows(spark.read.parquet(hist_dir))

    h0 = scd2_apply(spark.createDataFrame(B0, "k string, tier string, ts timestamp"), "k", ["tier"])
    h1 = scd2_apply(
        spark.createDataFrame(B1, "k string, tier string, ts timestamp"),
        "k", ["tier"], hist=h0,
    )
    assert streamed == _rows(h1)
    # alice's gold interval closed at 12:00, platinum open
    assert ("alice", "gold", "2024-01-01 08:00:00", "2024-01-01 12:00:00", False) in streamed


def test_replay_from_scratch_is_idempotent(spark, tmp_path):
    stage = _stage(spark, tmp_path)
    hist_dir = str(tmp_path / "hist")
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt1"))
    first = _rows(spark.read.parquet(hist_dir))
    # fresh checkpoint: every batch replays over the existing history
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt2"))
    assert _rows(spark.read.parquet(hist_dir)) == first
