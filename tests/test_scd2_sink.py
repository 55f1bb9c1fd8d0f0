"""Streaming SCD2 sink: incremental fold parity, replay idempotency,
crash-window consistency, and open-slice-only steady-state writes."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from feasibility_etl_spark.streaming.scd2_sink import read_scd2_history, scd2_sink
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
B2 = [("bob", "gold", _ts(16)), ("carol", "gold", _ts(16))]


def _stage(spark, tmp_path, batches=(B0, B1)):
    stage = str(tmp_path / "changes")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, tier string, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{stage}/f{i}")
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
    streamed = _rows(read_scd2_history(spark, hist_dir))

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
    first = _rows(read_scd2_history(spark, hist_dir))
    # fresh checkpoint: every batch replays over the existing history
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt2"))
    assert _rows(read_scd2_history(spark, hist_dir)) == first


def test_half_written_batch_is_invisible(spark, tmp_path):
    """A closed delta whose open-slice commit never landed (crash between
    the two writes) must not surface in reads: the reader gates closed
    partitions to batch_id <= the latest complete open version."""
    stage = _stage(spark, tmp_path)
    hist_dir = str(tmp_path / "hist")
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt"))
    before = _rows(read_scd2_history(spark, hist_dir))

    # simulate batch 99 crashing after its closed append: a stray closed
    # row lands, but open/v=99 never commits
    phantom = spark.createDataFrame(
        [(123, "alice", "platinum", _ts(12), _ts(20), False, 99)],
        "version_sk long, k string, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean, batch_id int",
    )
    phantom.write.mode("append").partitionBy("batch_id").parquet(hist_dir + "/closed")
    assert _rows(read_scd2_history(spark, hist_dir)) == before


def test_steady_state_touches_only_open_slice(spark, tmp_path):
    """Closed-interval files written by earlier batches are never rewritten:
    a follow-up run over new change files must leave every pre-existing
    closed data file byte-identical in place (append-only closed store +
    versioned open slice = per-batch I/O is delta+open-sized, not
    history-sized)."""
    hist_dir = str(tmp_path / "hist")
    _run(spark, _stage(spark, tmp_path), hist_dir, str(tmp_path / "ckpt"))

    def closed_files():
        out = {}
        for root, _, files in os.walk(hist_dir + "/closed"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = closed_files()
    assert before, "expected closed rows after batch 1 (alice's gold closed)"

    # extend the SAME stream (same checkpoint) with a third change file:
    # bob and carol move to gold at 16:00, closing two more intervals
    _run(spark, _stage(spark, tmp_path, (B0, B1, B2)), hist_dir, str(tmp_path / "ckpt"))
    after = closed_files()
    for path, sig in before.items():
        assert after.get(path) == sig, f"pre-existing closed file rewritten: {path}"
    assert len(after) > len(before)

    hist = read_scd2_history(spark, hist_dir)
    assert _rows(hist) == _rows(
        scd2_apply(
            spark.createDataFrame(B2, "k string, tier string, ts timestamp"),
            "k",
            ["tier"],
            hist=scd2_apply(
                spark.createDataFrame(B1, "k string, tier string, ts timestamp"),
                "k",
                ["tier"],
                hist=scd2_apply(
                    spark.createDataFrame(B0, "k string, tier string, ts timestamp"),
                    "k",
                    ["tier"],
                ),
            ),
        )
    )
    # exactly one open row per live key in the open slice
    assert hist.where(F.col("is_current")).count() == 3


def test_compact_closed_store_preserves_history_and_bounds_files(spark, tmp_path):
    from feasibility_etl_spark.streaming.scd2_sink import compact_scd2_closed

    stage = _stage(spark, tmp_path, batches=(B0, B1, B2))
    hist_dir = str(tmp_path / "hist")
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt"))

    before = _rows(read_scd2_history(spark, hist_dir))
    closed = str(tmp_path / "hist" / "closed")
    parts_before = [d for d in os.listdir(closed) if d.startswith("batch_id=")]
    assert len(parts_before) >= 2  # per-batch debris exists

    stats = compact_scd2_closed(spark, hist_dir)
    assert stats["compacted"] and stats["partitions_after"] == 1
    assert stats["files_after"] < stats["files_before"]
    parts_after = [d for d in os.listdir(closed) if d.startswith("batch_id=")]
    assert len(parts_after) == 1

    # history byte-identical through the same reader
    after = _rows(read_scd2_history(spark, hist_dir))
    assert after == before

    # idempotent: a second run is a no-op and history still matches
    stats2 = compact_scd2_closed(spark, hist_dir)
    assert not stats2["compacted"]
    assert _rows(read_scd2_history(spark, hist_dir)) == before


def test_compact_closed_crash_window_heals_on_read(spark, tmp_path):
    # simulate the worst crash window: compacted files moved into the
    # destination partition but the merged partitions NOT yet deleted ->
    # every closed row is duplicated. The reader must heal (dropDuplicates),
    # and re-running compaction must converge.
    import shutil

    from feasibility_etl_spark.streaming.scd2_sink import compact_scd2_closed

    stage = _stage(spark, tmp_path, batches=(B0, B1, B2))
    hist_dir = str(tmp_path / "hist")
    _run(spark, stage, hist_dir, str(tmp_path / "ckpt"))
    before = _rows(read_scd2_history(spark, hist_dir))

    closed = str(tmp_path / "hist" / "closed")
    parts = sorted(d for d in os.listdir(closed) if d.startswith("batch_id="))
    dest = os.path.join(closed, parts[0])
    # duplicate every other partition's files into dest (what step 2 does)
    for p in parts[1:]:
        src_dir = os.path.join(closed, p)
        for f in os.listdir(src_dir):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src_dir, f),
                            os.path.join(dest, "crashcopy-" + p + "-" + f))
    assert _rows(read_scd2_history(spark, hist_dir)) == before  # healed
    stats = compact_scd2_closed(spark, hist_dir)
    assert stats["compacted"]
    assert _rows(read_scd2_history(spark, hist_dir)) == before
