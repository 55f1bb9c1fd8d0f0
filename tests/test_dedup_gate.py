"""Streaming near-dup gate: cross-batch dups die against the persisted
index, intra-batch dups keep the smallest id, batch replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from feasibility_etl_spark.operators.dedup import minhash_index
from feasibility_etl_spark.streaming.dedup_gate import (
    _read_index,
    gate_batch,
    near_dup_gate_sink,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for winter and the river flows quietly past the old mill"
)
ALT = (
    "completely different content about database engines query optimization "
    "and distributed systems running on large clusters with many executors"
)
THIRD = (
    "yet another unrelated passage describing mountains rivers forests and "
    "the slow march of glaciers carving valleys over ten thousand years"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gate_batch_drops_index_matches_and_keeps_min_batch_id(spark):
    index = minhash_index(_df(spark, [(1, BASE)]))
    batch = _df(
        spark,
        [
            (10, BASE.replace("quietly", "silently")),  # near-dups indexed doc 1
            (11, ALT),                                   # fresh
            (12, ALT),                                   # duplicates batch-mate 11
            (13, THIRD),                                 # fresh
        ],
    )
    kept = sorted(r.doc_id for r in gate_batch(batch, index).collect())
    assert kept == [11, 13]


def test_gate_batch_empty_index_passes_everything_distinct(spark):
    index = _read_index(spark, "/nonexistent/dir")
    batch = _df(spark, [(1, BASE), (2, ALT)])
    kept = sorted(r.doc_id for r in gate_batch(batch, index).collect())
    assert kept == [1, 2]


def test_streaming_gate_end_to_end(spark, tmp_path):
    # batch 0: docs 1-3 (3 near-dups 1 → dropped); batch 1: 4 dups indexed 1,
    # 5 is fresh
    b0 = _df(spark, [(1, BASE), (2, ALT), (3, BASE.replace("old", "new"))])
    b1 = _df(spark, [(4, BASE.replace("lazy", "sleepy")), (5, THIRD)])
    stage = str(tmp_path / "stage")
    b0.coalesce(1).write.parquet(stage + "/f0")
    b1.coalesce(1).write.parquet(stage + "/f1")

    base = str(tmp_path / "gated")
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage + "/f*")
    )
    q = near_dup_gate_sink(src, base, str(tmp_path / "ckpt"))
    q.awaitTermination()

    accepted = spark.read.parquet(base + "/docs")
    kept = sorted(r.doc_id for r in accepted.collect())
    # file order drives batch order; either way exactly one BASE-family doc
    # (the first seen) plus ALT and THIRD survive
    base_family = {1, 3, 4}
    assert len([d for d in kept if d in base_family]) == 1
    assert {2, 5} <= set(kept) and len(kept) == 3

    # the index IS the accepted state's sig/band columns, 1:1 with docs
    idx = _read_index(spark, base + "/docs")
    assert sorted(r.doc_id for r in idx.collect()) == kept
    assert idx.columns == ["doc_id", "sig", "band_hashes"]


def test_batch_dir_overwrite_is_replay_idempotent(spark, tmp_path):
    index = _read_index(spark, "/nonexistent/dir")
    batch = _df(spark, [(1, BASE), (2, ALT)])
    dst = str(tmp_path / "docs" / "batch_id=0")
    for _ in range(2):  # replayed micro-batch overwrites its own dir
        gate_batch(batch, index).write.mode("overwrite").parquet(dst)
    assert spark.read.parquet(dst).count() == 2


def test_replay_against_own_index_partition_keeps_survivors(spark, tmp_path):
    # foreachBatch is at-least-once: a retry of batch N may find the index
    # partition its prior attempt wrote. The gate must NOT dedup the batch
    # against its own output (every doc would self-match at jaccard 1.0).
    index_dir = str(tmp_path / "index")
    batch = _df(spark, [(1, BASE), (2, ALT)])
    # prior attempt of batch 0 committed its index partition
    minhash_index(batch).write.parquet(index_dir + "/batch_id=0")

    replay_view = _read_index(spark, index_dir, before_batch=0)
    assert replay_view.count() == 0  # own partition excluded
    kept = sorted(r.doc_id for r in gate_batch(batch, replay_view).collect())
    assert kept == [1, 2]  # replay keeps the same survivors

    # a LATER batch does see batch 0's index
    later_view = _read_index(spark, index_dir, before_batch=1)
    assert later_view.count() > 0
    b1 = _df(spark, [(3, BASE.replace("lazy", "sleepy")), (4, THIRD)])
    kept1 = sorted(r.doc_id for r in gate_batch(b1, later_view).collect())
    assert kept1 == [4]


def test_streaming_replay_of_committed_batch_is_idempotent(spark, tmp_path):
    # End-to-end: run the sink once, then clear the checkpoint so the same
    # source replays from scratch. Accepted docs/index must be unchanged.
    b0 = _df(spark, [(1, BASE), (2, ALT), (3, BASE.replace("old", "new"))])
    stage = str(tmp_path / "stage")
    b0.coalesce(1).write.parquet(stage + "/f0")
    base = str(tmp_path / "gated")

    def run(ckpt):
        src = spark.readStream.schema("doc_id long, text string").parquet(stage + "/f*")
        near_dup_gate_sink(src, base, str(tmp_path / ckpt)).awaitTermination()

    run("ckpt1")
    first = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    run("ckpt2")  # fresh checkpoint -> batch 0 replays over its own output
    second = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    assert first == second == [1, 2]
    idx = sorted(r.doc_id for r in _read_index(spark, base + "/docs").collect())
    assert idx == [1, 2]


def test_read_index_custom_id_col_empty_frame(spark):
    empty = _read_index(spark, "/nonexistent/dir", id_col="uid", id_type="string")
    assert empty.columns == ["uid", "sig", "band_hashes"]
    assert empty.schema["uid"].dataType.simpleString() == "string"
