"""Small-file compaction: layout convergence, data preservation,
crash-swap repair, partitioned maintenance."""

import pytest
from pyspark.sql import functions as F

from feasibility_etl_spark.writer.compact import (
    _data_files,
    _repair_interrupted_swap,
    compact_partitions,
    compact_small_files,
)


@pytest.fixture()
def debris(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(10_000).select(
        "id", (F.col("id") % 7).alias("k")
    ).repartition(20).write.parquet(path)
    return path


def test_compacts_to_byte_sized_target(spark, debris):
    assert len(_data_files(spark, debris)) == 20
    st = compact_small_files(spark, debris, target_file_bytes=1 << 30)
    assert st["compacted"] and st["files_before"] == 20 and st["files_after"] == 1
    assert len(_data_files(spark, debris)) == 1


def test_data_identical_after_compaction(spark, debris):
    before = sorted(r.id for r in spark.read.parquet(debris).collect())
    compact_small_files(spark, debris, target_file_bytes=1 << 30)
    after = sorted(r.id for r in spark.read.parquet(debris).collect())
    assert before == after


def test_noop_when_already_compact(spark, debris):
    compact_small_files(spark, debris, target_file_bytes=1 << 30)
    st = compact_small_files(spark, debris, target_file_bytes=1 << 30)
    assert not st["compacted"] and st["files_after"] == 1


def test_target_bytes_splits_output(spark, debris):
    total = sum(sz for _, sz in _data_files(spark, debris))
    st = compact_small_files(spark, debris, target_file_bytes=total // 4 + 1)
    assert st["compacted"]
    assert st["files_after"] == 4


def test_interrupted_swap_repairs(spark, debris):
    # simulate a crash between the two renames: live dir moved aside
    fs, live = spark._jvm.org.apache.hadoop.fs.Path(debris).getFileSystem(
        spark._jsc.hadoopConfiguration()
    ), spark._jvm.org.apache.hadoop.fs.Path(debris)
    aside = spark._jvm.org.apache.hadoop.fs.Path(debris + "__compact_old")
    fs.rename(live, aside)
    assert _repair_interrupted_swap(spark, debris)
    assert spark.read.parquet(debris).count() == 10_000
    # and the normal entry point performs the repair implicitly
    fs.rename(live, aside)
    st = compact_small_files(spark, debris, target_file_bytes=1 << 30)
    assert st["compacted"] and spark.read.parquet(debris).count() == 10_000


def test_partitioned_compaction_skips_clean_partitions(spark, tmp_path):
    root = str(tmp_path / "ptbl")
    spark.range(1000).select(
        "id", (F.col("id") % 3).alias("p")
    ).repartition(10).write.partitionBy("p").parquet(root)
    # p=0,1,2 each have ~10 files; pre-compact p=2 to a single file
    compact_small_files(spark, f"{root}/p=2", target_file_bytes=1 << 30)
    st = compact_partitions(spark, root, target_file_bytes=1 << 30)
    assert st["_total"]["partitions_compacted"] == 2
    assert st["_total"]["files_after"] == 3
    got = spark.read.parquet(root).groupBy("p").count().collect()
    assert {r.p: r["count"] for r in got} == {0: 334, 1: 333, 2: 333}


def test_sort_cols_restores_clustering(spark, tmp_path):
    path = str(tmp_path / "ztbl")
    spark.range(10_000).select("id").repartition(16).write.parquet(path)
    total = sum(sz for _, sz in _data_files(spark, path))
    st = compact_small_files(
        spark, path, target_file_bytes=total // 4 + 1, sort_cols=["id"]
    )
    assert st["compacted"] and st["files_after"] == 4
    # range-partitioned rewrite: per-file id ranges are disjoint
    files = sorted(f for f, _ in _data_files(spark, path))
    spans = []
    for f in files:
        rows = spark.read.parquet(f).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).collect()[0]
        spans.append((rows.lo, rows.hi))
    spans.sort()
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
