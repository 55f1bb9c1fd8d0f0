"""Streaming EXACT-dedup gate with a Bloom-filter fast path — the exact
sibling of ``dedup_gate.near_dup_gate_sink``.

A ``foreachBatch`` sink where every micro-batch keeps one document per
distinct normalized-content fingerprint (``text.fingerprint``, the
exact_dedup family key) against everything accepted so far. Where the
near-dup gate must band-join the MinHash index every batch, exact
membership admits a two-tier check:

1. **Bloom tier (always, tiny)**: the accepted-so-far Bloom filter is
   the OR of per-batch filters — a few KB per batch, merged in
   milliseconds (``sketches.bloom_merge``). Batch rows whose
   fingerprint misses the filter are DEFINITELY new (no false
   negatives) and skip membership entirely.
2. **Exact tier (only when the Bloom says maybe)**: suspects' distinct
   fingerprints broadcast against the persisted fingerprint index in a
   scan-side semi-join — the index is column-pruned to ``fp``, never
   shuffled, never broadcast. When a batch has ZERO suspects (novel
   content bursts — the common ingest case), the index is not even
   scanned: the gate's steady-state cost is one Bloom probe per row.

False positives only ever send extra rows to the exact tier, so the
accepted corpus is EXACTLY ``exact_dedup`` of the arrival stream (with
first-arrival-wins ordering) — pinned against the batch operator in
tests/test_bloom_gate.py.

Durability (the dedup_gate rules): nothing collects to the driver;
every batch overwrites its OWN ``batch_id=N`` directories (replay of an
at-least-once micro-batch replaces, never duplicates); state reads
always exclude ``batch_id >= current`` so a replayed batch never gates
against its prior attempt. State layout under ``base_dir``:
``docs/batch_id=N`` (accepted documents), ``fps/batch_id=N`` (their
fingerprints), ``bloom/batch_id=N`` (their Bloom filter, one row).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import bloom_build, bloom_maybe_contains, bloom_merge
from ..operators.text import fingerprint
from .conf import scoped_shuffle_partitions


def _read_state(
    spark: SparkSession, path: str, before_batch: int
) -> DataFrame | None:
    """Partition-discovered union of ``batch_id=N`` dirs with
    ``batch_id < before_batch``; None when absent/empty. Probed by
    attempting the read (AnalysisException), not os.path — remote
    filesystems (s3://, hdfs://) have no driver-local path."""
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None
    return df.where(F.col("batch_id") < F.lit(before_batch)).drop("batch_id")


def exact_gate_batch(
    batch: DataFrame,
    fps_index: DataFrame | None,
    bloom_row: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    n_hashes: int = 5,
) -> DataFrame:
    """One gating step: the subset of ``batch`` surviving exact dedup
    against the accepted state and smaller-id batch-mates. Returns the
    batch columns plus ``_fp``. Usable directly for batch backfills;
    the sink wraps it per micro-batch."""
    b = batch.withColumn("_fp", fingerprint(text_col))
    keep = b.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    b = b.join(F.broadcast(keep), [id_col, "_fp"], "left_semi")
    if bloom_row is None or fps_index is None:
        return b
    suspects = (
        b.crossJoin(F.broadcast(bloom_row))
        .where(bloom_maybe_contains(F.col("_fp"), F.col("bloom"), m_bits, n_hashes))
        .select("_fp")
        .distinct()
    )
    if suspects.isEmpty():
        # definite-new batch: the fingerprint index is never scanned
        return b
    matched = fps_index.select("fp").join(
        F.broadcast(suspects.withColumnRenamed("_fp", "fp")), "fp", "left_semi"
    )
    return b.join(
        F.broadcast(matched.withColumnRenamed("fp", "_fp")), "_fp", "left_anti"
    )


def exact_dedup_gate_sink(
    docs_stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    n_hashes: int = 5,
    trigger_available_now: bool = True,
    shuffle_partitions: int | None = None,
):
    """Start the exact-dedup gate as a ``foreachBatch`` streaming query
    (see module docstring for tiers, layout, and replay semantics).
    ``m_bits`` sizes the PER-BATCH filters; the merged filter keeps that
    size (OR of aligned words), so FPR grows with total accepted volume
    — size it for the expected corpus (~10 bits per accepted doc for
    ~1% FPR; a saturated filter only degrades the fast path, never
    correctness)."""
    docs_dir = os.path.join(base_dir, "docs")
    fps_dir = os.path.join(base_dir, "fps")
    bloom_dir = os.path.join(base_dir, "bloom")

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        with scoped_shuffle_partitions(spark, shuffle_partitions):
            fps_index = _read_state(spark, fps_dir, before_batch=batch_id)
            blooms = _read_state(spark, bloom_dir, before_batch=batch_id)
            merged = None
            if blooms is not None and not blooms.isEmpty():
                # one 8K-word row, but rebuilding it re-reads every batch's
                # bloom file — and it is referenced by the isEmpty probe AND
                # the survivor plan, so cache it for the batch's lifetime
                merged = bloom_merge(blooms).persist()
            survivors = exact_gate_batch(
                batch, fps_index, merged, text_col, id_col, m_bits, n_hashes
            ).persist()
            try:
                survivors.drop("_fp").write.mode("overwrite").parquet(
                    os.path.join(docs_dir, f"batch_id={batch_id}")
                )
                new_fps = survivors.select(F.col("_fp").alias("fp"))
                new_fps.write.mode("overwrite").parquet(
                    os.path.join(fps_dir, f"batch_id={batch_id}")
                )
                bloom_build(
                    new_fps, "fp", m_bits=m_bits, n_hashes=n_hashes
                ).write.mode("overwrite").parquet(
                    os.path.join(bloom_dir, f"batch_id={batch_id}")
                )
            finally:
                survivors.unpersist()
                if merged is not None:
                    merged.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
