"""Streaming EXACT-dedup gate with a Bloom-filter fast path — the exact
sibling of ``dedup_gate.near_dup_gate_sink``.

A ``foreachBatch`` sink where every micro-batch keeps one document per
distinct normalized-content fingerprint (``text.fingerprint``, the
exact_dedup family key) against everything accepted so far. Where the
near-dup gate must band-join the MinHash index every batch, exact
membership admits a two-tier check:

1. **Bloom tier (always, tiny)**: one CUMULATIVE Bloom filter — the OR
   of every accepted fingerprint so far — probed per row. Batch rows
   whose fingerprint misses the filter are DEFINITELY new (no false
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

Per-batch cost discipline (the round-4 profile showed per-batch FIXED
costs dominating: a ~1.2 s distributed bloom build, re-reading and
re-merging every prior batch's filter, and ~3 recomputations of the
fingerprinted batch across the gate's actions):

- The fingerprinted, batch-internally-deduped frame is built ONCE and
  ``persist()``-ed; every downstream action (suspect probe, doc write,
  fp write, bloom update) reads the cache instead of re-running the
  md5+window subtree.
- Bloom state is CUMULATIVE: ``bloom/batch-N.bin`` holds the merged
  filter through batch N, so a batch reads exactly ONE small file
  (its predecessor) instead of re-listing and re-OR-ing N per-batch
  filters — state read stays O(1) as the stream ages. The file is raw
  little-endian int64 words written through the Hadoop FileSystem API
  (works on s3a://, hdfs://, file://) with a write-tmp-then-rename
  commit: a Spark job exists to write DATASETS; scheduling one per
  micro-batch to move a 64 KB sketch measured ~0.5 s of pure overhead.
- The batch's new bits are aggregated SPARSE in Spark (probe explode →
  one map-side-combined ``bit_or`` shuffle, at most ``m_bits/32`` rows
  regardless of batch size) and OR-ed into the predecessor filter
  driver-side. A Bloom filter is driver-sized BY CONSTRUCTION
  (``m_bits/8`` bytes — 64 KB at the 2^18 default); this is the same
  bounded-driver-solve policy as the tokenizer word tables, not a
  corpus-scale collect.
- The docs write and the sparse-bits aggregation are independent jobs
  over the SAME cached survivors; the sink submits them concurrently
  (two driver threads), so the batch pays max(write, aggregate) instead
  of their sum.

Durability (the dedup_gate rules): corpus data never collects to the
driver; every batch overwrites its OWN ``batch_id=N`` directories
(replay of an at-least-once micro-batch replaces, never duplicates);
state reads always exclude ``batch_id >= current`` so a replayed batch
never gates against its prior attempt — for the cumulative bloom that
means reading exactly ``batch_id = N-1`` (foreachBatch ids are
contiguous under the checkpoint contract; batch N only exists after
N-1 committed). Filters older than N-1 are retired as the stream
advances — nothing can ever read them — so bloom state is O(1) files,
not one per batch. State layout under ``base_dir``: ``docs/batch_id=N``
(accepted documents WITH their ``fp`` fingerprint column — the
fingerprint index is a column-pruned read of the docs state, not a
second write job per batch) and ``bloom/batch-N.bin`` (the cumulative
filter through batch N).
"""

from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketches import _bloom_probes, bloom_maybe_contains
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


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` through the JVM Hadoop FS API —
    the same abstraction Spark's own writers use, so the sketch-state
    files land wherever the dataset state does (file://, hdfs://,
    s3a://) without a per-scheme driver code path."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _bloom_path(bloom_dir: str, batch_id: int) -> str:
    return os.path.join(bloom_dir, f"batch-{batch_id}.bin")


def _write_bloom_words(
    spark: SparkSession, bloom_dir: str, batch_id: int, words: list[int]
) -> None:
    """Commit the cumulative filter through ``batch_id`` as raw little-
    endian int64 words: write to a ``.tmp`` sibling, then delete-and-
    rename over the final name (replays replace, never append)."""
    final = _bloom_path(bloom_dir, batch_id)
    fs, jfinal = _hadoop_fs(spark, final)
    _, jtmp = _hadoop_fs(spark, final + ".tmp")
    out = fs.create(jtmp, True)
    out.write(bytearray(struct.pack(f"<{len(words)}q", *words)))
    out.close()
    if fs.exists(jfinal):
        fs.delete(jfinal, False)
    fs.rename(jtmp, jfinal)


def _read_prev_bloom(
    spark: SparkSession, bloom_dir: str, batch_id: int, n_words: int
) -> list[int] | None:
    """The cumulative filter through batch ``batch_id - 1`` as a driver
    list of words (one small-file read — never a listing or merge of
    all prior batches), or None when no predecessor exists.

    A file whose word count differs from ``n_words`` (a restart with a
    different ``m_bits``) is treated as ABSENT: the gate degrades to the
    exact tier for that batch (every fingerprint a suspect) and rewrites
    the filter at the new size on commit. Probing a mis-sized word array
    would be worse than slow — a too-small array makes out-of-range
    ``element_at`` probes NULL, classifying true duplicates as
    definitely-new — so size mismatch must never reach the probe."""
    if batch_id <= 0:
        return None
    path = _bloom_path(bloom_dir, batch_id - 1)
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    inp = fs.open(jpath)
    try:
        blob = bytes(spark._jvm.org.apache.commons.io.IOUtils.toByteArray(inp))
    finally:
        inp.close()
    words = list(struct.unpack(f"<{len(blob) // 8}q", blob))
    return words if len(words) == n_words else None


def _fingerprint_dedup(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``batch`` + ``_fp``, keeping the min-id row per fingerprint
    (first-arrival-wins). One window shuffle, NO broadcast: the
    groupBy-min + broadcast-semi-join alternative force-broadcasts the
    distinct-fp set, which is not broadcast-sized for batch backfills."""
    b = batch.withColumn("_fp", fingerprint(text_col))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_gate_batch(
    batch: DataFrame,
    fps_index: DataFrame | None,
    bloom_row: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    n_hashes: int = 5,
    fingerprinted: bool = False,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """One gating step: the subset of ``batch`` surviving exact dedup
    against the accepted state and smaller-id batch-mates. Returns the
    batch columns plus ``_fp``. Usable directly for batch backfills;
    the sink wraps it per micro-batch (passing ``fingerprinted=True``
    with a persisted pre-fingerprinted frame so the md5+window subtree
    runs once across the gate's several actions).

    A missing ``bloom_row`` with a PRESENT ``fps_index`` degrades
    safely: every distinct fingerprint becomes a suspect (exactness
    preserved, fast path lost) — lost bloom state can never admit a
    duplicate.

    ``caches``: when the caller will run SEVERAL actions on the result
    (the sink does: docs write, rejects write, sparse-bits aggregate),
    pass a list — the persisted suspect frame is appended for the
    CALLER to unpersist after its actions, so the cache actually serves
    the downstream semi/anti joins. Without it the cache is released
    here and only serves the isEmpty probe (each caller action then
    re-runs the probe plan — fine for a single-action backfill)."""
    b = batch if fingerprinted else _fingerprint_dedup(batch, text_col, id_col)
    if fps_index is None:
        return b
    # no .distinct(): b is already one row per fingerprint (the window
    # dedup), so the extra shuffle bought nothing per batch
    if bloom_row is not None:
        suspects = (
            b.crossJoin(F.broadcast(bloom_row))
            .where(bloom_maybe_contains(F.col("_fp"), F.col("bloom"), m_bits, n_hashes))
            .select("_fp")
        )
    else:
        suspects = b.select("_fp")
    suspects = suspects.persist()
    if caches is not None:
        caches.append(suspects)
    try:
        if suspects.isEmpty():
            # definite-new batch: the fingerprint index is never scanned
            return b
        matched = fps_index.select("fp").join(
            F.broadcast(suspects.withColumnRenamed("_fp", "fp")), "fp", "left_semi"
        )
        return b.join(
            F.broadcast(matched.withColumnRenamed("fp", "_fp")), "_fp", "left_anti"
        )
    finally:
        if caches is None:
            suspects.unpersist()


def _sparse_bloom_words(fps: DataFrame, m_bits: int, n_hashes: int) -> list:
    """The set bits of ``fps.fp`` as sparse ``(_w, _word)`` rows — probe
    explode + one map-side-combined bit_or shuffle; the collect is
    bounded by ``m_bits/32`` rows no matter the batch size."""
    probes = F.array(*_bloom_probes(F.col("fp"), m_bits, n_hashes))
    return (
        fps.select(F.explode(probes).alias("_p"))
        .select(
            F.shiftright(F.col("_p"), 5).alias("_w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("_p").bitwiseAND(F.lit(31)).cast("int"),
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
        .collect()
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
    rejects_dir: str | None = None,
):
    """Start the exact-dedup gate as a ``foreachBatch`` streaming query
    (see module docstring for tiers, layout, cost discipline, and replay
    semantics). ``m_bits`` sizes the cumulative filter; FPR grows with
    total accepted volume — size it for the expected corpus (~10 bits
    per accepted doc for ~1% FPR; a saturated filter only degrades the
    fast path, never correctness).

    ``rejects_dir``: opt-in quarantine — each batch ALSO writes its
    dropped rows (``reason='duplicate'``) to ``rejects_dir/batch_id=N``
    (overwrite → replay-idempotent) so dedup decisions stay auditable.
    Off by default (one extra action per batch)."""
    docs_dir = os.path.join(base_dir, "docs")
    bloom_dir = os.path.join(base_dir, "bloom")
    n_words = m_bits // 32

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        with scoped_shuffle_partitions(spark, shuffle_partitions):
            docs_state = _read_state(spark, docs_dir, before_batch=batch_id)
            fps_index = docs_state.select("fp") if docs_state is not None else None
            prev = _read_prev_bloom(spark, bloom_dir, batch_id, n_words)
            bloom_row = (
                spark.createDataFrame([(prev,)], "bloom array<long>")
                if prev is not None
                else None
            )
            b = _fingerprint_dedup(batch, text_col, id_col).persist()
            gate_caches: list[DataFrame] = []
            survivors = exact_gate_batch(
                b, fps_index, bloom_row, text_col, id_col, m_bits, n_hashes,
                fingerprinted=True, caches=gate_caches,
            ).persist()
            try:
                if rejects_dir is not None:
                    # original batch minus survivors: batch-internal dups
                    # (window-dropped) AND state matches, both 'duplicate'
                    batch.join(
                        F.broadcast(
                            survivors.select(F.col(id_col))
                        ), id_col, "left_anti"
                    ).withColumn("reason", F.lit("duplicate")).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(rejects_dir, f"batch_id={batch_id}"))
                new_fps = survivors.select(F.col("_fp").alias("fp"))
                # the written filter must stay the OR of EVERY accepted
                # fingerprint: with a predecessor, that's prev | new
                # bits; with docs state but NO usable predecessor (lost
                # file, or an m_bits change rejected by the size check),
                # rebuild from the full index — writing new-batch bits
                # alone would hand the NEXT batch a filter with false
                # definitely-news, admitting duplicates one batch later
                bloom_src = (
                    new_fps if prev is not None or fps_index is None
                    else fps_index.union(new_fps)
                )
                with ThreadPoolExecutor(max_workers=2) as pool:
                    write_f = pool.submit(
                        lambda: survivors.withColumnRenamed("_fp", "fp")
                        .write.mode("overwrite")
                        .parquet(os.path.join(docs_dir, f"batch_id={batch_id}"))
                    )
                    sparse_f = pool.submit(
                        _sparse_bloom_words, bloom_src, m_bits, n_hashes
                    )
                    merged = list(prev) if prev is not None else [0] * n_words
                    for r in sparse_f.result():
                        merged[r["_w"]] |= r["_word"]
                    write_f.result()
                _write_bloom_words(spark, bloom_dir, batch_id, merged)
                # retire stale cumulative filters: batch N reads exactly
                # N-1, a replay of N reads N-1 — nothing ever reads N-2,
                # so the file set stays O(1) instead of one-per-batch
                if batch_id >= 2:
                    fs, jold = _hadoop_fs(
                        spark, _bloom_path(bloom_dir, batch_id - 2)
                    )
                    if fs.exists(jold):
                        fs.delete(jold, False)
            finally:
                survivors.unpersist()
                b.unpersist()
                for c in gate_caches:
                    c.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
