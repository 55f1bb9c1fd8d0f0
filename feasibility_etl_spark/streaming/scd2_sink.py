"""Streaming SCD2: a CDC change stream folded into a persisted
dimension history per micro-batch (foreachBatch → ``scd2_apply``).

Completes the streaming⟷writer bridge the way ``denormalizing_sink``
does for the star schema: the same set-oriented batch writer runs per
micro-batch against the history read back from storage, so streaming and
batch loads share one code path and one semantics (SURVEY §3.2's trigger
replacement, extended to history-tracked dims).

Durability/replay posture:

- Spark serializes foreachBatch calls → single-writer read-modify-write.
- foreachBatch is at-least-once; a replayed batch is harmless because
  ``scd2_apply`` is idempotent over its input (no-op changes are
  dropped, rows at or before the open version's start are ignored, and
  version ids are ``xxhash64(key, valid_from)`` — re-applying identical
  changes yields byte-identical history).
- The new history is staged then swapped via read-back (its plan READS
  the files being replaced; overwrite-in-place would delete the job's
  own input), same rule as the denormalizing sink's dims.
- The per-batch rewrite is HISTORY-sized, not stream-sized — the SCD2
  pattern is for dimensions (users, documents, suppliers), which are
  small relative to facts. A history too big to rewrite per batch wants
  partitioning by ``is_current`` so only the open slice rewrites; out of
  scope here and flagged in the docstring deliberately.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.errors import AnalysisException

from ..writer.scd2 import scd2_apply
from .conf import scoped_shuffle_partitions


def scd2_sink(
    changes: DataFrame,
    hist_dir: str,
    checkpoint_dir: str,
    natural_key: str,
    tracked: list[str],
    ts_col: str = "ts",
    trigger_available_now: bool = True,
    shuffle_partitions: int | None = None,
):
    """Start the history-folding sink; returns the StreamingQuery.

    ``changes``: streaming frame of (natural_key, *tracked, ts_col)
    observations. ``hist_dir``: the persisted history (created on first
    batch). ``shuffle_partitions``: scoped micro-batch override, same
    rationale as ``near_dup_gate_sink``.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        with scoped_shuffle_partitions(spark, shuffle_partitions):
            try:
                hist = spark.read.parquet(hist_dir)
            except AnalysisException:
                hist = None
            new_hist = scd2_apply(
                batch, natural_key, tracked, ts_col=ts_col, hist=hist
            )
            staging = os.path.join(
                os.path.dirname(hist_dir.rstrip("/")),
                f"_scd2_staging_{batch_id}",
            )
            new_hist.write.mode("overwrite").parquet(staging)
            spark.read.parquet(staging).write.mode("overwrite").parquet(hist_dir)
            jpath = spark._jvm.org.apache.hadoop.fs.Path(staging)
            jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jpath, True)

    writer = (
        changes.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
