"""Scoped SQL-conf overrides for foreachBatch bodies.

AQE is disabled under streaming queries, so nothing coalesces a micro-
batch's post-shuffle partitions: a sink whose joins run at the session's
batch-sized ``spark.sql.shuffle.partitions`` mostly schedules empty tasks.
Sinks that know their per-batch volume take a ``shuffle_partitions``
parameter and plan each batch under this context manager, which restores
the session value even when the batch body throws (foreachBatch retries
the batch; a leaked override would silently re-plan every later query in
the session at micro-batch parallelism).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int | None):
    """Set ``spark.sql.shuffle.partitions`` to ``n`` for the block; restore
    on exit. ``n=None`` is a no-op (keep the session setting)."""
    if n is None:
        yield
        return
    prev = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(n))
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
