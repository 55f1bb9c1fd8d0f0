"""Bucketed tables — pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of J-ATTACH-shaped joins (fact ⋈ detail on the
same key, repeatedly) is re-shuffling both sides on every run. Bucketing
pays that shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions
files on disk, and any later equi-join or groupBy on the key reads both
sides already co-located — the physical plan drops the Exchange on each
bucketed side entirely (asserted in tests/test_bucketed.py).

Spark constraint: bucketed data must go through the table catalog
(``saveAsTable``), not plain ``.parquet(path)`` — bucket metadata lives in
the metastore. Sort-within-buckets (``sortBy``) additionally removes the
Sort under a sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on ``bucket_cols``.

    ``n_buckets`` should match the downstream ``spark.sql.shuffle.partitions``
    neighborhood — mismatched bucket counts force one side to re-shuffle.
    With ``path`` the table is external (data at ``path``, metadata in the
    catalog); without, it lands in the warehouse dir.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if path:
        writer = writer.option("path", path)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog)."""
    return spark.table(table)
