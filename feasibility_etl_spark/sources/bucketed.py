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


def z_value(cols: Sequence, bits: int = 16):
    """Morton (Z-order) key: bit-interleave ``cols`` (already integer ranks
    in [0, 2**bits)) into one long. Pure Column arithmetic — the whole key
    stays inside whole-stage codegen (bits × len(cols) shift/mask ops, no
    Python). ``bits * len(cols)`` must stay ≤ 62."""
    from pyspark.sql import functions as F

    if bits * len(cols) > 62:
        raise ValueError(f"bits ({bits}) x cols ({len(cols)}) exceeds a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order the rows across output files so parquet min/max stats prune
    on EVERY z-ordered column, not just a leading sort key.

    A plain ``sortWithinPartitions(a)`` layout makes predicates on ``a``
    skip files but leaves ``b``'s per-file range at ~100% of the domain.
    Interleaving the bits of both ranks (Morton curve) keeps each file's
    rows inside one hypercube cell, so per-file ranges narrow on all
    dimensions at once — a selective predicate on ANY of them skips most
    files at scan time (file-level stats; at 100 TB this is the difference
    between scanning a partition and scanning a file).

    Plan shape: one tiny min/max agg per column (driver-collected: 2×k
    longs), rank = linear scale to [0, 2**bits) — outlier-robust quantile
    binning is the production upgrade, same key shape — then ONE
    ``repartitionByRange`` shuffle on the z key with a within-partition
    sort, and a plain parquet write.
    """
    from pyspark.sql import functions as F

    stats = df.select(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in zorder_cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in zorder_cols],
    ).first()
    top = (1 << bits) - 1
    ranks = []
    for c in zorder_cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        span = (hi - lo) or 1.0
        ranks.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top),
            ).cast("long")
        )
    keyed = df.withColumn("_z", z_value(ranks, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
