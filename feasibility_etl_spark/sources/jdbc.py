"""JDBC source/sink wrappers (S-JDBC-SINK production path).

The reference loads through node-postgres prepared statements, one row at a
time in unbounded parallel (/root/reference/etl.js:324-363). The engine's
production sink is Spark's JDBC writer: batched prepared statements per
partition, parallelism = partition count — the same mechanics, set-oriented.

Untestable in this container (no database); kept thin and config-driven so
the tested parquet path and this path share every upstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC read. With a partition column, Spark issues
    ``num_partitions`` range-bounded queries in parallel; predicates and
    column pruning push down into the remote WHERE/SELECT."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """Append-shaped JDBC write: one prepared-statement batch per
    ``batch_size`` rows per partition (vs the reference's statement per
    row). ``num_partitions`` caps sink-side connection count."""
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
