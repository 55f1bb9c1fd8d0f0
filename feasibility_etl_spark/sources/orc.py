"""ORC source/sink — the columnar interchange format next to parquet
(Hive/Trino ecosystems write it; Spark's reader is built in, no extra
jars). Completes the format surface: parquet / JSONL / CSV / ORC / JDBC
/ REST.

Same design stance as the parquet catalog:

- **Explicit schema always** — ORC files carry types, but pinning the
  schema at read rejects drift loudly instead of silently widening.
- **Predicate pushdown + column pruning are native**: ORC keeps
  file/stripe/row-group min-max statistics, so filters reach the scan
  (``PushedFilters`` in the plan — asserted in tests) and narrow
  projections skip unread columns, exactly like parquet.
- **Zlib compression by default** (the ORC ecosystem default; snappy
  available via option) — splittable either way, unlike gzipped text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read ORC with an explicit schema (recommended; None infers from
    the file footer). Merge-schema across files is off by default (one
    footer read, not N)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zlib",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ORC (one file per task; hive-style dirs with
    ``partition_by``)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.orc(path)
