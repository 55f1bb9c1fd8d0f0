"""Real-JDBC round-trip — gated on a live database being reachable.

Policy (the protobuf/PIL honest-gate rule): the sandbox has no database
and no JDBC driver jar, so these tests SKIP unless the environment
provides ``POSTGRES_URL`` (a JDBC url, e.g.
``jdbc:postgresql://host:5432/db?user=u&password=p``; pass driver jars
via ``spark.jars`` in that environment). When present, the suite proves
the full write->read round-trip of sources/jdbc.py against the real
wire protocol — the one leg the parquet stand-in (S-JDBC-SINK) cannot
cover.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from feasibility_etl_spark.sources.jdbc import read_jdbc, write_jdbc

POSTGRES_URL = os.environ.get("POSTGRES_URL")

pytestmark = pytest.mark.skipif(
    not POSTGRES_URL,
    reason="no POSTGRES_URL in environment (no database in the sandbox)",
)


def test_jdbc_roundtrip_exact(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )
    write_jdbc(df, POSTGRES_URL, "spark_graft_rt", mode="overwrite",
               batch_size=50, num_partitions=4)
    back = read_jdbc(spark, POSTGRES_URL, "spark_graft_rt")
    assert sorted((r.k, r.v, r.label) for r in back.collect()) == sorted(
        (r.k, r.v, r.label) for r in df.collect()
    )


def test_jdbc_partitioned_read_pushdown(spark):
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    write_jdbc(df, POSTGRES_URL, "spark_graft_part", mode="overwrite")
    back = read_jdbc(
        spark, POSTGRES_URL, "spark_graft_part",
        partition_column="k", lower_bound=0, upper_bound=1000, num_partitions=8,
    ).where(F.col("v") == 3)
    assert back.count() == df.where(F.col("v") == 3).count()
