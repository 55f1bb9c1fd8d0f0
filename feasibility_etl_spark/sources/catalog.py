"""Table catalog: explicit schemas + loaders for the engine's test corpus.

Engine policy (SURVEY.md §1.3): sources always declare explicit StructType
schemas — never infer. The reference hardcodes its ingest schema as JSON
field paths (/root/reference/etl.js:127-148); we declare ours as Spark
StructTypes. Explicit schemas also let Catalyst prune parquet columns from
the scan (ReadSchema pushdown) without a sampling pass.

At 100 TB the fact tables (lineitem / orders / events / documents) arrive as
many-file parquet datasets; ``load`` reads the path lazily and Catalyst
handles partition pruning and predicate pushdown. Nothing here collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The driver's TPC-H-ish corpus (TESTDATA.md / FIXTURES.md §B) with types as
# verified from the parquet footers. Timestamps are physical INT64 millis /
# nanos; Spark reads both as TimestampType.
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def schema_for(name: str) -> T.StructType:
    return TABLES[name]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``sf_dir`` as a DataFrame.

    Column pruning + filter pushdown happen at the scan via Catalyst; callers
    should select/filter directly on the returned frame rather than caching.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: INT64 TIMESTAMP(NANOS) (which Spark refuses to read as a
    timestamp — we read nanos as long via
    ``spark.sql.legacy.parquet.nanosAsLong`` and floor-convert with
    ``timestamp_micros(ts div 1000)``; integer division, since a double
    round-trip loses precision above 2^53) and plain TIMESTAMP(MICROS)
    (readable directly; NTZ/LTZ both normalized to session-tz TimestampType).
    DuckDB floors ns→µs the same way, so both engines see identical
    microsecond timestamps either way. We branch on the observed read dtype,
    not the file footer, so the scan stays a single lazy parquet read.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register catalog tables as temp views for Spark SQL plans."""
    for name in names or list(TABLES):
        load(spark, sf_dir, name).createOrReplaceTempView(name)
