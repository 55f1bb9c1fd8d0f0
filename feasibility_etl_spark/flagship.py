"""Flagship query — the reference's whole pipeline shape in one plan.

Mirrors the v_feasibility read path (SURVEY.md §3.3) on the fixture star:
fact (orders) → source predicate → broadcast dim chain
(customer→nation→region) → horizontal computed column (A-HSUM shape) →
null-guarded delta arithmetic (F-DELTA shape) → rollup per region/priority.

One lazily-built DAG: Catalyst pushes the status filter into the parquet
scan, prunes columns, and plans all three dim joins as broadcast-hash —
exactly the plan a 1000-executor run over 100 TB of orders wants (the only
shuffle is the final small-cardinality groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import delta_pair
from .sources.catalog import load


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    # source predicate (P-FILTER-SRC) — pushed to the scan
    fact = orders.where((F.col("o_orderstatus") != "P") & (F.col("o_totalprice") != 0))

    # dim chain (J-DIM-*, J-MULTIWAY) — all broadcast
    star = (
        fact.join(F.broadcast(customer), fact["o_custkey"] == customer["c_custkey"], "left")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left")
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "left")
    )

    # horizontal computed column (A-HSUM shape) + delta pair (F-DELTA shape)
    charges = (
        F.coalesce(F.col("o_totalprice"), F.lit(0.0))
        + F.coalesce(F.col("o_totalprice") * F.lit(0.05), F.lit(0.0))
    ).alias("charged_total")
    delta, delta_pct = delta_pair(F.col("o_totalprice"), F.col("c_acctbal"))

    wide = star.select(
        F.col("o_orderkey"),
        F.col("o_orderpriority"),
        F.col("r_name").alias("region_name"),
        charges,
        delta.alias("balance_delta"),
        delta_pct.alias("balance_delta_pct"),
    )

    return (
        wide.groupBy("region_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("charged_total"), 2).alias("charged_total"),
            F.count("balance_delta").alias("n_deltas"),
        )
        .orderBy("region_name", "o_orderpriority")
    )
