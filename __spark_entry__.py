"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star query at sf0.001; ``queries()`` /
``oracle_sql()`` expose one (Spark, DuckDB-oracle) pair per implemented
operator from SURVEY.md §2 plus the north-star extensions. Implementations
live in ``feasibility_etl_spark/`` — this module is just the contract shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feasibility_etl_spark.driver_queries import ORACLES, QUERIES
from feasibility_etl_spark.flagship import flagship

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key. Keys absent here
    (DEDUP-CANDIDATES, SIM-ANN, EMB-NEARDUP) use xxhash64 / seeded
    hyperplanes / iterative k-means with no DuckDB equivalent → rows-only
    checks, pinned by recall/equivalence tests."""
    return dict(ORACLES)
