"""ORC source/sink: exact round-trip, predicate pushdown reaching the
scan, partitioned layout."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF0001
from feasibility_etl_spark.sources.catalog import load
from feasibility_etl_spark.sources.orc import read_orc, write_orc


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="orc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_roundtrip_exact(spark, tmpdir):
    orders = load(spark, SF0001, "orders")
    path = os.path.join(tmpdir, "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path, orders.schema)
    assert back.schema == orders.schema
    a = orders.agg(
        F.count(F.lit(1)), F.sum(F.floor(F.col("o_totalprice") * 100))
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)), F.sum(F.floor(F.col("o_totalprice") * 100))
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_predicate_pushdown_reaches_scan(spark, tmpdir):
    orders = load(spark, SF0001, "orders")
    path = os.path.join(tmpdir, "orders_orc")
    write_orc(orders, path)
    q = read_orc(spark, path, orders.schema).where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1][:200]
    # column pruning: the scan's ReadSchema carries only what's needed
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "o_totalprice" not in read_schema


def test_partitioned_layout(spark, tmpdir):
    orders = load(spark, SF0001, "orders").limit(200)
    path = os.path.join(tmpdir, "orders_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    dirs = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert len(dirs) >= 2
    back = read_orc(spark, path)
    assert back.count() == 200
