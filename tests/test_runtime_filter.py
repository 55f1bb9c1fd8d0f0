"""Runtime bloom-filter join pruning on the J-ATTACH fact-fact shape.

At 100 TB the expensive joins are fact-fact (orders ⋈ lineitem shaped,
J-ATTACH): both sides shuffle, and every detail row travels even when a
selective predicate on the parent side would reject most of them after the
join. Spark's runtime bloom filter (InjectRuntimeFilter, on by default —
``spark.sql.optimizer.runtime.bloomFilter.enabled``) fixes exactly this: a
bloom filter built from the filtered parent's join keys is pushed into the
detail scan, so pruned rows never enter the shuffle.

The injection is gated on the detail side scanning ≥
``applicationSideScanSizeThreshold`` (10 GB default) — the right call at
scale and the reason it never fires at test SF. These tests simulate the
at-scale condition by dropping the threshold to 0 and assert (a) the
``might_contain(bloom_filter_agg(...))`` runtime filter lands in the
optimized plan on the detail side, and (b) results are identical with the filter disabled —
pruning is a pure physical optimization.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from feasibility_etl_spark.operators.joins import attach_detail
from feasibility_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


@contextmanager
def _confs(spark, **kv):
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _attach_shape(spark):
    orders = load(spark, SF, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    lineitem = load(spark, SF, "lineitem")
    return attach_detail(
        orders.select("o_orderkey", "o_orderpriority"),
        lineitem.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        key="o_orderkey",
        how="inner",
    )


def test_bloom_filter_injected_on_attach_detail(spark):
    with _confs(
        spark,
        **{
            # simulate the ≥10 GB detail scan that makes injection fire at scale
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
            # force the shuffle join the 100 TB shape has (no broadcast shortcut)
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        plan = _attach_shape(spark)._jdf.queryExecution().optimizedPlan().toString()
    # Spark 4 spells the probe `might_contain(...)` over a `bloom_filter_agg`
    # scalar subquery built from the filtered parent keys
    assert "might_contain" in plan and "bloom_filter_agg" in plan, plan


def test_bloom_filter_is_result_neutral(spark):
    on = {
        "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
        "spark__sql__autoBroadcastJoinThreshold": "-1",
    }
    off = dict(on)
    off["spark__sql__optimizer__runtime__bloomFilter__enabled"] = "false"
    with _confs(spark, **on):
        got_on = sorted((r.o_orderkey, r.l_quantity) for r in _attach_shape(spark).collect())
    with _confs(spark, **off):
        got_off = sorted((r.o_orderkey, r.l_quantity) for r in _attach_shape(spark).collect())
    assert got_on == got_off
    assert len(got_on) > 0
