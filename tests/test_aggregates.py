"""Aggregation semantics (SURVEY §2.4): the null-vs-zero rules.

- A-WORKLOG: null (not zero/empty) on empty input (helpers.js:115-117)
- A-LINKED: 0 (not null) when nothing contributes (helpers.js:247-256)
- A-HSUM: null→0, ×3600, source columns visibly mutated (helpers.js:264-289)
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feasibility_etl_spark.functions.json_fns import ISSUE_LINKS_TYPE, WORKLOG_TYPE
from feasibility_etl_spark.operators.aggregates import (
    horizontal_sum,
    linked_total,
    worklog_rollup,
)

ENTRY = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("timespent", T.LongType()),
        T.StructField("unit", T.StringType()),
        T.StructField("id", T.StringType()),
    ]
)


def entries_df(spark, entries):
    schema = T.StructType([T.StructField("worklog_entries", T.ArrayType(ENTRY))])
    return spark.createDataFrame([(entries,)], schema)


def test_worklog_rollup_totals(spark):
    # insert-1 shape: three 60s entries → total 180 (testing.sql:43)
    entries = [("user1", 60, "seconds", "111111"), ("user1", 60, "seconds", "111112"),
               ("user1", 60, "seconds", "111113")]
    [r] = entries_df(spark, entries).select(worklog_rollup("worklog_entries").alias("w")).collect()
    assert r.w.total == 180
    assert len(r.w.worklog) == 3
    assert r.w.worklog[0].author == "user1"


def test_worklog_rollup_empty_is_null_not_zero(spark):
    for entries in ([], None):
        [r] = entries_df(spark, entries).select(
            worklog_rollup("worklog_entries").alias("w")
        ).collect()
        assert r.w is None, f"entries={entries!r} must roll up to NULL"


def test_linked_total_sums_link_worklogs(spark):
    schema = T.StructType([T.StructField("issue_links", ISSUE_LINKS_TYPE)])
    link = {
        "summary": "s", "status": "st", "issuetype": "Task",
        "worklog": {"worklog": [], "total": 180},
        "reviewer": None, "reporter": "u", "project": "P",
        "created": None, "resolution": None, "resolution date": None,
    }
    no_worklog_link = dict(link, worklog=None)
    df = spark.createDataFrame([({"K-1": link, "K-2": no_worklog_link},)], schema)
    [r] = df.select(linked_total("issue_links").alias("t")).collect()
    assert r.t == 180.0  # null worklogs skipped (helpers.js:251-255)


def test_linked_total_empty_is_zero_not_null(spark):
    schema = T.StructType([T.StructField("issue_links", ISSUE_LINKS_TYPE)])
    df = spark.createDataFrame([(None,), ({},)], schema)
    rows = df.select(linked_total("issue_links").alias("t")).collect()
    assert [r.t for r in rows] == [0.0, 0.0]


def test_horizontal_sum_converts_and_mutates(spark):
    # estimates from testing.sql inserts: 1.2+2+1+1.5+1+1.5 hours = 29520 s
    df = spark.createDataFrame(
        [(1.2, 2.0, 1.0, 1.5, 1.0, 1.5)],
        "design double, dev double, pad double, pe double, pm double, qa double",
    )
    cols = ["design", "dev", "pad", "pe", "pm", "qa"]
    [r] = horizontal_sum(df, cols, "total").collect()
    assert r.total == 29520.0
    assert r.design == 4320.0  # 1.2h visibly converted (helpers.js:281)
    assert r.dev == 7200.0


def test_horizontal_sum_null_coalesces(spark):
    df = spark.createDataFrame([(None, 2.0)], "a double, b double")
    [r] = horizontal_sum(df, ["a", "b"], "total").collect()
    assert r.total == 7200.0
    assert r.a == 0.0


def test_multilevel_rollup_matches_stacked_groupbys(spark):
    from feasibility_etl_spark.operators.aggregates import multilevel_agg

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4), ("a", "x", 8)],
        "k1 string, k2 string, v long",
    )
    out = multilevel_agg(df, ["k1", "k2"], [F.sum("v").alias("s")], mode="rollup")
    got = {(r.k1, r.k2, r.gid): r.s for r in out.collect()}
    assert got == {
        ("a", "x", 0): 9, ("a", "y", 0): 2, ("b", "x", 0): 4,   # leaves
        ("a", None, 1): 11, ("b", None, 1): 4,                   # k1 subtotals
        (None, None, 3): 15,                                     # grand total
    }
    cube = multilevel_agg(df, ["k1", "k2"], [F.sum("v").alias("s")], mode="cube")
    extra = {(r.k1, r.k2, r.gid): r.s for r in cube.collect() if r.gid == 2}
    assert extra == {(None, "x", 2): 13, (None, "y", 2): 2}      # k2-only sets


def test_multilevel_is_single_expand_single_agg_pass(spark):
    from feasibility_etl_spark.operators.aggregates import multilevel_agg

    df = spark.range(100).selectExpr("id % 3 AS k1", "id % 5 AS k2", "id AS v")
    out = multilevel_agg(df, ["k1", "k2"], [F.sum("v").alias("s")], mode="cube")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1          # one branch-per-set expand
    assert plan.count("Exchange") == 1        # one shuffle, partials map-side


# ------------------------------------------------------ pivot / unpivot

def test_pivot_unpivot_roundtrip_is_group_by(spark):
    from feasibility_etl_spark.operators.aggregates import pivot_agg, unpivot_groups
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 3.0), ("b", "y", 4.0)],
        "k string, s string, v double",
    )
    piv = pivot_agg(
        df, ["k"], "s", ["x", "y", "z"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("t")],
    )
    assert set(piv.columns) == {"k", "x_n", "x_t", "y_n", "y_t", "z_n", "z_t"}
    back = unpivot_groups(
        piv, ["k"], {"x": ["x_n", "x_t"], "y": ["y_n", "y_t"], "z": ["z_n", "z_t"]},
        "s", ["n", "t"],
    )
    got = sorted(map(tuple, back.collect()))
    exp = sorted(
        map(tuple, df.groupBy("k", "s").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("t")
        ).collect())
    )
    # 'z' never occurs and (b, x) never occurs: all-null rows dropped,
    # restoring exact GROUP BY semantics
    assert got == exp


def test_unpivot_is_zero_shuffle(spark):
    from feasibility_etl_spark.operators.aggregates import unpivot_groups

    df = spark.createDataFrame([("a", 1, 2, 3, 4)], "k string, xn int, xt int, yn int, yt int")
    out = unpivot_groups(df, ["k"], {"x": ["xn", "xt"], "y": ["yn", "yt"]}, "s", ["n", "t"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert sorted(map(tuple, out.collect())) == [("a", "x", 1, 2), ("a", "y", 3, 4)]
