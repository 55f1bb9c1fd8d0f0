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
