"""v_feasibility read path: the reference-faithful CTE SQL and the idiomatic
single-pass join must return identical rows (SURVEY §3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feasibility_etl_spark.plans.feasibility_view import faithful_view_sql, idiomatic_view
from feasibility_etl_spark.writer.denormalized import DimSpec, write_denormalized

from golden import golden_wide_df
from test_writer import SPECS, empty_dim


@pytest.fixture()
def star(spark):
    dims = {"jira_user": empty_dim(spark, "username"), "project": empty_dim(spark, "name")}
    res = write_denormalized(golden_wide_df(spark), SPECS, dims)
    return res


def rows_key(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_faithful_and_idiomatic_views_identical(spark, star):
    star.fact.createOrReplaceTempView("feasibility")
    star.dims["jira_user"].createOrReplaceTempView("jira_user")
    star.dims["project"].createOrReplaceTempView("project")
    faithful = spark.sql(faithful_view_sql())
    idiomatic = idiomatic_view(star.fact, star.dims["jira_user"], star.dims["project"])
    assert sorted(faithful.columns) == sorted(idiomatic.columns)
    assert rows_key(faithful) == rows_key(idiomatic)


def test_view_round_trips_golden_rows(spark, star):
    # write path + read path = identity on the denormalized surface
    view = idiomatic_view(star.fact, star.dims["jira_user"], star.dims["project"])
    out = {r.key: r for r in view.collect()}
    assert out["PROJECT1-1090"].reviewer_name == "user1"
    assert out["PROJECT5-2000"].reviewer_name == "user2"
    assert out["PROJECT5-2000"].reporter_name == "user4"
    assert out["PROJECT4-342"].project_name == "PROJECT4"
    assert out["PROJECT5-1999"].delta is None  # null delta pair survives
    assert out["PROJECT1-1090"].delta == 234.0


def test_faithful_view_collapses_to_broadcast_joins(spark, star):
    # Catalyst inlines the 3 CTEs; the physical plan must not contain a
    # shuffle exchange (all dim joins broadcast) — the 100 TB posture
    star.fact.createOrReplaceTempView("feasibility")
    star.dims["jira_user"].createOrReplaceTempView("jira_user")
    star.dims["project"].createOrReplaceTempView("project")
    plan = spark.sql(faithful_view_sql())._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_idiomatic_view_single_scan_vs_faithful(spark, tmp_path):
    # CTE inlining != scan dedup: the faithful shape re-reads the fact once
    # per CTE (+ the outer query); the idiomatic production default reads it
    # exactly once. Pin both counts from parquet-backed frames so the claim
    # in feasibility_view's docstring stays honest.
    import re

    from golden import golden_wide_df
    from test_writer import SPECS, empty_dim

    dims = {"jira_user": empty_dim(spark, "username"), "project": empty_dim(spark, "name")}
    res = write_denormalized(golden_wide_df(spark), SPECS, dims)
    root = str(tmp_path)
    res.fact.write.parquet(f"{root}/fact")
    res.dims["jira_user"].write.parquet(f"{root}/jira_user")
    res.dims["project"].write.parquet(f"{root}/project")
    fact = spark.read.parquet(f"{root}/fact")
    users = spark.read.parquet(f"{root}/jira_user")
    projects = spark.read.parquet(f"{root}/project")

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Scan parquet", plan))

    fact.createOrReplaceTempView("feasibility")
    users.createOrReplaceTempView("jira_user")
    projects.createOrReplaceTempView("project")
    faithful_scans = n_scans(spark.sql(faithful_view_sql()))
    idiomatic_scans = n_scans(idiomatic_view(fact, users, projects))
    assert idiomatic_scans == 4  # 1 fact + 3 dims
    assert faithful_scans == 7  # 4 fact + 3 dim scans — inlining dedupes nothing
