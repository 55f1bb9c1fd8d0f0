"""The denormalized read surface — ``v_feasibility`` rebuilt two ways.

Reference: /root/reference/lib/database/schema.sql:66-94 — a view with three
CTEs, each re-scanning the fact table to attach one dimension name
(reviewer, reporter via the role-played ``jira_user`` dim; project), then a
3-way LEFT join back on ``key``. On PG ≤11 each CTE is a materialization
fence, so the view costs four fact scans.

Two variants, asserted result-identical in tests:

- ``faithful_view_sql`` — the same ``WITH`` query as Spark SQL, kept for
  reference/oracle fidelity. Catalyst inlines CTEs (CTESubstitution), which
  removes PG's materialization fences and lets every dim join broadcast —
  but inlining does NOT deduplicate the repeated fact scans: the physical
  plan still reads the fact once per CTE plus once for the outer query
  (4 fact scans, 8 parquet scans total at the driver query's shape).
- ``idiomatic_view`` — the single-pass formulation and the PRODUCTION
  DEFAULT: fact ⋈ user(reviewer) ⋈ user(reporter) ⋈ project, all
  broadcast. One fact scan, three broadcast-hash joins, no shuffle — at
  100 TB the faithful shape pays 4× the scan IO for identical rows
  (hash-equality asserted in tests/test_view.py; scan counts asserted in
  test_idiomatic_view_single_scan_vs_faithful).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fact metric columns carried through the view verbatim (schema.sql:87-90).
_FACT_COLS = [
    "key",
    "summary",
    "created",
    "resolution_date",
    "design_estimate",
    "development_estimate",
    "development_pad_estimate",
    "pe_estimate",
    "pm_estimate",
    "qa_estimate",
    "issue_links",
    "worklog",
    "feasibility_timespent",
    "issue_links_timespent",
    "feasibility_estimate_total",
    "delta_percentage",
    "delta",
]


def faithful_view_sql(
    fact_view: str = "feasibility",
    user_view: str = "jira_user",
    project_view: str = "project",
) -> str:
    """The reference view's defining query, verbatim shape (schema.sql:66-94)."""
    fact_cols = ", ".join(f"f.{c}" for c in _FACT_COLS)
    return f"""
    WITH cte_reviewer AS (
        SELECT f.key, u.username AS reviewer_name
        FROM {fact_view} f LEFT JOIN {user_view} u ON f.fk_reviewer = u.id
    ), cte_reporter AS (
        SELECT f.key, u.username AS reporter_name
        FROM {fact_view} f LEFT JOIN {user_view} u ON f.fk_reporter = u.id
    ), cte_project AS (
        SELECT f.key, p.name AS project_name
        FROM {fact_view} f LEFT JOIN {project_view} p ON f.fk_project = p.id
    )
    SELECT {fact_cols}, rv.reviewer_name, rp.reporter_name, pj.project_name
    FROM {fact_view} f
    LEFT JOIN cte_reviewer rv ON f.key = rv.key
    LEFT JOIN cte_reporter rp ON f.key = rp.key
    LEFT JOIN cte_project pj ON f.key = pj.key
    """


def idiomatic_view(fact: DataFrame, users: DataFrame, projects: DataFrame) -> DataFrame:
    """Single-pass v_feasibility: one fact scan + three broadcast joins.

    The role-played ``jira_user`` dim is aliased per role to avoid the
    ambiguous-column trap (SURVEY.md §7.5 hardness #4).
    """
    reviewer = users.select(
        F.col("id").alias("_rv_id"), F.col("username").alias("reviewer_name")
    )
    reporter = users.select(
        F.col("id").alias("_rp_id"), F.col("username").alias("reporter_name")
    )
    proj = projects.select(F.col("id").alias("_pj_id"), F.col("name").alias("project_name"))
    return (
        fact.join(F.broadcast(reviewer), fact["fk_reviewer"] == F.col("_rv_id"), "left")
        .join(F.broadcast(reporter), fact["fk_reporter"] == F.col("_rp_id"), "left")
        .join(F.broadcast(proj), fact["fk_project"] == F.col("_pj_id"), "left")
        .select(*_FACT_COLS, "reviewer_name", "reporter_name", "project_name")
    )
