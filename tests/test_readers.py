"""Edge ingest (S-SEARCH shape): explicit-schema JSON read + the 12-path
projection with null-safe nested access."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from feasibility_etl_spark.sources.readers import (
    ISSUE_SCHEMA,
    project_issues,
    read_search_results,
)

ISSUE = {
    "key": "PROJ-1",
    "fields": {
        "summary": "A feasibility",
        "created": "2015-06-12T17:16:51.263+0000",
        "resolutiondate": None,
        "reporter": {"name": "user2"},
        "project": {"key": "PROJ"},
        "customfield_12501": {"name": "user1"},
        "customfield_14600": 2.0,
        "customfield_14601": 1.0,
        "customfield_14602": 1.0,
        "customfield_14603": 1.2,
        "customfield_14604": 1.5,
        "customfield_14607": 1.5,
    },
}

ISSUE_NULL_REVIEWER = {
    "key": "PROJ-2",
    "fields": {"summary": "No reviewer", "customfield_14600": 3.0},
}


def write_jsonl(tmp_path, issues):
    p = tmp_path / "search.jsonl"
    p.write_text("\n".join(json.dumps(i) for i in issues))
    return str(p)


def test_explicit_schema_read_and_projection(spark, tmp_path):
    path = write_jsonl(tmp_path, [ISSUE, ISSUE_NULL_REVIEWER])
    raw = read_search_results(spark, path)
    assert raw.schema == ISSUE_SCHEMA
    out = {r.key: r for r in project_issues(raw).collect()}
    assert out["PROJ-1"].reviewer_name == "user1"
    assert out["PROJ-1"].development_estimate == 2.0
    # P-NULLSAFE: missing nested parent projects as null, no error
    assert out["PROJ-2"].reviewer_name is None
    assert out["PROJ-2"].project_name is None


def test_predicate_and_limit_push_into_read(spark, tmp_path):
    path = write_jsonl(tmp_path, [ISSUE, ISSUE_NULL_REVIEWER])
    df = read_search_results(
        spark,
        path,
        predicate=F.col("fields")["customfield_14600"] != 0,
        max_results=1,
    )
    assert df.count() == 1
