"""Edge ingest (S-SEARCH shape): explicit-schema JSON read + the 12-path
projection with null-safe nested access."""

from __future__ import annotations

import datetime as dt
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


def test_catalog_events_reads_both_ts_encodings(spark, tmp_path):
    # events.ts has shipped as INT64 TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across testdata generations; catalog.load must floor both to the
    # same microsecond timestamps (DuckDB floors ns→µs identically).
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from feasibility_etl_spark.sources.catalog import load

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    micros = [base, base + dt.timedelta(microseconds=123456)]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    for enc, unit in [("micros", "us"), ("nanos", "ns")]:
        d = tmp_path / enc
        d.mkdir()
        ts = pa.array(micros).cast(pa.timestamp(unit))
        pq.write_table(
            pa.table({**cols, "ts": ts}), str(d / "events.parquet"),
            use_deprecated_int96_timestamps=False, coerce_timestamps=None,
        )
    got = {}
    for enc in ("micros", "nanos"):
        rows = load(spark, str(tmp_path / enc), "events").orderBy("event_id").collect()
        got[enc] = [r.ts for r in rows]
        assert dict(load(spark, str(tmp_path / enc), "events").dtypes)["ts"] == "timestamp"
    assert got["micros"] == got["nanos"] == micros
