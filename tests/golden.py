"""The reference's 5 golden wide rows (testing.sql:39-80), as Spark fixtures.

These are the exact denormalized rows the reference inserts through
``v_feasibility`` to exercise the trigger decomposition — values verbatim
(they are arbitrary test values, not derived metrics). 4 distinct users
role-played as reviewer/reporter + 4 distinct projects pin the
lookup-or-insert and double role-play behavior.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

WIDE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("summary", T.StringType(), False),
        T.StructField("reviewer_name", T.StringType(), False),
        T.StructField("reporter_name", T.StringType(), False),
        T.StructField("project_name", T.StringType(), False),
        T.StructField("created", T.TimestampType(), False),
        T.StructField("resolution_date", T.TimestampType()),
        T.StructField("design_estimate", T.DoubleType()),
        T.StructField("development_estimate", T.DoubleType(), False),
        T.StructField("development_pad_estimate", T.DoubleType()),
        T.StructField("pe_estimate", T.DoubleType()),
        T.StructField("pm_estimate", T.DoubleType()),
        T.StructField("qa_estimate", T.DoubleType()),
        T.StructField("issue_links", T.StringType()),
        T.StructField("worklog", T.StringType()),
        T.StructField("feasibility_timespent", T.DoubleType()),
        T.StructField("issue_links_timespent", T.DoubleType()),
        T.StructField("feasibility_estimate_total", T.DoubleType()),
        T.StructField("delta_percentage", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
    ]
)

_EST = (1.2, 2.0, 1.0, 1.5, 1.0, 1.5)

INSERT1_LINKS = (
    '{"PROJECT1-1254":{"summary":"Test Task A","status":"To Do","issuetype":"Task",'
    '"worklog":{"worklog":[{"author":"user1","timespent":60,"unit":"seconds","id":"111111"},'
    '{"author":"user1","timespent":60,"unit":"seconds","id":"111112"},'
    '{"author":"user1","timespent":60,"unit":"seconds","id":"111113"}],"total":180},'
    '"reporter":"user2","project":"PROJECT1","created":"2015-06-12T17:16:51.263+0000",'
    '"resolution":null,"resolution date":null}}'
)
INSERT1_WORKLOG = (
    '{"worklog":[{"author":"user1","timespent":60,"unit":"seconds","id":"111114"}],"total":60}'
)
INSERT4_WORKLOG = (
    '{"worklog":[{"author":"user1","timespent":60,"unit":"seconds","id":"11115"}],"total":60}'
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


GOLDEN_ROWS = [
    # Insert 1 (testing.sql:39-44): full nested case
    ("PROJECT1-1090", "Test Feasibility A", "user1", "user1", "PROJECT1",
     _ts("1999-01-08 04:05:06"), _ts("1999-02-08 04:05:06"), *_EST,
     INSERT1_LINKS, INSERT1_WORKLOG, 3600.0, 10800.0, 29520.0, 198.02, 234.0),
    # Insert 2 (testing.sql:49-53): null nested fields
    ("PROJECT2-123", "Test Feasibility B", "user2", "user1", "PROJECT2",
     _ts("2014-01-08 04:05:06"), _ts("2014-02-08 04:05:06"), *_EST,
     None, None, 29520.0, 10800.0, 3600.0, 98.2454, 12453.0),
    # Insert 3 (testing.sql:58-62): null nested + null delta pair
    ("PROJECT5-1999", "Test Feasibility C", "user4", "user3", "PROJECT5",
     _ts("2014-01-08 04:05:06"), _ts("2014-02-08 04:05:06"), *_EST,
     None, None, 29520.0, 10800.0, 3600.0, None, None),
    # Insert 4 (testing.sql:67-71): worklog without links
    ("PROJECT5-2000", "Test Feasibility D", "user2", "user4", "PROJECT5",
     _ts("2014-01-08 04:05:06"), _ts("2014-02-08 04:05:06"), *_EST,
     None, INSERT4_WORKLOG, 13213.0, 2515.0, 57415.0, 124.2454, 777.0),
    # Insert 5 (testing.sql:76-80): second null-delta variant
    ("PROJECT4-342", "Test Feasibility E", "user1", "user2", "PROJECT4",
     _ts("2014-01-08 04:05:06"), _ts("2014-02-08 04:05:06"), *_EST,
     None, None, 9879.0, 987842.0, 121.0, None, None),
]


def golden_wide_df(spark):
    return spark.createDataFrame(GOLDEN_ROWS, WIDE_SCHEMA)
