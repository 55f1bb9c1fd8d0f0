"""Edge-source adapters (SURVEY §2.1): explicit-schema JSON ingest + the
paged-search shape.

The reference's primary source is a paged JIRA search (POST JQL →
JSON body, /root/reference/etl.js:92-195). In the engine that ingest is an
edge adapter, not an operator: REST responses land as JSON lines files (or
arrive via a streaming source) and enter the engine through an
explicit-schema read — never schema inference (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Shape of one search "issue" as projected by the reference ingest
#: (etl.js:127-148): 12 plucked paths incl. the magic custom fields.
ISSUE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField(
            "fields",
            T.StructType(
                [
                    T.StructField("summary", T.StringType()),
                    T.StructField("created", T.StringType()),
                    T.StructField("resolutiondate", T.StringType()),
                    T.StructField(
                        "reporter",
                        T.StructType([T.StructField("name", T.StringType())]),
                    ),
                    T.StructField(
                        "project",
                        T.StructType([T.StructField("key", T.StringType())]),
                    ),
                    T.StructField(
                        "customfield_12501",
                        T.StructType([T.StructField("name", T.StringType())]),
                    ),
                    T.StructField("customfield_14600", T.DoubleType()),
                    T.StructField("customfield_14601", T.DoubleType()),
                    T.StructField("customfield_14602", T.DoubleType()),
                    T.StructField("customfield_14603", T.DoubleType()),
                    T.StructField("customfield_14604", T.DoubleType()),
                    T.StructField("customfield_14607", T.DoubleType()),
                ]
            ),
        ),
    ]
)


def read_search_results(
    spark: SparkSession,
    path: str,
    schema: T.StructType = ISSUE_SCHEMA,
    predicate: F.Column | None = None,
    max_results: int | None = None,
) -> DataFrame:
    """S-SEARCH as an engine read: explicit schema, predicate + limit pushed
    into the scan (the JQL-executes-inside-JIRA analogue — Catalyst pushes
    both into the source)."""
    df = spark.read.schema(schema).json(path)
    if predicate is not None:
        df = df.where(predicate)
    if max_results is not None:
        df = df.limit(max_results)
    return df


def project_issues(df: DataFrame) -> DataFrame:
    """P-PROJECT for the issue shape: the 12-path pluck (etl.js:127-148),
    with null-safe nested access free from Spark's struct semantics."""
    f = F.col("fields")
    return df.select(
        F.col("key"),
        f["summary"].alias("summary"),
        f["customfield_12501"]["name"].alias("reviewer_name"),  # null-safe (P-NULLSAFE)
        f["reporter"]["name"].alias("reporter_name"),
        f["project"]["key"].alias("project_name"),
        f["created"].alias("created_raw"),
        f["resolutiondate"].alias("resolution_date_raw"),
        f["customfield_14603"].alias("design_estimate"),
        f["customfield_14600"].alias("development_estimate"),
        f["customfield_14601"].alias("development_pad_estimate"),
        f["customfield_14604"].alias("pe_estimate"),
        f["customfield_14602"].alias("pm_estimate"),
        f["customfield_14607"].alias("qa_estimate"),
    )
