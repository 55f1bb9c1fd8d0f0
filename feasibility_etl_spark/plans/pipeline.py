"""The end-to-end transform stage as one declarative plan.

Mirrors the reference's stage-4 ``transformData`` (/root/reference/etl.js:285-304)
— per record: worklog total (etl.js:291), linked timespent (etl.js:292),
horizontal estimate sum with hours→seconds conversion (etl.js:293), JSON
serialization (etl.js:296-297), delta pair (etl.js:300) — but as a single
``select`` over Column expressions instead of a per-record imperative loop.
Catalyst sees the whole thing; no stage barriers, no materialization between
"stages", whole-stage codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import delta_pair
from ..operators.aggregates import horizontal_sum, linked_total, worklog_rollup

#: The six estimate columns summed by A-HSUM (etl.js:139-144 ingest,
#: helpers.js:268-275 iteration order).
ESTIMATE_COLS = [
    "design_estimate",
    "development_estimate",
    "development_pad_estimate",
    "pe_estimate",
    "pm_estimate",
    "qa_estimate",
]


def transform_feasibilities(
    df: DataFrame,
    estimate_cols: Sequence[str] = tuple(ESTIMATE_COLS),
    serialize_json: bool = False,
) -> DataFrame:
    """Stage-4 transform over a frame with typed ``worklog_entries`` (array of
    worklog structs) and ``issue_links`` (map) columns.

    Emits the 20-column analytic record (FIXTURES.md §A.1). With
    ``serialize_json`` the nested columns become JSON strings (the reference
    stringifies pre-load, etl.js:296-297); default keeps typed structs —
    the engine-internal representation.
    """
    out = df.withColumn("worklog", worklog_rollup("worklog_entries")).drop("worklog_entries")
    out = out.withColumn("feasibility_timespent", F.col("worklog")["total"].cast("double"))
    out = out.withColumn("issue_links_timespent", linked_total("issue_links"))
    out = horizontal_sum(out, list(estimate_cols), "feasibility_estimate_total")
    delta, delta_pct = delta_pair("feasibility_estimate_total", "issue_links_timespent")
    out = out.withColumn("delta", delta).withColumn("delta_percentage", delta_pct)
    if serialize_json:
        # to_json returns null on null input — matches the `&&` guard at
        # etl.js:296-297.
        out = out.withColumn("worklog", F.to_json("worklog")).withColumn(
            "issue_links", F.to_json("issue_links")
        )
    return out
