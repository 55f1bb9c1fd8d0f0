"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``

Each query executes its full plan into a noop sink (no driver collect
overhead, no result materialization skew). Session startup and a JVM
warm-up job are excluded from timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feasibility_etl_spark.driver_queries import QUERIES  # noqa: E402
from feasibility_etl_spark.flagship import flagship  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402

#: Headline set: the flagship plus the heaviest representatives of each
#: operator family (joins, aggs, windows, dedup, similarity, text).
BENCH_QUERIES = [
    "FLAGSHIP",
    "J-DIM-REPORTER",
    "J-ATTACH",
    "A-WORKLOG",
    "A-COLLECT",
    "VIEW-CTE",
    "WIN-SESSION",
    "WIN-SLIDE",
    "DEDUP-EXACT",
    "DEDUP-NGRAM",
    "DEDUP-MINHASH",
    "SIM-TOPK",
    "TEXT-QUALITY",
    "TEXT-LANGID",
    "J-SALTED",
    "SIM-IVF",
    "MM-IMAGE",
    "PIPE-DOCS",
    "PIPE-EVENTS",
    "TEXT-WINNOW",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    fn = flagship if name == "FLAGSHIP" else QUERIES[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    spark = build_session("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    # warm the parquet reader / broadcast / window / noop-sink machinery on
    # the smallest SF so per-query timings measure the query, not one-time
    # session bring-up (falls back to the bench SF if no sibling exists)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    try:
        flagship(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as e:  # noqa: BLE001
        print(f"bench warm-up skipped: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        try:
            timings[name.lower()] = round(run_query(spark, name, sf_dir), 3)
        except Exception as e:  # noqa: BLE001
            timings[name.lower()] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
