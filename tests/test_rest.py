"""REST ingest adapter: distributed paged search + throttled per-key lookups.

The transport is a deterministic in-memory fake (no network in this
container); what's under test is the Spark plumbing — fan-out, explicit
schemas, parallelism bound, pacing, and record-errors-don't-halt.
"""

from __future__ import annotations

import json
import time

from feasibility_etl_spark.sources.rest import fetch_paged, fetch_per_key

ISSUES = [{"key": f"FEAS-{i}", "summary": f"issue {i}", "estimate": float(i)} for i in range(23)]
PAGE_SIZE = 10


def test_fetch_paged_fans_out_and_records_page_errors(spark):
    issues = list(ISSUES)  # close over data, not the module (executors can't import tests)

    def fake_page(i: int) -> str:
        if i == 2:
            raise ConnectionError("boom 503")
        return json.dumps(issues[i * PAGE_SIZE : (i + 1) * PAGE_SIZE])

    out = fetch_paged(
        spark,
        fake_page,
        "key string, summary string, estimate double",
        count_total=lambda: len(ISSUES),
        page_size=PAGE_SIZE,
    ).collect()
    ok = sorted(r.key for r in out if r._err is None)
    assert ok == sorted(i["key"] for i in ISSUES[:20])  # pages 0-1 land
    # failed page -> ONE null-payload row carrying the error, run not halted
    bad = [r for r in out if r._err is not None]
    assert len(bad) == 1 and bad[0].page_id == 2 and "boom 503" in bad[0]._err
    assert bad[0].key is None


def test_fetch_per_key_parallelism_bound_and_errors(spark):
    details = {i["key"]: json.dumps({"status": "Closed", "hours": 1.5}) for i in ISSUES}

    def fetch_one(k):
        if k == "FEAS-7":
            raise TimeoutError("slow upstream")
        return details[k]

    keys = spark.createDataFrame([(i["key"],) for i in ISSUES], "key string")
    out = fetch_per_key(
        keys, "key", fetch_one, "status string, hours double",
        max_parallel=3, requests_per_sec=0.0,
    )
    # the reference's parallelLimit: at most max_parallel concurrent tasks
    assert out.rdd.getNumPartitions() == 3
    rows = {r.key: (r.status, r._err) for r in out.collect()}
    assert len(rows) == len(ISSUES)
    assert rows["FEAS-1"] == ("Closed", None)
    assert rows["FEAS-7"][0] is None and "slow upstream" in rows["FEAS-7"][1]


def test_fetch_per_key_paces_to_rate(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(8)], "key string")
    t0 = time.monotonic()
    out = fetch_per_key(
        keys, "key", lambda k: json.dumps({"v": 1}), "v long",
        max_parallel=1, requests_per_sec=20.0,
    ).collect()
    elapsed = time.monotonic() - t0
    assert len(out) == 8
    # 8 calls on one task at 20/s => >= 7 gaps of 50ms
    assert elapsed >= 0.35
