"""A/B: exact_dedup's groupBy key — fingerprint()'s 32-char md5 hex
string vs the 16-byte unhex binary (§2.3 narrower types; bijective map,
identical groups/survivors). Parity first (row-identical survivors at
sf0.001/sf0.01), then interleaved timing + tracked shuffle bytes at
$SPARK_GRAFT_SF_DIR.

Usage: python tools/ab_exactdedup_bin_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def hex_arm(df):
    """The pre-session-7 formulation (hex-string key), reconstructed so
    the A/B stays reproducible after the operator moved on."""
    from feasibility_etl_spark.operators.text import fingerprint

    h = fingerprint("text").alias("fp")
    keepers = df.select(h, F.col("doc_id")).groupBy("fp").agg(
        F.min("doc_id").alias("doc_id")
    )
    return df.join(keepers, "doc_id", "left_semi")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-xdedup-bin")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from feasibility_etl_spark.observability import JobMetricsTracker
    from feasibility_etl_spark.operators.dedup import exact_dedup
    from feasibility_etl_spark.sources.catalog import load

    for name in ("sf0.001", "sf0.01"):
        docs = load(spark, f"/root/testdata/{name}", "documents")
        a = sorted(r["doc_id"] for r in hex_arm(docs).collect())
        b = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
        assert a == b, f"parity FAILED on {name}"
        print(f"parity ok: {name} ({len(a)} survivors)", flush=True)

    docs = load(spark, sf_dir, "documents")
    tr = JobMetricsTracker(spark)
    for rep in range(reps):
        order = [("hex", hex_arm), ("bin", exact_dedup)]
        if rep % 2:
            order.reverse()
        out = {}
        for nm, fn in order:
            with tr.track(f"{nm}-{rep}"):
                out[nm] = noop(fn(docs))
        print(json.dumps({"rep": rep, **out}), flush=True)
    rows = {r["query"]: r for r in tr.metrics_df().collect()}
    for nm in ("hex-1", "bin-1", f"hex-{reps-1}", f"bin-{reps-1}"):
        if nm in rows:
            r = rows[nm]
            print(json.dumps({"arm": nm, "shuffle_mb": round(r["shuffle_write_bytes"]/1e6, 2),
                              "exec_ms": r["executor_run_ms"]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
