"""Measure the streaming-harness FLOOR for the exact-dedup-gate bench —
the reproducible version of PERF-NOTES 22's methodology, so the gate's
rows/s bar can be judged against what THIS host's engine fixed costs
allow, not against a constant picked on a faster day.

Three tiers, each the same 4-trigger / ~1.25k-docs-per-batch structure as
``bench.run_exact_gate_bench`` (documents at $SPARK_GRAFT_SF_DIR replayed
as a file stream, Trigger.AvailableNow, shuffle_partitions=1):

1. ``noop``         — foreachBatch that does nothing: engine startup,
                      offset WAL + commit log per trigger, plan bring-up.
2. ``passthrough``  — each batch written to parquet unchanged: + the
                      write job.
3. ``semantics``    — md5 fingerprint + within-batch first-occurrence
                      window + write: the gate's irreducible per-batch
                      dataflow with ZERO membership state, bloom io, or
                      index maintenance.

The exact gate cannot beat tier 3; this tool's bar is
``EXACT_GATE_FLOOR_FRACTION_BLOCKWISE × tier3`` (see bench.py — the
0.65 calibrated for block-median measurement, NOT the 0.60 bench.py
applies to its interleaved per-pair-ratio instrument, whose pairing
cancels the host drift this blockwise method keeps). Prints one JSON
line with all three rates and the derived bar.

Usage: python tools/gate_floor.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _run(spark, docs_parquet: str, tier: str, n_rows: int) -> float:
    from pyspark.sql.window import Window

    ckpt = f"/tmp/gate_floor_ckpt_{tier}_{time.time_ns()}"
    out = f"/tmp/gate_floor_out_{tier}_{time.time_ns()}"

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(docs_parquet)
    )

    def process(batch, batch_id: int) -> None:
        if tier == "noop":
            return
        if tier == "passthrough":
            batch.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")
            return
        from feasibility_etl_spark.operators.text import fingerprint

        w = Window.partitionBy("fp").orderBy("doc_id")
        (
            batch.withColumn("fp", fingerprint("text"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .write.mode("overwrite")
            .parquet(f"{out}/batch_id={batch_id}")
        )

    from feasibility_etl_spark.streaming.conf import scoped_shuffle_partitions

    t0 = time.time()
    with scoped_shuffle_partitions(spark, 1):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sec = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    return sec


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feasibility_etl_spark.session import build_session
    from feasibility_etl_spark.sources.catalog import load as cat_load

    spark = build_session("gate-floor")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    staging = "/tmp/gate_floor_stage"
    shutil.rmtree(staging, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)

    import bench

    result: dict[str, object] = {"metric": "gate_floor", "n_rows": n_rows,
                                 "reps": reps, "sf_dir": sf_dir}
    for tier in ("noop", "passthrough", "semantics"):
        secs = sorted(_run(spark, staging, tier, n_rows) for _ in range(reps))
        med = secs[len(secs) // 2]
        result[f"{tier}_sec"] = round(med, 3)
        result[f"{tier}_rows_per_sec"] = round(n_rows / med)
    floor = result["semantics_rows_per_sec"]
    # blockwise methodology (independent tier medians, no interleaving)
    # -> the blockwise bar, NOT the interleaved-pair fraction bench.py
    # applies to its paired instrument (see the two constants' comments)
    result["bar_rows_per_sec"] = round(
        bench.EXACT_GATE_FLOOR_FRACTION_BLOCKWISE * floor
    )
    result["floor_fraction"] = bench.EXACT_GATE_FLOOR_FRACTION_BLOCKWISE
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
