"""One-shot exact-gate profile at ~100k-docs-per-batch (r8 verdict
item 4): PERF-NOTES 33 predicts the gate's per-batch fixed costs
(query start, WAL/commit, plan bring-up, driver bookkeeping — ~0.9 s/
run + ~0.2 s/batch) amortize away at production batch sizes, leaving
the md5-probe + first-occurrence-window dataflow as the bound; the
largest batch actually measured was 12.5k docs (the 10× bench entry,
~11k rows/s). This replays the 10× recipe at an arbitrary factor —
factor 100 over sf0.1's 5k docs = 500k rows over 4 triggers = 125k
docs/batch — and reports rows/s alongside the floor tiers so the
crossover claim is measured, not extrapolated.

Usage: python tools/profile_gate_100x.py [factor] [reps] [shuffle_partitions]
Prints one JSON line. The third arg (default 8, the bench recipe's width)
exists to measure the probe-bound regime's claim that throughput scales
with the shuffle width (the md5-probe + first-occurrence window is
key-parallel) — run 8 vs 32 at the same factor and compare rows/s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load as cat_load  # noqa: E402
from feasibility_etl_spark.streaming.bloom_gate import (  # noqa: E402
    exact_dedup_gate_sink,
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = build_session("profile-gate-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    staging = "/tmp/spark_graft_xgate100_stage"
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    # same shuffled-word replica recipe as run_exact_gate_10x_bench:
    # replicas keep fingerprints distinct from their parents so the
    # gate's membership path does representative (mostly-novel) work
    replicas = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.col("text")
            if i == 0
            else F.concat_ws(" ", F.shuffle(tokens("text"))).alias("text"),
        )
        for i in range(factor)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    shutil.rmtree(staging, ignore_errors=True)
    big.repartition(8).write.mode("overwrite").parquet(staging)
    n_rows = spark.read.parquet(staging).count()
    m_bits = max(1 << 16, 1 << (n_rows * 10 - 1).bit_length())

    def one_run() -> float:
        ckpt = f"{staging}_ckpt_{time.time_ns()}"
        out = f"{staging}_out_{time.time_ns()}"
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .parquet(staging)
        )
        t0 = time.time()
        q = exact_dedup_gate_sink(
            stream, out, ckpt, m_bits=m_bits, shuffle_partitions=width
        )
        q.awaitTermination()
        sec = time.time() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        return sec

    one_run()  # untimed warm-up (cold costs, PERF-NOTES 39 rationale)
    secs = [round(one_run(), 2) for _ in range(reps)]
    med = sorted(secs)[len(secs) // 2]
    print(json.dumps({
        "metric": "exact_gate_batch_scale",
        "sf_dir": sf_dir,
        "factor": factor,
        "n_rows": n_rows,
        "docs_per_batch": n_rows // 4,
        "m_bits_log2": m_bits.bit_length() - 1,
        "shuffle_partitions": width,
        "reps": reps,
        "rep_secs": secs,
        "median_sec": med,
        "rows_per_sec": round(n_rows / med),
    }))
    shutil.rmtree(staging, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
