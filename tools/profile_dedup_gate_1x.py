"""Per-batch section attribution for the 1×-batch minhash dedup gate
(VERDICT r10 item 5).

The 1× entry runs at ~0.6 of the measured streaming floor while 10×
amortizes fine, and PERF-NOTES 52's exact-gate A/B showed the obvious
levers are neutral THERE; this measures where the minhash gate's
per-batch time actually goes, so the next lever (or the negative
result) is named from data.

Replays run_dedup_gate_bench's exact 4-batch stream twice per rep,
interleaved:

- mode=stream: the unmodified near_dup_gate_sink end-to-end (the bench
  number).
- mode=sections: the same batches replayed in BATCH mode with the
  sink's own body cut at its section boundaries, each materialized and
  timed (spread+persist, index read, signature build, drop set, final
  combined write). Inserted actions break the one-action discipline on
  purpose — the section sum vs the composed batch time shows how much
  the single-action fusion buys, and the composed-batch sum vs the
  streaming wall shows the foreachBatch/trigger/checkpoint overhead.

Usage: python tools/profile_dedup_gate_1x.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load as cat_load  # noqa: E402
from feasibility_etl_spark.streaming.conf import scoped_shuffle_partitions  # noqa: E402
from feasibility_etl_spark.streaming.dedup_gate import (  # noqa: E402
    _read_index,
    drop_ids,
    near_dup_gate_sink,
)
from feasibility_etl_spark.operators.dedup import minhash_index  # noqa: E402

WIDTH = 8  # run_dedup_gate_bench's shuffle_partitions


def stage_corpus(spark, sf_dir: str, staging: str) -> int:
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)
    return n


def run_stream(spark, staging: str, tag: str) -> float:
    ckpt, out = f"{staging}_ck_{tag}", f"{staging}_out_{tag}"
    for p in (ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    q = near_dup_gate_sink(stream, out, ckpt, shuffle_partitions=WIDTH)
    q.awaitTermination()
    dt = time.time() - t0
    for p in (ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    return dt


def run_sections(spark, staging: str, tag: str) -> dict:
    """The sink body, cut at section boundaries, over the same 8-file /
    4-batch split the stream sees (2 files per trigger)."""
    out = f"{staging}_secout_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    docs_dir = os.path.join(out, "docs")
    files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    batches = [files[i : i + 2] for i in range(0, len(files), 2)]
    acc: dict[str, float] = {}
    composed_total = 0.0
    for batch_id, fs in enumerate(batches):
        with scoped_shuffle_partitions(spark, WIDTH):
            t_all0 = time.time()
            batch = spark.read.schema("doc_id long, text string").parquet(*fs)

            t0 = time.time()
            rb = batch.repartition(WIDTH).persist()
            rb.count()
            acc["spread_persist"] = acc.get("spread_persist", 0) + time.time() - t0

            t0 = time.time()
            index = _read_index(spark, docs_dir, before_batch=batch_id)
            index.count()
            acc["index_read"] = acc.get("index_read", 0) + time.time() - t0

            t0 = time.time()
            new_idx = minhash_index(rb, "text", "doc_id", 32, 8, 3).persist()
            new_idx.count()
            acc["signatures"] = acc.get("signatures", 0) + time.time() - t0

            t0 = time.time()
            drops = drop_ids(rb, index, new_index=new_idx).persist()
            drops.count()
            acc["drop_set"] = acc.get("drop_set", 0) + time.time() - t0

            t0 = time.time()
            combined = rb.join(F.broadcast(new_idx), "doc_id").join(
                F.broadcast(drops), "doc_id", "left_anti"
            )
            combined.write.mode("overwrite").parquet(
                os.path.join(docs_dir, f"batch_id={batch_id}")
            )
            acc["combined_write"] = acc.get("combined_write", 0) + time.time() - t0

            drops.unpersist()
            new_idx.unpersist()
            rb.unpersist()
            composed_total += time.time() - t_all0
    shutil.rmtree(out, ignore_errors=True)
    acc = {k: round(v, 3) for k, v in acc.items()}
    acc["_sections_sum"] = round(sum(acc.values()), 3)
    acc["_batchmode_wall"] = round(composed_total, 3)
    return acc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("profile-dedup-gate-1x")
    staging = "/tmp/spark_graft_gateprof_stage"
    shutil.rmtree(staging, ignore_errors=True)
    n = stage_corpus(spark, sf_dir, staging)
    # warm both paths once, untimed
    run_stream(spark, staging, "warm")
    run_sections(spark, staging, "warm")
    records = []
    for r in range(reps):  # interleaved: stream / sections per rep
        sw = run_stream(spark, staging, f"r{r}")
        sec = run_sections(spark, staging, f"r{r}")
        records.append({"rep": r, "stream_wall": round(sw, 3), **sec})
        print(json.dumps(records[-1]))
    print(json.dumps({"n_rows": n, "rows_per_sec_stream": round(
        n / (sorted(x["stream_wall"] for x in records)[len(records) // 2]), 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
