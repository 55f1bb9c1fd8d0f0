"""Attribute stream-dedup-gate-10x time: replicate the sink's per-batch work
synchronously over the same 4 micro-batch file slices (same confs the
streaming query runs under: AQE off, scoped shuffle width), timing each
section — vs the streaming entry's end-to-end time. The gap is trigger/
checkpoint/file-source machinery; the sections say where the compute goes.
Usage: python tools/profile_gate10_r12.py [width]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import minhash_index  # noqa: E402
from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load as cat_load  # noqa: E402
from feasibility_etl_spark.streaming.dedup_gate import (  # noqa: E402
    _read_index,
    drop_ids,
)

WIDTH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = build_session("profile-gate10")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    staging = "/tmp/spark_graft_gate10_prof_stage"
    out = staging + "_out"
    for p in (staging, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, SF, "documents").select("doc_id", "text")
    replicas = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.col("text")
            if i == 0
            else F.concat_ws(" ", F.shuffle(tokens("text"))).alias("text"),
        )
        for i in range(10)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big.repartition(8).write.mode("overwrite").parquet(staging)
    files = sorted(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    batches = [files[i : i + 2] for i in range(0, 8, 2)]
    docs_dir = os.path.join(out, "docs")

    # the streaming sink runs with AQE off (structured streaming disables
    # it); replicate so join planning matches
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(WIDTH))
    tot = {"spread": 0.0, "index_read": 0.0, "newidx": 0.0, "write": 0.0}
    t_all = time.time()
    for bid, fl in enumerate(batches):
        t0 = time.time()
        batch = spark.read.parquet(*[os.path.join(staging, f) for f in fl])
        rb = batch.repartition(WIDTH).persist()
        rb.count()  # materialize the spread (the sink folds this into the write)
        t1 = time.time()
        index = _read_index(spark, docs_dir, before_batch=bid)
        t2 = time.time()
        new_idx = minhash_index(rb, "text", "doc_id", 32, 8, 3).persist()
        new_idx.count()
        t3 = time.time()
        drops = drop_ids(rb, index, "text", "doc_id", 0.5, 32, 8, 3,
                         new_index=new_idx)
        combined = (
            rb.join(F.broadcast(new_idx), "doc_id")
            .join(F.broadcast(drops), "doc_id", "left_anti")
        )
        combined.write.mode("overwrite").parquet(
            os.path.join(docs_dir, f"batch_id={bid}")
        )
        t4 = time.time()
        new_idx.unpersist()
        rb.unpersist()
        print(
            f"batch {bid}: spread {t1-t0:.2f} index_read {t2-t1:.2f} "
            f"newidx {t3-t2:.2f} drops+write {t4-t3:.2f}",
            flush=True,
        )
        tot["spread"] += t1 - t0
        tot["index_read"] += t2 - t1
        tot["newidx"] += t3 - t2
        tot["write"] += t4 - t3
    print(f"TOTAL {time.time()-t_all:.2f} sections {tot}", flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
