"""r13: per-job wall breakdown of the PIPE-CORPUS cut_d5 action.

Builds the d1→d5 chain exactly as pipe_corpus_stage_frames does, runs
the d5 cut, then dumps every Spark job (id, duration, stage count,
description) from the REST-less status tracker via the app status
store, so the 47-job bill is itemized.

Usage: python tools/jobdump_d5_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("jobdump-d5-r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    from feasibility_etl_spark.driver_queries._shared import (
        blocked_jaccard_pairs,
        exact_dedup,
        load,
        quality_score,
    )
    from feasibility_etl_spark.driver_queries.views_dedup_corpus import (
        _structured_docs,
    )
    from feasibility_etl_spark.operators.dedup import line_dedup, prune_components
    from feasibility_etl_spark.operators.sketches import bloom_decontaminate
    from feasibility_etl_spark.operators.text import lang_id
    from feasibility_etl_spark.plans.compose import StageCache

    import bench

    for rep in range(2):
        bench.isolate_entry(spark)
        raw = load(spark, sf_dir, "documents")
        meta = raw.select("doc_id", "lang", "source")
        d1 = (
            line_dedup(_structured_docs(spark, sf_dir))
            .select("doc_id", "text")
            .join(meta, "doc_id")
        )
        shared = StageCache()
        d2 = shared(
            d1.where((quality_score("text") >= 0.45) & (lang_id("text") != "und"))
        )
        d3 = shared.cut(exact_dedup(d2))
        pairs = blocked_jaccard_pairs(
            d3, ["lang", "source"], threshold=0.2, cache=shared,
            broadcast_routing=True, branch_gate=True,
        )
        d4 = prune_components(d3, pairs)

        jvm = spark.sparkContext._jvm
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"rep{rep} cut d5")
        d5 = shared.cut(bloom_decontaminate(d4, raw.where(F.col("doc_id") % 97 == 0)))
        wall = time.time() - t0
        after = tracker.getJobIdsForGroup(None)
        store = spark.sparkContext._jsc.sc().statusStore()
        jl = store.jobsList(None)
        rows = []
        want = {j for j in after if j not in before}
        for i in range(jl.size()):
            j = jl.apply(i)
            jid = j.jobId()
            if jid not in want:
                continue
            sub = j.submissionTime().get().getTime()
            done = (
                j.completionTime().get().getTime()
                if not j.completionTime().isEmpty()
                else None
            )
            desc = (
                j.description().get() if not j.description().isEmpty() else ""
            )
            rows.append(
                {
                    "job": jid,
                    "ms": (done - sub) if done else None,
                    "stages": j.stageIds().size(),
                    "skipped": j.numSkippedStages(),
                    "desc": str(desc)[:110],
                }
            )
        print(json.dumps({"rep": rep, "wall_sec": round(wall, 2), "n_jobs": len(rows)}))
        for r in sorted(rows, key=lambda r: -(r["ms"] or 0)):
            print(f"  {r['ms']:>6} ms  {r['stages']:>2} st  {r['desc']}", flush=True)
        shared.release()
    spark.stop()


if __name__ == "__main__":
    main()
