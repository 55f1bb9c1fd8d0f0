"""r13: split cut_d5 (pairs + CC + prune + decontam, 54 jobs / 94 stages)
into marginal costs: noop each sub-frame in dependency order on one warm
session (persists accumulate, so each delta is that sub-stage's own cost).

Usage: python tools/profile_d5_r13.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def _counts(spark):
    tracker = spark.sparkContext.statusTracker()
    jobs = tracker.getJobIdsForGroup(None)
    n_stages = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is not None:
            n_stages += len(info.stageIds)
    return {"jobs": len(jobs), "stages": n_stages}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile-d5-r13")
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
    from feasibility_etl_spark.operators.dedup import (
        connected_components,
        line_dedup,
        prune_components,
    )
    from feasibility_etl_spark.operators.sketches import bloom_decontaminate
    from feasibility_etl_spark.operators.text import lang_id
    from feasibility_etl_spark.plans.compose import StageCache

    import bench

    for rep in range(reps):
        bench.isolate_entry(spark)
        out: dict[str, object] = {}
        c_prev = _counts(spark)

        def noop(name: str, df) -> None:
            nonlocal c_prev
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"rep{rep} {name}")
            df.write.format("noop").mode("overwrite").save()
            c = _counts(spark)
            out[name] = {
                "sec": round(time.time() - t0, 3),
                "jobs": c["jobs"] - c_prev["jobs"],
                "stages": c["stages"] - c_prev["stages"],
            }
            c_prev = c

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
        noop("pairs", pairs)
        comps = connected_components(pairs)
        noop("components", comps)
        d4 = prune_components(d3, pairs)
        noop("prune", d4)
        d5 = bloom_decontaminate(d4, raw.where(F.col("doc_id") % 97 == 0))
        noop("decontam", d5)
        shared.release()
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
