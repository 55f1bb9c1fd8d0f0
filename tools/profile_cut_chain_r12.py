"""Attribute the PIPE-CORPUS StageCache.cut construction job (d1->d3 chain).

The stage-attribution dict in bench.py times each boundary AFTER the cut has
warmed d2's persist, so the cut job's own ~6.5 s (r12 record) has no internal
breakdown. This times each sub-chain cold to a noop sink, reps on one warm
session. Usage: python tools/profile_cut_chain_r12.py [reps]
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


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile-cut")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    from feasibility_etl_spark.driver_queries.pipelines_joins import quality_score
    from feasibility_etl_spark.driver_queries.views_dedup_corpus import (
        _structured_docs,
    )
    from feasibility_etl_spark.operators.dedup import exact_dedup, line_dedup
    from feasibility_etl_spark.operators.text import lang_id
    from feasibility_etl_spark.sources.catalog import load

    for rep in range(reps):
        out: dict[str, float] = {}
        raw = load(spark, sf_dir, "documents")
        meta = raw.select("doc_id", "lang", "source")
        sd = _structured_docs(spark, sf_dir)

        spark.sparkContext.setJobDescription(f"rep{rep} structured_docs")
        out["structured_docs"] = noop(sd)

        ld = line_dedup(sd).select("doc_id", "text")
        spark.sparkContext.setJobDescription(f"rep{rep} line_dedup")
        out["line_dedup"] = noop(ld)

        d1 = ld.join(meta, "doc_id")
        spark.sparkContext.setJobDescription(f"rep{rep} d1_join_meta")
        out["d1_join_meta"] = noop(d1)

        spark.sparkContext.setJobDescription(f"rep{rep} d1_quality_gate")
        out["d1_quality_only"] = noop(d1.where(quality_score("text") >= 0.45))

        spark.sparkContext.setJobDescription(f"rep{rep} d1_lang_gate")
        out["d1_lang_only"] = noop(d1.where(lang_id("text") != "und"))

        d2 = d1.where((quality_score("text") >= 0.45) & (lang_id("text") != "und"))
        spark.sparkContext.setJobDescription(f"rep{rep} d2_both_gates")
        out["d2_both_gates"] = noop(d2)

        spark.sparkContext.setJobDescription(f"rep{rep} d3_exact_dedup")
        out["d3_exact_dedup"] = noop(exact_dedup(d2))

        # the real construction path: persist d2, checkpoint d3 eagerly
        d2p = d2.persist()
        spark.sparkContext.setJobDescription(f"rep{rep} cut_full")
        t0 = time.time()
        d3 = exact_dedup(d2p).localCheckpoint(eager=True)
        out["cut_full_construction"] = round(time.time() - t0, 3)
        del d3
        d2p.unpersist(blocking=False)
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
