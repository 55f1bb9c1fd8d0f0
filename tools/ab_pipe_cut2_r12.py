"""A/B: PIPE-CORPUS as benched (construction + composed noop action) vs a
variant with a SECOND StageCache.cut at the d5 (decontam) boundary —
replacing that stage's persist with an eager localCheckpoint plan-leaf.

Hypothesis (OPTIMIZATION_r12 'not yet optimized' item 5): the 13k-line
composed plan pays analyzer/optimizer walks at every construction step and
at the final action; a leaf at d5 truncates the pair-stage subtree from
everything downstream. Work executed is identical (d5 is persisted and
computed exactly once either way) — only WHERE the plan is cut changes.

Interleaved A/B/A/B, same session. Usage: ... [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def build(spark, sf_dir: str, cut_d5: bool):
    from feasibility_etl_spark.driver_queries._shared import (
        blocked_jaccard_pairs,
        exact_dedup,
        load,
        quality_score,
        token_count,
    )
    from feasibility_etl_spark.driver_queries.views_dedup_corpus import (
        _structured_docs,
    )
    from feasibility_etl_spark.operators.bpe import DEMO_MERGES, bpe_encode
    from feasibility_etl_spark.operators.corpus import dsir_weights, pack_shards
    from feasibility_etl_spark.operators.dedup import line_dedup, prune_components
    from feasibility_etl_spark.operators.sketches import (
        bloom_decontaminate,
        threshold_filter,
    )
    from feasibility_etl_spark.operators.text import lang_id
    from feasibility_etl_spark.plans.compose import StageCache

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
    pairs = blocked_jaccard_pairs(d3, ["lang", "source"], threshold=0.2,
                                  cache=shared, broadcast_routing=True)
    d4 = prune_components(d3, pairs)
    d5_raw = bloom_decontaminate(d4, raw.where(F.col("doc_id") % 97 == 0))
    d5 = shared.cut(d5_raw) if cut_d5 else shared(d5_raw)
    w = shared(dsir_weights(d5, raw.where(F.col("doc_id") % 101 == 0)))
    gate = threshold_filter(w, "logw_e9", keep_frac=0.25)
    d6 = d5.join(gate.select("doc_id", "logw_e9"), "doc_id")
    d7 = shared(
        pack_shards(
            d6.withColumn("n_tok", token_count("text")), "n_tok", 2000,
            num_buckets=8,
        )
    )
    enc = bpe_encode(d7, DEMO_MERGES)
    out = d7.join(
        enc.select(
            "doc_id",
            F.array_join("bpe_tokens", " ").alias("bpe_text"),
            F.col("n_bpe_tokens").alias("n_bpe_tok"),
        ),
        "doc_id",
    ).select(
        "doc_id", "lang", "source", "n_tok", "shard_id", "logw_e9",
        "n_bpe_tok", "bpe_text",
    )
    return out, shared


def one(spark, sf_dir: str, cut_d5: bool) -> dict:
    t0 = time.time()
    out, shared = build(spark, sf_dir, cut_d5)
    t_build = time.time() - t0
    spark.sparkContext.setJobDescription(f"composed cut_d5={cut_d5}")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    t_act = time.time() - t0
    n = out.count()
    shared.release()
    return {
        "cut_d5": cut_d5,
        "build": round(t_build, 3),
        "action": round(t_act, 3),
        "total": round(t_build + t_act, 3),
        "rows": n,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-cut2")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        for cut_d5 in (False, True) if rep % 2 == 0 else (True, False):
            r = one(spark, sf_dir, cut_d5)
            print(json.dumps({"rep": rep, **r}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
