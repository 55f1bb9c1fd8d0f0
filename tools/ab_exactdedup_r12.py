"""Interleaved A/B that REJECTED a lever (operator left unchanged): the
shipped exact_dedup (fingerprint groupBy(min id) + left-semi join keyed
by id, build side = every distinct fingerprint) vs a loser-id variant
(fp-windowed non-min ids of multi-doc groups + broadcast ANTI join,
build side = duplicates only — kept here as `exact_dedup_candidate`).

Session-6 verdict: the candidate LOST at both scales — sf0.1 raw docs
old 0.425 vs new 0.473 med (7 reps interleaved); sf1 executor time
488 -> 517-555 s, wall 16.1 -> 16.7-18.1 s, shuffle write 119.6 vs
110.2 MB (a wash: fingerprint pairs dominate, the corpus is
near-distinct). The per-fp window sort costs more than the hash agg it
replaces, and the duplicate-count build side only pays past a broadcast
ceiling (distinct-doc count) nothing measured approaches. Parity was
row-identical at sf0.001/sf0.01 incl. injected duplicates.
Usage:
    python tools/ab_exactdedup_r12.py [--reps=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import exact_dedup  # noqa: E402
from feasibility_etl_spark.operators.text import fingerprint  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def exact_dedup_candidate(df, text_col="text", id_col="doc_id"):
    """The REJECTED loser-id anti-join variant (the A/B's 'new' arm)."""
    from pyspark.sql import Window

    ids = df.select(
        F.unhex(fingerprint(text_col)).alias("_xdfp"), F.col(id_col)
    )
    w = Window.partitionBy("_xdfp")
    losers = (
        ids.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_min", F.min(id_col).over(w))
        .where((F.col("_n") >= 2) & (F.col(id_col) != F.col("_min")))
        .select(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# arm aliases: 'old' = the shipped operator, 'new' = the rejected candidate
exact_dedup_r11 = exact_dedup


def parity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = sorted(r["doc_id"] for r in exact_dedup(docs).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in exact_dedup_candidate(docs).select("doc_id").collect())
    assert a == b, f"PARITY MISMATCH at {sf_dir}: {len(a)} vs {len(b)} rows"
    # and with injected duplicates (the raw corpus may be near-distinct)
    dup = docs.unionByName(
        docs.limit(50).withColumn("doc_id", F.col("doc_id") + 10**7)
    )
    a = sorted(r["doc_id"] for r in exact_dedup(dup).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in exact_dedup_candidate(dup).select("doc_id").collect())
    assert a == b, f"PARITY MISMATCH (dup-injected) at {sf_dir}"
    print(f"parity OK at {sf_dir}: {len(a)} rows (dup-injected)", flush=True)


def main():
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-exactdedup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    parity(spark, "/root/testdata/sf0.001")
    parity(spark, "/root/testdata/sf0.01")

    docs = load(spark, sf_dir, "documents")

    def t(fn):
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    t(exact_dedup), t(exact_dedup_candidate)  # warm both plans
    old, new = [], []
    for i in range(reps):
        if i % 2 == 0:
            old.append(t(exact_dedup))
            new.append(t(exact_dedup_candidate))
        else:
            new.append(t(exact_dedup_candidate))
            old.append(t(exact_dedup))
    print(json.dumps({
        "old": old, "old_med": sorted(old)[len(old) // 2],
        "new": new, "new_med": sorted(new)[len(new) // 2],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
