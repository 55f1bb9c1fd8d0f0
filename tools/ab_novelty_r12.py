"""A/B: novelty_signals' gram-hash surface — 32-char md5 hex string vs
16-byte unhex(md5) binary across the window+rollup shuffles (§2.3
narrower types). Parity first (row-identical at sf0.001/sf0.01), then
interleaved timing at $SPARK_GRAFT_SF_DIR with shuffle-byte evidence.

Usage: python tools/ab_novelty_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def hex_arm(df, ngram=8):
    """The pre-session-7 formulation: hex-string hash (reconstructed
    here so the A/B stays reproducible after the operator moved on)."""
    from feasibility_etl_spark.operators.dedup import shingles

    sh = F.array_distinct(shingles(F.col("text"), n=ngram))
    grams = df.select(F.col("doc_id"), F.explode(sh).alias("_g")).select(
        "doc_id", F.md5("_g").alias("_h")
    )
    w = Window.partitionBy("_h")
    return (
        grams.withColumn("_nd", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id", "n_grams", "n_shared",
            ((F.col("n_grams") - F.col("n_shared")).cast("double")
             / F.col("n_grams").cast("double")).alias("novelty"),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-novelty")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from feasibility_etl_spark.operators.corpus import novelty_signals
    from feasibility_etl_spark.sources.catalog import load

    for name in ("sf0.001", "sf0.01"):
        docs = load(spark, f"/root/testdata/{name}", "documents")
        a = sorted(map(tuple, hex_arm(docs).collect()))
        b = sorted(map(tuple, novelty_signals(docs).collect()))
        assert a == b, f"parity FAILED on {name}"
        print(f"parity ok: {name} ({len(a)} rows)", flush=True)

    docs = load(spark, sf_dir, "documents")
    for rep in range(reps):
        order = [("hex", hex_arm), ("bin", novelty_signals)]
        if rep % 2:
            order.reverse()
        out = {}
        for nm, fn in order:
            spark.sparkContext.setJobDescription(f"ab-novelty rep{rep} {nm}")
            out[nm] = noop(fn(docs))
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
