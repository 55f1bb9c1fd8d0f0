"""Interleaved A/B: the r11 substring_dedup formulation (agg + self-join +
per-doc window + rebuild agg; inlined below verbatim) vs the current operator
(single gram-window → dup-starts list → map-side rebuild, Python only for the
dup-doc sliver). Parity-checked at sf0.001 and sf0.01 before timing at
$SPARK_GRAFT_SF_DIR. Measured at sf0.1/32 (session 5, interleaved, reps=5
after plan warm-up): old med 4.328 / new med 2.514 (0.58x), identical rows.
Usage:
    python tools/ab_substr_r12.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import substring_dedup  # noqa: E402
from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def substring_dedup_r11(df, text_col="text", id_col="doc_id", k=8):
    """The pre-r12 formulation, verbatim (for the A/B's 'old' arm)."""
    toks = tokens(F.col(text_col))
    tl = tokens(F.lower(F.col(text_col)))
    joined = tl
    for i in range(2, k + 1):
        joined = F.zip_with(
            joined, F.slice(tl, i, F.size(tl)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    z = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                toks, joined,
                lambda t, g: F.struct(t.alias("tok"), g.alias("g")),
            )
        ).alias("pos", "_s"),
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.col("_s.tok").alias("tok"),
        F.col("_s.g").alias("g"),
    ).withColumn(
        "okv", F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
    )
    offenders = (
        z.where(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("okv").alias("_mokv"))
        .where(F.col("_cnt") > 1)
    )
    marked = z.join(offenders, "g", "left").withColumn(
        "_dup",
        (F.col("_mokv").isNotNull() & (F.col("okv") != F.col("_mokv")))
        .cast("int"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    covered = marked.withColumn("_cov", F.max("_dup").over(w))
    return covered.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_cov") == 0,
                            F.struct(F.col("pos"), F.col("tok")),
                        )
                    )
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.col("_cov").cast("long")).alias("n_removed"),
    )


def parity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: (r["text"], r["n_tok"], r["n_removed"])
        for r in substring_dedup_r11(docs, k=8).collect()
    }
    b = {
        r["doc_id"]: (r["text"], r["n_tok"], r["n_removed"])
        for r in substring_dedup(docs, k=8).collect()
    }
    assert a == b, f"PARITY MISMATCH at {sf_dir}: {len(a)} vs {len(b)} rows"
    print(f"parity OK at {sf_dir}: {len(a)} rows identical", flush=True)


def main():
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-substr")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    parity(spark, "/root/testdata/sf0.001")
    parity(spark, "/root/testdata/sf0.01")

    docs = load(spark, sf_dir, "documents")

    def t_old():
        t0 = time.time()
        substring_dedup_r11(docs, k=8).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    def t_new():
        t0 = time.time()
        substring_dedup(docs, k=8).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    t_old(), t_new()  # warm both plans
    old, new = [], []
    for i in range(reps):
        if i % 2 == 0:
            old.append(t_old())
            new.append(t_new())
        else:
            new.append(t_new())
            old.append(t_old())
    print(json.dumps({
        "old": old, "old_med": sorted(old)[len(old) // 2],
        "new": new, "new_med": sorted(new)[len(new) // 2],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
