"""Interleaved A/B: the r11 line_dedup formulation (offender left-join at
line grain + doc-keyed rebuild agg shuffling EVERY line's text + fp;
inlined below verbatim) vs the current operator (fp-windowed decide pass
over coordinates → dropped-positions sliver → map-side rebuild from the
original scan). Parity-checked row-identical at sf0.001 and sf0.01 (both
modes) before timing at $SPARK_GRAFT_SF_DIR over the LINE-DEDUP entry's
_structured_docs input.

Session-6 verdicts (sf0.1/32 interleaved; sf1 = tools/make_scale_dir.py
dir, shuffle bytes via the UI REST API on an ui-enabled session):
- 3-eval variant (freq agg + offender join at line grain + rebuild):
  REJECTED — sf0.1 old 0.863 vs new 1.094 med (the third evaluation of
  the in-plan _structured_docs regex input is the cost).
- groupBy(fp,doc)+window variant: sf0.1 1.074 vs 1.179 med (still one
  extra coordinate exchange); sf1 shuffle 562->364 MB.
- SHIPPED dense_rank-window variant (one coordinate exchange, binary
  md5): sf0.1 old 1.044 vs new 1.070 med (tie within band); sf1 shuffle
  write 562.3 -> 257.1 MB (0.46x), executor time 105.4 -> 80.6 s
  (0.76x), wall a wash on a noisy host; line text never exchanged.
Usage:
    python tools/ab_linededup_r12.py [--reps=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import line_dedup  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402


def line_dedup_r11(df, text_col="text", id_col="doc_id", mode="drop_common",
                   min_docs=2):
    """The pre-r12 formulation, verbatim (for the A/B's 'old' arm)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_line"),
    )
    norm = F.lower(F.trim(F.col("_line")))
    hashed = lines.withColumn(
        "_fp", F.when(norm == "", F.lit(None)).otherwise(F.md5(norm))
    )
    freq = (
        hashed.where(F.col("_fp").isNotNull())
        .groupBy("_fp")
        .agg(F.countDistinct(id_col).alias("_docs"), F.min(id_col).alias("_keeper"))
    )
    if mode == "drop_common":
        offenders = freq.where(F.col("_docs") >= min_docs).select(
            "_fp", F.lit(None).cast("long").alias("_keeper")
        )
        keep = F.col("_hit").isNull()
    elif mode == "keep_first":
        offenders = freq.where(F.col("_docs") >= 2).select("_fp", "_keeper")
        keep = F.col("_hit").isNull() | (F.col(id_col) == F.col("_keeper"))
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    marked = hashed.join(
        offenders.withColumn("_hit", F.lit(1)), "_fp", "left"
    ).withColumn("_keep", keep)
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("_ln"), F.col("_line")))
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text"),
    ).select(id_col, "text", "n_lines", "n_kept")


def _input(spark, sf_dir):
    from feasibility_etl_spark.driver_queries.views_dedup_corpus import (
        _structured_docs,
    )

    return _structured_docs(spark, sf_dir)


def parity(spark, sf_dir):
    docs = _input(spark, sf_dir)
    for mode in ("drop_common", "keep_first"):
        a = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
            for r in line_dedup_r11(docs, mode=mode).collect()
        }
        b = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
            for r in line_dedup(docs, mode=mode).collect()
        }
        assert a == b, (
            f"PARITY MISMATCH at {sf_dir} mode={mode}: "
            f"{len(a)} vs {len(b)} rows"
        )
        print(f"parity OK at {sf_dir} mode={mode}: {len(a)} rows", flush=True)


def main():
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-linededup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    parity(spark, "/root/testdata/sf0.001")
    parity(spark, "/root/testdata/sf0.01")

    docs = _input(spark, sf_dir)

    def t_old():
        t0 = time.time()
        line_dedup_r11(docs).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def t_new():
        t0 = time.time()
        line_dedup(docs).write.format("noop").mode("overwrite").save()
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
