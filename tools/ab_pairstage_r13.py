"""Interleaved A/B for the r13 pair-stage restructure (VERDICT r13 work).

r12 shape: sizes = toks.groupBy(id).count(); tagged = StageCache'd
toks ⋈ sizes ⋈ block_cost (the token table materialized TWICE: once as
the toks persist, once as the tagged persist, plus a token-grain join
to re-attach n_tok).

r13 shape (working tree): n_tok rides row-locally on toks (it is the
size of the distinct-token array the explode consumes), sizes is a
narrow projection of df, and tagged is just toks ⋈ block_cost,
un-persisted (each consumer re-reads the toks persist and re-probes the
reused broadcast).

Parity first (row-identical at the parity SF), then interleaved timing,
alternating order, same session, on the bench corpus.

Run: python tools/ab_pairstage_r13.py [sf_dir] [reps] [parity_sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import (  # noqa: E402
    ADAPTIVE_ALLPAIRS_MAX_PAIRS,
    blocked_jaccard_pairs,
)
from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.plans.compose import StageCache  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def r12_blocked_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    allpairs_max_pairs: int = ADAPTIVE_ALLPAIRS_MAX_PAIRS,
) -> "tuple[DataFrame, StageCache]":
    # commit 6a0fef8's formulation (r12 final), broadcast_routing=True arm
    cache = StageCache()
    toks = cache(
        df.select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.explode(
                F.array_distinct(tokens(F.lower(F.trim(F.col(text_col)))))
            ).alias("tok"),
        )
    )
    sizes = cache(toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok")))
    df_tok = cache(
        toks.groupBy(*block_cols, "tok").agg(F.count(F.lit(1)).alias("_df"))
    )
    block_cost = cache(
        df_tok.groupBy(*block_cols).agg(
            F.sum(F.col("_df") * (F.col("_df") - 1) / 2).cast("long").alias("_cost")
        )
    )
    block_cost = F.broadcast(block_cost)
    tagged = cache(toks.join(sizes, id_col).join(block_cost, block_cols))

    def pair_join(side: DataFrame) -> DataFrame:
        a, b = side.alias("a"), side.alias("b")
        cond = (
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.n_tok") + 1e-9 >= F.lit(threshold) * F.col("b.n_tok"))
            & (F.col("b.n_tok") + 1e-9 >= F.lit(threshold) * F.col("a.n_tok"))
        )
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return a.join(b, cond).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )

    small = tagged.where(F.col("_cost") <= allpairs_max_pairs).select(
        id_col, *block_cols, "tok", "n_tok"
    )
    small_inter = (
        pair_join(small).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_df").asc(), F.col("tok").asc())
    ranked = (
        tagged.where(F.col("_cost") > allpairs_max_pairs)
        .join(df_tok, [*block_cols, "tok"])
        .withColumn("_rn", F.row_number().over(w))
        .where(
            F.col("_rn")
            <= F.col("n_tok") - F.ceil(F.lit(threshold) * F.col("n_tok") - 1e-9) + 1
        )
        .select(id_col, *block_cols, "tok", "n_tok")
    )
    cand = pair_join(ranked).distinct()
    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .unionByName(small_inter)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    return out, cache


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    parity_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    spark = build_session("ab-pairstage-r13")

    # parity: row-identical at the parity SF
    old_out, old_cache = r12_blocked_jaccard_pairs(
        load(spark, parity_dir, "documents"), ["lang", "source"], threshold=0.2
    )
    old_rows = sorted(
        (r.id_a, r.id_b, round(r.jaccard_sim, 12)) for r in old_out.collect()
    )
    old_cache.release()
    new_rows = sorted(
        (r.id_a, r.id_b, round(r.jaccard_sim, 12))
        for r in blocked_jaccard_pairs(
            load(spark, parity_dir, "documents"),
            ["lang", "source"],
            threshold=0.2,
            broadcast_routing=True,
        ).collect()
    )
    assert old_rows == new_rows, (
        f"parity FAIL: {len(old_rows)} old vs {len(new_rows)} new rows"
    )
    print(f"parity OK: {len(old_rows)} identical rows at {parity_dir}", flush=True)

    def run_old() -> float:
        t0 = time.time()
        out, cache = r12_blocked_jaccard_pairs(
            load(spark, sf_dir, "documents"), ["lang", "source"], threshold=0.2
        )
        out.write.format("noop").mode("overwrite").save()
        cache.release()
        return time.time() - t0

    def run_new() -> float:
        t0 = time.time()
        blocked_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            ["lang", "source"],
            threshold=0.2,
            broadcast_routing=True,
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run_old(), run_new()  # warm both paths
    old_times, new_times = [], []
    for i in range(reps):
        if i % 2 == 0:
            old_times.append(run_old())
            new_times.append(run_new())
        else:
            new_times.append(run_new())
            old_times.append(run_old())
        print(
            f"rep {i}: r12={old_times[-1]:.2f}s r13={new_times[-1]:.2f}s",
            flush=True,
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"r12 shape: median {med(old_times):.2f}s  all {[round(x, 2) for x in old_times]}")
    print(f"r13 shape: median {med(new_times):.2f}s  all {[round(x, 2) for x in new_times]}")


if __name__ == "__main__":
    main()
