"""Decompose the r13 pair-stage loss: which delta from the r12 shape
costs the ~1 s — (a) n_tok riding inline on the toks projection (double
tokenize at persist), or (b) n_a/n_b carried through the pair joins +
4-key groupBys (wider shuffle/agg rows)?

Variants (all parity-identical):
  r12      — committed shape: sizes groupBy, tagged=toks⋈sizes⋈bc cached,
             2-key groupBys, final sa/sb joins
  hybrid_a — r12's toks/sizes/tagged EXACTLY, but pairs carry n_a/n_b
             and the sa/sb joins are gone (isolates delta b)
  r13      — working tree: inline n_tok, no sizes, pairs carry n_a/n_b

Run: python tools/ab_pairstage_decomp_r13.py [sf_dir] [reps]
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


def build(df: DataFrame, variant: str, block_cols=("lang", "source"),
          text_col="text", id_col="doc_id", threshold=0.2,
          allpairs_max_pairs=ADAPTIVE_ALLPAIRS_MAX_PAIRS):
    block_cols = list(block_cols)
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
    block_cost = F.broadcast(cache(
        df_tok.groupBy(*block_cols).agg(
            F.sum(F.col("_df") * (F.col("_df") - 1) / 2).cast("long").alias("_cost")
        )
    ))
    tagged = cache(toks.join(sizes, id_col).join(block_cost, block_cols))
    carry = variant == "hybrid_a"

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
        cols = [
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ]
        if carry:
            cols += [F.col("a.n_tok").alias("n_a"), F.col("b.n_tok").alias("n_b")]
        return a.join(b, cond).select(*cols)

    keys = ["id_a", "id_b", "n_a", "n_b"] if carry else ["id_a", "id_b"]
    small = tagged.where(F.col("_cost") <= allpairs_max_pairs).select(
        id_col, *block_cols, "tok", "n_tok"
    )
    small_inter = pair_join(small).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_inter")
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
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .unionByName(small_inter)
    )
    if not carry:
        sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
        inter = inter.join(sa, "id_a").join(sb, "id_b")
    out = inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard_sim"),
    ).where(F.col("jaccard_sim") >= threshold)
    return out, cache


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session("ab-pairstage-decomp-r13")
    docs = lambda: load(spark, sf_dir, "documents")  # noqa: E731

    def run(variant: str) -> float:
        t0 = time.time()
        if variant == "r13":
            blocked_jaccard_pairs(
                docs(), ["lang", "source"], threshold=0.2, broadcast_routing=True
            ).write.format("noop").mode("overwrite").save()
        else:
            out, cache = build(docs(), variant)
            out.write.format("noop").mode("overwrite").save()
            cache.release()
        return time.time() - t0

    variants = ["r12", "hybrid_a", "r13"]
    for v in variants:
        run(v)  # warm
    times = {v: [] for v in variants}
    for i in range(reps):
        order = variants if i % 2 == 0 else variants[::-1]
        for v in order:
            times[v].append(run(v))
        print({v: round(times[v][-1], 2) for v in variants}, flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for v in variants:
        print(f"{v:9s}: median {med(times[v]):.2f}s  all {[round(x, 2) for x in times[v]]}")


if __name__ == "__main__":
    main()
