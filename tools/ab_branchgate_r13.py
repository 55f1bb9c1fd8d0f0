"""r13 prototype: how many jobs/stages/seconds does the PIPE pair stage
save if the (empty at this corpus) prefix branch is never built?

Arm A: current blocked_jaccard_pairs (both branches, lazy).
Arm B: all-pairs branch only (valid iff max block cost <= the adaptive
bound — asserted first with one job over the same routing aggregate the
real gate would ride).

Both arms noop the pairs frame built over the pipe's d3 with a shared
StageCache, interleaved, plus parity at sf0.01.

Run: python tools/ab_branchgate_r13.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import (  # noqa: E402
    ADAPTIVE_ALLPAIRS_MAX_PAIRS,
    blocked_jaccard_pairs,
)
from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.plans.compose import StageCache  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def allpairs_only(
    df: DataFrame,
    block_cols: list[str],
    text_col="text",
    id_col="doc_id",
    threshold=0.2,
    cache=None,
) -> DataFrame:
    own = cache is None
    if own:
        cache = StageCache()
    _tok_arr = F.array_distinct(tokens(F.lower(F.trim(F.col(text_col)))))
    toks = cache(
        df.select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            _tok_arr.alias("_toks"),
        ).select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.size("_toks").cast("long").alias("n_tok"),
            F.explode("_toks").alias("tok"),
        )
    )
    a, b = toks.alias("a"), toks.alias("b")
    cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col("a.n_tok") + 1e-9 >= F.lit(threshold) * F.col("b.n_tok"))
        & (F.col("b.n_tok") + 1e-9 >= F.lit(threshold) * F.col("a.n_tok"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_tok").alias("n_a"),
            F.col("b.n_tok").alias("n_b"),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard_sim"),
    ).where(F.col("jaccard_sim") >= threshold)


def _counts(spark):
    tracker = spark.sparkContext.statusTracker()
    jobs = tracker.getJobIdsForGroup(None)
    n = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is not None:
            n += len(info.stageIds)
    return len(jobs), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session("ab-branchgate-r13")
    import bench

    # the gate's validity at this corpus: max block cost under the bound
    docs = load(spark, sf_dir, "documents")
    _tok_arr = F.array_distinct(tokens(F.lower(F.trim(F.col("text")))))
    cost = (
        docs.select("lang", "source", F.explode(_tok_arr).alias("tok"))
        .groupBy("lang", "source", "tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .groupBy("lang", "source")
        .agg(F.sum(F.col("_df") * (F.col("_df") - 1) / 2).cast("long").alias("_cost"))
        .agg(F.max("_cost").alias("mx"), F.count(F.lit(1)).alias("nb"))
        .collect()[0]
    )
    print(f"max block cost {cost.mx} vs bound {ADAPTIVE_ALLPAIRS_MAX_PAIRS}, "
          f"{cost.nb} blocks", flush=True)
    assert cost.mx <= ADAPTIVE_ALLPAIRS_MAX_PAIRS

    # parity at sf0.01
    pdocs = load(spark, "/root/testdata/sf0.01", "documents")
    a_rows = sorted(
        (r.id_a, r.id_b, round(r.jaccard_sim, 12))
        for r in blocked_jaccard_pairs(
            pdocs, ["lang", "source"], threshold=0.2, broadcast_routing=True
        ).collect()
    )
    b_rows = sorted(
        (r.id_a, r.id_b, round(r.jaccard_sim, 12))
        for r in allpairs_only(pdocs, ["lang", "source"], threshold=0.2).collect()
    )
    assert a_rows == b_rows, f"parity FAIL {len(a_rows)} vs {len(b_rows)}"
    print(f"parity OK: {len(a_rows)} rows", flush=True)

    def run(arm: str):
        bench.isolate_entry(spark)
        cache = StageCache()
        j0, s0 = _counts(spark)
        t0 = time.time()
        if arm == "full":
            out = blocked_jaccard_pairs(
                docs, ["lang", "source"], threshold=0.2, cache=cache,
                broadcast_routing=True,
            )
        else:
            out = allpairs_only(docs, ["lang", "source"], threshold=0.2, cache=cache)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        j1, s1 = _counts(spark)
        cache.release()
        return dt, j1 - j0, s1 - s0

    runs = {"full": [], "allpairs": []}
    run("full"), run("allpairs")  # warm
    for i in range(reps):
        order = ["full", "allpairs"] if i % 2 == 0 else ["allpairs", "full"]
        for arm in order:
            runs[arm].append(run(arm))
        print({a: runs[a][-1] for a in order}, flush=True)
    for arm, vals in runs.items():
        secs = sorted(v[0] for v in vals)
        print(
            f"{arm:9s}: median {secs[len(secs)//2]:.2f}s  "
            f"jobs {vals[-1][1]}  stages {vals[-1][2]}"
        )


if __name__ == "__main__":
    main()
