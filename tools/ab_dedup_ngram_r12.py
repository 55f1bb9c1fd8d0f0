"""Interleaved A/B for the DEDUP-NGRAM drift (VERDICT r11 item 3).

BENCH history: 2.49 s (r1) -> 3.63 (r10) -> 4.27 (r11) — the only
common-set entry trending monotonically up while its code family kept
changing (adaptive routing r7, cache/broadcast_routing args). The
bench entry q_dedup_ngram passes broadcast_routing=True, so the
suspected routing-count measuring job never runs there — this A/B
instead isolates the FORMULATION: the r1 naive all-pairs token join
(reconstructed verbatim from commit 70fd25b, with the CURRENT
tokenizer so tokenization changes don't confound) vs today's adaptive
StageCache'd prefix-filter path, alternating order, reps>=5, same
session, on the bench corpus.

Run: python tools/ab_dedup_ngram_r12.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from feasibility_etl_spark.operators.dedup import blocked_jaccard_pairs  # noqa: E402
from feasibility_etl_spark.operators.text import tokens  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def r1_blocked_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    # commit 70fd25b's formulation, current tokens()
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.explode(
            F.array_distinct(tokens(F.lower(F.trim(F.col(text_col)))))
        ).alias("tok"),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = toks.alias("a"), toks.alias("b")
    cond = (F.col("a.tok") == F.col("b.tok")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    return (
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session("ab-dedup-ngram")

    def run_r1() -> float:
        t0 = time.time()
        r1_blocked_jaccard_pairs(
            load(spark, sf_dir, "documents"), ["lang", "source"], threshold=0.2
        ).count()
        return time.time() - t0

    def run_cur() -> float:
        t0 = time.time()
        blocked_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            ["lang", "source"],
            threshold=0.2,
            broadcast_routing=True,
        ).count()
        return time.time() - t0

    # warm both code paths once (scan cache, codegen)
    run_r1(), run_cur()
    r1_times, cur_times = [], []
    for i in range(reps):
        if i % 2 == 0:
            r1_times.append(run_r1())
            cur_times.append(run_cur())
        else:
            cur_times.append(run_cur())
            r1_times.append(run_r1())
        print(
            f"rep {i}: r1={r1_times[-1]:.2f}s current={cur_times[-1]:.2f}s",
            flush=True,
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"r1 naive      : median {med(r1_times):.2f}s  all {[round(x,2) for x in r1_times]}")
    print(f"current adapt : median {med(cur_times):.2f}s  all {[round(x,2) for x in cur_times]}")


if __name__ == "__main__":
    main()
