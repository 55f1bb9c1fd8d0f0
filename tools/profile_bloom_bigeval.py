"""Decompose bloom_decontaminate's big-eval cost (VERDICT r7 item 3).

The ×100 probe put bloom_decontam_bigeval's per-row ratio at 0.907 —
the closest any family has come to linear — so this tool separates the
operator's cost into its structural terms BEFORE the next decade turns
a hidden one into a surprise:

  T(N, E, m) ≈ fixed + probe·N + build·E + assemble(m) [+ cross·N·E?]

  - probe·N   — corpus grams × (md5 + 5 bitmask probes), codegen'd
  - build·E   — eval grams × (explode 5 probes + map-combined bit_or)
  - assemble(m) — the DENSE ASSEMBLY: m/32 words collect_list'd and
    array_sort'd into ONE array on ONE task (single-threaded, grows
    with m — and the ~10 bits/gram sizing contract ties m to E)
  - cross·N·E — would mean the design broke; measured via the factorial
    identity T(kN,kE) ≈ T(kN,E) + T(N,kE) − T(N,E)

Cells are timed with the in-plan replicate trick (scale_probe's): no
files written. Run: python tools/profile_bloom_bigeval.py [sf_dir]
[factor]. Prints one JSON line per cell + a decomposition summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_decontaminate,
)
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402
from scale_probe import replicate  # noqa: E402


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def eval_grams_of(docs, ngram: int = 8):
    from feasibility_etl_spark.operators.dedup import shingles

    sh = F.array_distinct(shingles(F.col("text"), n=ngram))
    return docs.select(F.explode(sh).alias("_g")).distinct()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    m_big = 1 << 26

    spark = build_session("bloom-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs1 = load(spark, sf_dir, "documents")
    docsN = replicate(docs1, "doc_id", factor)
    eval1 = docs1.where(F.col("doc_id") % 97 == 0)
    evalN = docsN.where((F.col("doc_id") / factor).cast("long") % 97 == 0)

    out: list[dict] = []

    def rec(op: str, **kw) -> float:
        sec = kw.pop("sec")
        row = {"op": op, "sec": round(sec, 2), **kw}
        out.append(row)
        print(json.dumps(row), flush=True)
        return sec

    # --- build-only: E-scaling at fixed m (explode + bit_or shuffle term)
    b1 = rec("build_E1", sec=timed(bloom_build(eval_grams_of(eval1), "_g", m_bits=m_big)), m=m_big)
    bN = rec(f"build_E{factor}", sec=timed(bloom_build(eval_grams_of(evalN), "_g", m_bits=m_big)), m=m_big)

    # --- build-only: m-scaling at fixed E (the single-task dense assembly)
    for mb in (1 << 18, 1 << 22, 1 << 26, 1 << 28):
        rec(f"build_m{mb.bit_length()-1}", sec=timed(
            bloom_build(eval_grams_of(eval1), "_g", m_bits=mb)), m=mb)

    # --- probe-only: N-scaling against a fixed prebuilt broadcast filter
    filt = bloom_build(eval_grams_of(eval1), "_g", m_bits=m_big).persist()
    filt.count()
    from feasibility_etl_spark.operators.dedup import shingles
    from feasibility_etl_spark.operators.sketches import _bloom_maybe_contains_md5

    def probe_only(docs):
        sh = F.array_distinct(shingles(F.col("text"), n=8))
        grams = docs.select("doc_id", F.explode(sh).alias("_g"))
        return (
            grams.crossJoin(F.broadcast(filt))
            .where(_bloom_maybe_contains_md5(F.md5("_g"), F.col("bloom"), m_big, 5))
            .select("doc_id")
        )

    p1 = rec("probe_N1", sec=timed(probe_only(docs1)), m=m_big)
    pN = rec(f"probe_N{factor}", sec=timed(probe_only(docsN)), m=m_big)
    filt.unpersist()

    # --- factorial cross-term check on the FULL operator
    f11 = rec("full_N1_E1", sec=timed(bloom_decontaminate(docs1, eval1, m_bits=m_big)), m=m_big)
    fN1 = rec(f"full_N{factor}_E1", sec=timed(bloom_decontaminate(docsN, eval1, m_bits=m_big)), m=m_big)
    f1N = rec(f"full_N1_E{factor}", sec=timed(bloom_decontaminate(docs1, evalN, m_bits=m_big)), m=m_big)
    fNN = rec(f"full_N{factor}_E{factor}", sec=timed(bloom_decontaminate(docsN, evalN, m_bits=m_big)), m=m_big)

    additive_pred = fN1 + f1N - f11
    summary = {
        "op": "decomposition",
        "factor": factor,
        "build_per_E_ratio": round(bN / b1, 3),
        "probe_per_N_ratio": round(pN / p1, 3),
        "full_NN_sec": round(fNN, 2),
        "additive_prediction_sec": round(additive_pred, 2),
        "cross_term_sec": round(fNN - additive_pred, 2),
        "cross_term_frac": round((fNN - additive_pred) / fNN, 3),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
