"""A/B: bpe_encode (array-of-symbols via Arrow, array_join in JVM) vs
bpe_encode_text (split + join inside the Python stage, one string per doc
each way across the Arrow boundary).

Parity first (row-identical bpe_text/n at sf0.001 and sf0.01, including
whitespace-edge fixtures), then interleaved timing at $SPARK_GRAFT_SF_DIR
(default sf0.1), both orders, noop sink.

Usage: python tools/ab_bpe_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.session import build_session  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-bpe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    from feasibility_etl_spark.operators.bpe import (
        DEMO_MERGES,
        bpe_encode,
        bpe_encode_text,
    )
    from feasibility_etl_spark.sources.catalog import load

    def old_frame(docs):
        return bpe_encode(docs, DEMO_MERGES).select(
            "doc_id",
            F.array_join("bpe_tokens", " ").alias("bpe_text"),
            F.col("n_bpe_tokens").alias("n_tok"),
        )

    def new_frame(docs):
        return bpe_encode_text(docs, DEMO_MERGES).select(
            "doc_id",
            "bpe_text",
            F.col("n_bpe_tokens").alias("n_tok"),
        )

    # --- parity: whitespace/unicode edge fixtures ---------------------
    edge = spark.createDataFrame(
        [
            (1, "Hello world"),
            (2, "  tab\tseparated\ttoks  "),
            (3, "line\nbreaks\r\nand\x0bvertical\x0cfeeds"),
            (4, "nbsp stays one-token"),  # \s in Java is ASCII-only
            (5, ""),
            (6, "   "),
            (7, None),
            (8, "MiXeD CaSe Scan canner column"),
            (9, "İstanbul İ unicode lower"),
        ],
        "doc_id long, text string",
    )
    for name, docs in (
        ("edge", edge),
        ("sf0.001", load(spark, "/root/testdata/sf0.001", "documents")),
        ("sf0.01", load(spark, "/root/testdata/sf0.01", "documents")),
    ):
        a = {r["doc_id"]: (r["bpe_text"], r["n_tok"]) for r in old_frame(docs).collect()}
        b = {r["doc_id"]: (r["bpe_text"], r["n_tok"]) for r in new_frame(docs).collect()}
        assert a == b, f"parity FAILED on {name}: " + str(
            {k: (a.get(k), b.get(k)) for k in set(a) | set(b) if a.get(k) != b.get(k)}
        )
        print(f"parity ok: {name} ({len(a)} rows)", flush=True)

    # --- timing: interleaved, both orders ------------------------------
    docs = load(spark, sf_dir, "documents")
    for rep in range(reps):
        order = [("old", old_frame), ("new", new_frame)]
        if rep % 2:
            order.reverse()
        out = {}
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"ab-bpe rep{rep} {name}")
            out[name] = noop(fn(docs))
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
