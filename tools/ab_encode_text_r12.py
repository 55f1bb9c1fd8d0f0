"""A/B: wordpiece_encode / unigram_encode (array grain + JVM array_join)
vs their r12 text-grain siblings (split + join inside the Python stage).
Same harness as tools/ab_bpe_r12.py: parity first (edge fixtures +
sf0.001 + sf0.01), then interleaved timing at $SPARK_GRAFT_SF_DIR.

Usage: python tools/ab_encode_text_r12.py [reps]
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
    spark = build_session("ab-encode-text")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    from feasibility_etl_spark.operators.unigram import (
        DEMO_UG_PIECES,
        unigram_encode,
    )
    from feasibility_etl_spark.operators.wordpiece import (
        DEMO_WP_VOCAB,
        wordpiece_encode,
        wordpiece_encode_text,
    )
    from feasibility_etl_spark.sources.catalog import load

    def unigram_encode_text(df, pieces, max_piece_len: int = 8):
        """The REJECTED text-grain unigram arm (see operators/unigram.py
        tail comment: 0.286 -> 0.299 s median, 10 interleaved sf0.1 reps)
        — kept here, not in the operator module, so the experiment stays
        reproducible without shipping a losing code path."""
        import re

        from pyspark.sql import types as T

        from feasibility_etl_spark.operators.bpe import _JAVA_WS
        from feasibility_etl_spark.operators.unigram import viterbi_word

        src = df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lower(F.trim(F.col("text"))).alias("_lt"),
        )
        bc = df.sparkSession.sparkContext.broadcast(dict(pieces))
        ws = re.compile(_JAVA_WS)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("ug_text", T.StringType()),
                T.StructField("n_ug_tokens", T.LongType()),
            ]
        )

        def run(batches):
            import pandas as pd

            lp = bc.value
            cache: dict[str, tuple[str, int]] = {}
            for pdf in batches:
                out = []
                for did, lt in zip(pdf["doc_id"], pdf["_lt"]):
                    parts = []
                    n = 0
                    for w in ws.split(lt) if lt else []:
                        if not w:
                            continue
                        enc = cache.get(w)
                        if enc is None:
                            segs = viterbi_word(w, lp, max_piece_len)
                            enc = (" ".join(segs), len(segs))
                            cache[w] = enc
                        parts.append(enc[0])
                        n += enc[1]
                    out.append((did, " ".join(parts), n))
                yield pd.DataFrame(
                    out, columns=["doc_id", "ug_text", "n_ug_tokens"]
                )

        return src.mapInPandas(run, schema)

    arms = {
        "wp_old": lambda d: wordpiece_encode(d, DEMO_WP_VOCAB).select(
            "doc_id",
            F.array_join("wp_tokens", " ").alias("t"),
            F.col("n_wp_tokens").alias("n"),
        ),
        "wp_new": lambda d: wordpiece_encode_text(d, DEMO_WP_VOCAB).select(
            "doc_id", F.col("wp_text").alias("t"), F.col("n_wp_tokens").alias("n")
        ),
        "ug_old": lambda d: unigram_encode(d, DEMO_UG_PIECES).select(
            "doc_id",
            F.array_join("ug_tokens", " ").alias("t"),
            F.col("n_ug_tokens").alias("n"),
        ),
        "ug_new": lambda d: unigram_encode_text(d, DEMO_UG_PIECES).select(
            "doc_id", F.col("ug_text").alias("t"), F.col("n_ug_tokens").alias("n")
        ),
    }

    edge = spark.createDataFrame(
        [
            (1, "Hello world"),
            (2, "  tab\tseparated\ttoks  "),
            (3, "line\nbreaks\r\nand\x0bvertical\x0cfeeds"),
            (4, "nbsp stays one-token"),
            (5, ""),
            (6, "   "),
            (7, None),
            (8, "İstanbul STRASSE straße"),
        ],
        "doc_id long, text string",
    )
    for name, docs in (
        ("edge", edge),
        ("sf0.001", load(spark, "/root/testdata/sf0.001", "documents")),
        ("sf0.01", load(spark, "/root/testdata/sf0.01", "documents")),
    ):
        for fam in ("wp", "ug"):
            a = {r["doc_id"]: (r["t"], r["n"]) for r in arms[f"{fam}_old"](docs).collect()}
            b = {r["doc_id"]: (r["t"], r["n"]) for r in arms[f"{fam}_new"](docs).collect()}
            assert a == b, f"parity FAILED {fam} on {name}: " + str(
                {k: (a.get(k), b.get(k)) for k in set(a) | set(b) if a.get(k) != b.get(k)}
            )
        print(f"parity ok: {name}", flush=True)

    docs = load(spark, sf_dir, "documents")
    for rep in range(reps):
        out = {}
        for fam in ("wp", "ug"):
            order = [f"{fam}_old", f"{fam}_new"]
            if rep % 2:
                order.reverse()
            for arm in order:
                spark.sparkContext.setJobDescription(f"ab-encode rep{rep} {arm}")
                out[arm] = noop(arms[arm](docs))
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
