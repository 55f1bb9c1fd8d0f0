"""A/B: lang_id / quality_score current formulation vs reformulations that
evaluate the tokenization ONCE (single-pass aggregate over one `tokens()`
array + isin membership) and count regex classes without building stripped
string copies (regexp_count).

All variants are exact-value-equal by construction (hit counts, tie-break
structs, char counts identical); parity is asserted per rep before timing
counts. Interleaved, same session. Usage: ... [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F  # noqa: E402

from feasibility_etl_spark.operators.text import (  # noqa: E402
    LANG_STOPWORDS,
    lang_id,
    quality_score,
    tokens,
)
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def lang_id_v2(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(c))
    langs = list(LANG_STOPWORDS)
    # ONE pass over ONE evaluation of toks: array accumulator of per-lang
    # hit counts; isin compiles to In/InSet (hash probe) per token
    init = F.array(*[F.lit(0) for _ in langs])
    scores = F.aggregate(
        toks,
        init,
        lambda acc, t: F.array(
            *[
                acc[i] + t.isin(*LANG_STOPWORDS[lang]).cast("int")
                for i, lang in enumerate(langs)
            ]
        ),
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(scores[i].alias("score"), F.lit(lang).alias("lang"))
                for i, lang in enumerate(langs)
            ]
        )
    )
    cjk = F.regexp_count(c, F.lit(r"[一-鿿]"))
    total_chars = F.length(c) - F.regexp_count(c, F.lit(r"\s"))
    return (
        F.when(
            (total_chars > 0)
            & (cjk.cast("double") > F.lit(0.3) * total_chars.cast("double")),
            F.lit("zh"),
        )
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def quality_score_v2(text, lang: str = "en") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks_l = tokens(F.lower(c))
    words = LANG_STOPWORDS[lang]
    n = F.size(tokens(c)).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    n_nospace = F.length(c) - F.regexp_count(c, F.lit(r"\s"))
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    punct_ratio = F.when(n_nospace == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / n_nospace.cast("double")
    )
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    hits = F.size(F.filter(toks_l, lambda t: t.isin(*words)))
    stop_ratio = F.when(F.size(toks_l) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks_l).cast("double")
    )
    stop_score = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    return (
        length_score * F.lit(0.4)
        + punct_score * F.lit(0.3)
        + stop_score * F.lit(0.3)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-langid")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = load(spark, sf_dir, "documents")

    # parity gates before timing: exact equality on every doc
    mism = docs.select(
        lang_id("text").alias("a"), lang_id_v2("text").alias("b")
    ).where("a <> b").count()
    assert mism == 0, f"lang_id parity broken: {mism} rows"
    mism = docs.select(
        quality_score("text").alias("a"), quality_score_v2("text").alias("b")
    ).where("abs(a - b) > 1e-12").count()
    assert mism == 0, f"quality parity broken: {mism} rows"
    print(json.dumps({"parity": "ok"}), flush=True)

    variants = {
        "lang_cur": lambda: docs.select(lang_id("text").alias("l")),
        "lang_v2": lambda: docs.select(lang_id_v2("text").alias("l")),
        "qual_cur": lambda: docs.select(quality_score("text").alias("q")),
        "qual_v2": lambda: docs.select(quality_score_v2("text").alias("q")),
        "gate_cur": lambda: docs.where(
            (quality_score("text") >= 0.45) & (lang_id("text") != "und")
        ),
        "gate_v2": lambda: docs.where(
            (quality_score_v2("text") >= 0.45) & (lang_id_v2("text") != "und")
        ),
    }
    for rep in range(reps):
        out = {}
        order = list(variants) if rep % 2 == 0 else list(variants)[::-1]
        for k in order:
            spark.sparkContext.setJobDescription(f"rep{rep} {k}")
            t0 = time.time()
            variants[k]().write.format("noop").mode("overwrite").save()
            out[k] = round(time.time() - t0, 3)
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
