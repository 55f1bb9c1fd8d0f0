"""Mergeable sketches (Apache DataSketches via Spark's built-in
functions): HLL distinct counts, KLL quantiles, Theta set algebra.

The 100 TB distinct-counting posture: a corpus too large to re-scan per
question keeps PER-PARTITION sketches (per day, per shard, per source) —
a few KB each — and answers any coarser rollup by MERGING sketches
instead of touching the data again. Exact ``COUNT(DISTINCT)`` at that
scale is a full shuffle of every distinct value per question;
``approx_count_distinct`` is one-shot (its HLL++ buffer is not exposed
for reuse). The DataSketches functions make the sketch itself a column:
build once, union endlessly, estimate anywhere.

Accuracy: lg_k=12 → 4096 registers, relative standard error ≈ 1.6%
(bounds pinned in tests). Below a few hundred distinct values the sketch
is still in exact (coupon) mode and the estimate equals the true count —
the driver oracle exploits this to hash-match exact SQL on
small-cardinality columns; beyond it, error-bound property tests take
over.

Reference parity: the reference engine has no approximate layer (its
only audit is a row count, etl.js:253-259); this extends the E-*/A-*
families per the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-key HLL sketch of ``col``'s distinct values → ``(*keys,
    sketch_col binary)``. One shuffle on the keys, map-side partial
    sketches; values are sketched as strings so heterogeneous sources
    (long ids, labels) share one sketch family."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lg_k)).alias(sketch_col)
    )


def merge_sketches(
    df: DataFrame,
    keys: list[str],
    allow_different_lg_k: bool = False,
    sketch_col: str = "hll",
) -> DataFrame:
    """Roll sketches up to coarser ``keys`` (e.g. daily → all-time) by
    sketch union — never re-scans the underlying data. Empty ``keys``
    gives the single global sketch. Mixed-precision inputs are rejected
    unless ``allow_different_lg_k`` (union degrades to the coarsest)."""
    agg = F.hll_union_agg(
        F.col(sketch_col), F.lit(allow_different_lg_k)
    ).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def with_estimate(
    df: DataFrame,
    sketch_col: str = "hll",
    out_col: str = "n_distinct_est",
    drop_sketch: bool = True,
) -> DataFrame:
    """Attach the rounded distinct-count estimate (long)."""
    out = df.withColumn(
        out_col, F.round(F.hll_sketch_estimate(sketch_col)).cast("long")
    )
    return out.drop(sketch_col) if drop_sketch else out


def quantile_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 800,
    sketch_col: str = "kll",
) -> DataFrame:
    """Per-key KLL quantile sketch of a LONG column — the mergeable
    percentile companion to the HLL family: build per shard/day, merge
    with :func:`merge_quantile_sketches`, read quantiles anywhere. Exact
    ``percentile`` needs a per-key sort; ``approx_percentile`` is
    one-shot. Normalized rank error at k=800 ≈ 0.6% (pinned in tests)."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_bigint(F.col(col), F.lit(k)).alias(sketch_col)
    )


def merge_quantile_sketches(
    df: DataFrame,
    keys: list[str],
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge KLL sketches to coarser keys without re-scanning the data."""
    agg = F.kll_merge_agg_bigint(F.col(sketch_col)).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def with_quantiles(
    df: DataFrame,
    probs: list[float],
    sketch_col: str = "kll",
    prefix: str = "p",
    drop_sketch: bool = True,
) -> DataFrame:
    """Attach one LONG column per requested quantile (``p50``, ``p99``…)."""
    out = df.select(
        "*",
        *[
            F.kll_sketch_get_quantile_bigint(F.col(sketch_col), F.lit(p)).alias(
                f"{prefix}{int(p * 100)}"
            )
            for p in probs
        ],
    )
    return out.drop(sketch_col) if drop_sketch else out


def freq_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    max_items: int = 10_000,
    sketch_col: str = "fi",
) -> DataFrame:
    """Per-key frequent-items sketch of ``col`` (Spark 4's
    ``approx_top_k_accumulate`` state) → ``(*keys, sketch_col struct)``.

    The mergeable heavy-hitters companion to the HLL/KLL/Theta family:
    build per shard/day, union across partitions with
    :func:`merge_freq_sketches`, read the top-k anywhere with
    :func:`top_items` — never re-scan the data per question. Exact
    ``GROUP BY … ORDER BY count`` at corpus scale shuffles every distinct
    value per question; the sketch shuffles ``max_items`` entries per key.
    While the tracked-item budget exceeds the true distinct count the
    counts are EXACT (the driver oracle exploits this on
    low-cardinality columns); past it, heavy hitters dominate the survivor
    set — the skew regime is pinned in tests/test_sketches.py."""
    return df.groupBy(*keys).agg(
        F.expr(f"approx_top_k_accumulate({col}, {int(max_items)})").alias(sketch_col)
    )


def merge_freq_sketches(
    df: DataFrame,
    keys: list[str],
    max_items: int = 10_000,
    sketch_col: str = "fi",
) -> DataFrame:
    """Roll frequent-items sketches up to coarser ``keys`` (daily →
    all-time) by sketch combine — no re-scan. Empty ``keys`` gives the
    single global sketch."""
    agg = F.expr(f"approx_top_k_combine({sketch_col}, {int(max_items)})").alias(
        sketch_col
    )
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def top_items(
    df: DataFrame,
    k: int = 10,
    sketch_col: str = "fi",
    item_col: str = "item",
    count_col: str = "n_est",
) -> DataFrame:
    """Explode each sketch row into its estimated top-``k``
    ``(item, count)`` rows (most-frequent first). Keys carry through;
    the sketch column is dropped."""
    est = F.expr(f"approx_top_k_estimate({sketch_col}, {int(k)})")
    return (
        df.withColumn("_top", est)
        .drop(sketch_col)
        .select("*", F.explode("_top").alias("_t"))
        .drop("_top")
        .select(
            "*",
            F.col("_t.item").alias(item_col),
            F.col("_t.count").alias(count_col),
        )
        .drop("_t")
    )


def threshold_filter(
    df: DataFrame,
    col: str,
    keep_frac: float,
    keys: list[str] | None = None,
    k: int = 65535,
) -> DataFrame:
    """Keep the top ``keep_frac`` of rows by LONG column ``col`` — the
    scale path for score-based data selection (DSIR / LM-quality gates):
    a KLL sketch of the score distribution yields the cut threshold, so
    selection costs one aggregate + a broadcast attach + a filter, never
    a global sort or per-row rank. With ``keys``, thresholds are
    per-group (each stratum keeps its own top fraction).

    The threshold is the ``1 - keep_frac`` quantile under the KLL
    INCLUSIVE rank rule (smallest value whose ≤-rank fraction ≥ p); rows
    STRICTLY ABOVE it survive — the quantile row itself is the last of
    the bottom ``1 - keep_frac``, so with distinct values the kept set
    is exactly the true top fraction, and ties at the cut drop together
    (kept count ≤ ``keep_frac * n``; relax by lowering ``keep_frac``'s
    complement if tie-inclusion is wanted). While ``k`` exceeds the
    (per-group) row count the sketch is exact (the oracle regime); past
    it, the cut drifts by KLL's ~0.6% rank error at k=800 — pinned in
    tests/test_sketches.py.
    """
    p = 1.0 - keep_frac
    keys = keys or []
    thr = F.kll_sketch_get_quantile_bigint(F.col("_kll"), F.lit(p)).alias("_thr")
    sk = quantile_sketches(df, keys, col, k=k, sketch_col="_kll").select(*keys, thr)
    joined = (
        df.join(F.broadcast(sk), keys) if keys else df.crossJoin(F.broadcast(sk))
    )
    return joined.where(F.col(col) > F.col("_thr")).drop("_thr")


def theta_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    sketch_col: str = "theta",
) -> DataFrame:
    """Per-key Theta sketch of ``col``'s distinct values. Theta sketches
    support SET ALGEBRA — union, intersection, difference — so questions
    like "how many distinct users do segments A and B share" or "how
    much of corpus A's vocabulary is absent from B" are sketch-side
    operations, not joins over the raw data. Below ~4k distinct values
    the sketch retains every hash and set estimates are exact (the
    driver oracle exploits this); beyond, relative error ≈ 1/sqrt(k)."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(col).cast("string")).alias(sketch_col)
    )


def contamination_estimate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Sketch-side estimate of corpus↔eval n-gram contamination — the
    cheap scout run before ``corpus.decontaminate``'s exact semi-join.

    One row: ``n_corpus_grams, n_eval_grams, n_shared_grams,
    eval_containment`` (the fraction of the eval set's distinct
    ``ngram``-grams that occur anywhere in the corpus — the number a
    decontamination decision actually needs). Each side is ONE pass:
    explode distinct-per-doc shingles → global Theta sketch; the overlap
    is a sketch intersection, so corpus and eval are never joined. At
    benchmark-sized eval sets the eval sketch is exact; the corpus side
    is a Theta estimate (~1/sqrt(4096) relative error past retention).

    Uses the same shingle normalization as ``corpus.decontaminate`` so
    the estimate predicts what the exact pass will find (parity pinned
    in tests/test_sketches.py).
    """
    from .dedup import shingles

    def _sketch(df_: DataFrame) -> DataFrame:
        grams = df_.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n=ngram))).alias("g")
        )
        return grams.agg(F.theta_sketch_agg("g").alias("th"))

    c, e = _sketch(docs).alias("c"), _sketch(eval_docs).alias("e")
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("c.th"), F.col("e.th"))
    )
    n_eval = F.theta_sketch_estimate(F.col("e.th"))
    return c.crossJoin(e).select(
        F.round(F.theta_sketch_estimate(F.col("c.th"))).cast("long").alias("n_corpus_grams"),
        F.round(n_eval).cast("long").alias("n_eval_grams"),
        F.round(inter).cast("long").alias("n_shared_grams"),
        (inter / n_eval).alias("eval_containment"),
    )


def pairwise_overlap(
    sketches: DataFrame,
    key_col: str,
    sketch_col: str = "theta",
    out_col: str = "n_shared",
) -> DataFrame:
    """Distinct-overlap estimate for every unordered key pair:
    ``(key_a, key_b, n_shared)`` with ``key_a < key_b``. A sketch-side
    cross join over K per-key sketches (K² tiny rows), never a join over
    the underlying data."""
    a, b = sketches.alias("a"), sketches.alias("b")
    return (
        a.join(b, F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
            F.round(
                F.theta_sketch_estimate(
                    F.theta_intersection(F.col(f"a.{sketch_col}"), F.col(f"b.{sketch_col}"))
                )
            ).cast("long").alias(out_col),
        )
    )
