"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's ``hll_sketch_agg`` / ``hll_union_agg``).

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
