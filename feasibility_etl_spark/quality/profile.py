"""One-pass dataset profiling — per-column completeness/cardinality/range
stats in a single aggregation (the Deequ-style analyzer pass a pipeline
runs before trusting a new drop of training data).

The reference engine has no profiling surface (its only "audit" is the
row-count gate, etl.js:253-259); this extends the E-* quality family per
the training-pipeline mandate.

Plan shape at scale: ONE scan, ONE global aggregate — every statistic is
algebraic (count / min / max / sum) or sketchable (approx distinct), so
partials combine map-side and the shuffle moves one row per partition.
With ``approx_distinct=True`` (the 100 TB default) cardinality uses
HyperLogLog++ (``approx_count_distinct``) and the plan stays a plain
partial/final agg; exact mode (the oracle-parity default here) makes
Catalyst plan one Expand branch per DISTINCT column — fine for a profile
of tens of columns, and still one pass over the data. The per-column
long-format output is produced by ``inline`` over an array literal built
from the single agg row — no second scan, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one aggregation.

    Returns one row per column:
    ``col_name, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val``.

    - ``min_val``/``max_val`` are the native min/max cast to string (the
      min is taken BEFORE the cast, so numeric order is preserved).
    - ``mean_val`` is exact-integer-sum / non-null-count for integral
      columns — bit-stable across engines because the sum is exact — and
      null for every other type (double means are order-dependent; callers
      wanting them should pre-scale to cents, see driver_queries rules).
    - ``n_distinct`` counts non-null distinct values; HLL++ when
      ``approx_distinct`` (plain agg, no Expand — use at corpus scale).
    """
    names = cols or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in names:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__nd_{c}"))
        else:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if isinstance(schema[c], _INTEGRAL):
            # Sum in decimal(38,0): Spark's LONG sum wraps silently on
            # overflow (ANSI off), plausible at corpus scale (1e14 rows ×
            # 1e6 cents > 2^63). Decimal partials stay algebraic — still
            # one pass, map-side combine — and DuckDB's HUGEINT sum agrees.
            mean = (
                F.sum(F.col(c).cast(T.DecimalType(38, 0))).cast("double")
                / F.count(F.col(c)).cast("double")
            )
        else:
            mean = F.lit(None).cast("double")
        aggs.append(mean.alias(f"__mean_{c}"))

    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
                F.col(f"__mean_{c}").alias("mean_val"),
            )
            for c in names
        ]
    )
    return one.select(F.inline(entries))
