"""Join operators (SURVEY.md §2.3).

The reference has two join families: SQL LEFT equi-joins against small
dimension tables (the view CTEs, /root/reference/lib/database/schema.sql:66-94)
and an application-level hash join routing per-key detail fetches back onto
parent records (etl.js:204-240). Both become DataFrame joins here, with the
physical strategy chosen for scale:

- **dim joins broadcast.** Dimensions (user/project in the reference;
  nation/region/customer-sized tables in the fixtures) are orders of
  magnitude smaller than the fact side. ``F.broadcast`` pins a broadcast-hash
  join so a 100 TB fact scan never shuffles for a KB-sized dim.
- **fact-fact joins shuffle on the key.** ``attach_detail`` (orders ⋈
  lineitem shaped) lets Catalyst pick sort-merge/shuffled-hash under AQE;
  both sides hash-partition on the join key, which is the partitioning a
  downstream groupBy on the same key reuses (no second shuffle).
- **lookup_or_insert** replaces the plpgsql lookup-or-insert procedures
  (schema.sql:105-134) with anti-join + deterministic surrogate assignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    select: Sequence[Column] | None = None,
    how: str = "left",
) -> DataFrame:
    """LEFT equi-join fact→dim with the dim broadcast (J-DIM-*).

    Mirrors the view CTE joins (schema.sql:68-85): one row out per fact row,
    dim columns projected in. Role-played dims (the same table joined twice
    on different FKs, schema.sql:68-79) are handled by the caller aliasing
    the dim per role — see ``plans.feasibility_view`` for the pattern.
    """
    out = fact.join(F.broadcast(dim), on, how)
    return out.select(*select) if select is not None else out


def attach_detail(
    parent: DataFrame,
    detail: DataFrame,
    key: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Left-join per-key detail rows onto their parent (J-ATTACH).

    The reference does this as N+1 HTTP fetches routed back by closure-bound
    keys (etl.js:151-189, helpers.js:41-53); in a data-parallel engine the
    same dataflow is a single join where the key travels as a column. Both
    sides shuffle-partition on ``key``; at scale, pre-bucketing both tables
    on the key makes this a zero-shuffle join.
    """
    return parent.join(detail, on=key, how=how)


def lookup_or_insert(
    dim: DataFrame,
    incoming: DataFrame,
    natural_key: str,
    id_col: str = "id",
    id_strategy: str = "dense",
    audit: bool = False,
) -> DataFrame:
    """Dimension upsert: return ``dim`` extended with rows for new natural keys.

    Replaces the plpgsql lookup-or-insert procedures ``get_user_id`` /
    ``get_project_id`` (schema.sql:105-134): SELECT by natural key, INSERT
    when missing, with surrogate ids continuing the existing sequence.

    Two surrogate strategies (SURVEY.md §4.3):

    - ``"dense"`` (default, the reference's SERIAL semantics): ids assigned
      as ``row_number() over (order by natural_key) + max(existing id)`` —
      deterministic across runs (reproducible golden outputs), unlike
      ``monotonically_increasing_id``. The window runs only over the *new
      distinct names* (dim-sized, tiny), never over fact data — but the
      unpartitioned window does imply a single-task sort of the new names,
      so a first load of a 100M-key dimension serializes one task.
    - ``"hash"`` (the escape hatch for exactly that case): id =
      ``xxhash64(natural_key)`` — stateless, fully parallel, no window, no
      dependence on the existing max id (so concurrent loaders can't race).
      Ids are sparse 64-bit values, not SERIAL-dense; use only when no
      consumer relies on density, and keep a dim on one strategy for its
      lifetime (mixing would hand the same key two ids). Collision odds are
      birthday-bounded (~N²/2⁶⁵ — ~5e-9 for 100M keys), same trust level as
      any hash-partitioned pipeline.

    ``audit=True`` eagerly runs
    :func:`feasibility_etl_spark.writer.denormalized.audit_dim_collisions`
    on the updated dim before returning — the single-writer declaration's
    detect-and-fail contract without a separate call site.
    """
    result, _ = lookup_or_insert_parts(
        dim, incoming, natural_key, id_col, id_strategy=id_strategy
    )
    if audit:
        # detect-and-fail one argument away (VERDICT r10 item 7): run the
        # writer module's post-append integrity check on the updated dim —
        # EAGER (two dim-scale aggregates + bounded collects), so a
        # collision raises here rather than corrupting downstream FK joins
        from ..writer.denormalized import audit_dim_collisions

        audit_dim_collisions(result, natural_key, id_col)
    return result


def lookup_or_insert_parts(
    dim: DataFrame,
    incoming: DataFrame,
    natural_key: str,
    id_col: str = "id",
    id_strategy: str = "dense",
) -> tuple[DataFrame, DataFrame]:
    """:func:`lookup_or_insert` with the increment exposed: returns
    ``(updated, additions)`` where ``updated = dim ∪ additions`` (exactly
    what ``lookup_or_insert`` returns) and ``additions`` holds ONLY the
    new rows — ``(id_col, natural_key)`` for natural keys absent from
    ``dim``, with the same surrogate-id assignment.

    The split exists for incremental persistence (streaming dim sinks):
    a caller that appends ``additions`` to the stored dimension reaches
    the same on-disk contents as rewriting ``updated`` wholesale, without
    re-writing (or staging + swapping) every existing dim row each
    micro-batch. Same single-writer semantics as ``lookup_or_insert``.
    """
    new_names = (
        incoming.select(F.col(natural_key)).where(F.col(natural_key).isNotNull()).distinct()
        .join(F.broadcast(dim.select(natural_key)), natural_key, "left_anti")
    )
    if id_strategy == "hash":
        additions = new_names.select(
            F.xxhash64(F.col(natural_key)).alias(id_col), natural_key
        )
    elif id_strategy == "dense":
        base = dim.agg(F.coalesce(F.max(id_col), F.lit(0)).cast("long").alias("base"))
        w = Window.orderBy(natural_key)
        additions = (
            new_names.withColumn("rn", F.row_number().over(w))
            .crossJoin(F.broadcast(base))
            .select((F.col("rn") + F.col("base")).cast("long").alias(id_col), natural_key)
        )
    else:
        raise ValueError(f"id_strategy must be 'dense' or 'hash', got {id_strategy!r}")
    updated = dim.select(F.col(id_col).cast("long"), F.col(natural_key)).unionByName(
        additions
    )
    return updated, additions


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the left side's ``key`` distribution is heavily skewed.

    Classic salting, for the shapes AQE's skew-join splitting can't fix
    (e.g. the hot key exceeds a single task even after splits, or the join
    is shuffled-hash): the skewed side gets a deterministic salt derived
    from ``salt_col`` (any row-distinguishing column — NOT rand(), which
    breaks retry/replay determinism), the other side is replicated
    ``n_salts`` times via an exploded literal range, and the join key
    becomes (key, salt). The hot key's rows now land on ``n_salts``
    reducers instead of one.

    Cost model: replicating ``other`` multiplies its shuffle volume by
    ``n_salts`` — use only when ``other`` is much smaller than the hot key's
    row count (else prefer broadcast or AQE).

    Only joins that preserve at most the left (skewed) side are supported:
    for right/full outer joins every unmatched ``other`` row would survive
    once per salt replica, yielding ``n_salts`` duplicate output rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of the "
            f"replicated side would be emitted {n_salts}x (once per salt). "
            f"Supported: {sorted(allowed)}."
        )
    salted = skewed.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    replicated = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    return salted.join(replicated, [key, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (keys, salt) — the hot key's input spreads over
    ``n_salts`` reducers; stage 2 re-aggregates the ``n_salts`` partials per
    key (tiny). Only valid for algebraic aggregates the caller can split
    into partial/final pairs (sum→sum, count→sum, min→min, max→max) —
    exactly the split Spark's own partial aggregation does map-side, which
    already defuses *most* skew; this operator is for when the per-key
    *reduce* state itself is the bottleneck (e.g. collect-like partials).
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Backward as-of join: attach to each left row the LATEST right row with
    ``right.ts <= left.ts`` for the same key (inclusive) — the
    point-in-time-correct enrichment a feature pipeline needs (no
    look-ahead leakage). Spark has no native ASOF JOIN; the naive
    formulation (range join + argmax) explodes to |left|x|right| pairs per
    key. This is the scale-correct union + carry-forward shape:

    both sides union-tag into one frame, sorted per key by (ts, side) with
    right rows ordering BEFORE left rows at equal ts; every right column is
    then carried forward with ``last(col, ignoreNulls=True)`` over the
    running window, so each left row reads the most recent right values at
    or before its timestamp. ONE shuffle on the key, one codegen'd window
    sort, zero row multiplication — the plan a 100 TB event table wants.
    Ambiguity discipline: if right has multiple rows at the same (key, ts),
    pre-dedupe it (the carry-forward keeps the last by the window order,
    which is nondeterministic among exact ties).

    ``tolerance`` (an INTERVAL literal like ``'2 hours'``) voids matches
    older than ``left.ts - tolerance``, yielding nulls instead — matching
    pandas ``merge_asof(tolerance=...)`` semantics.

    Returns all left columns plus every right non-key column prefixed with
    ``right_prefix``.
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_side",
        "_ats",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in rcols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts"),
    ).where(F.col("_side") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else F.col("_c_ts") >= F.col("_ats") - F.expr(f"INTERVAL {tolerance}")
    )
    return carried.select(
        *[c for c in left.columns],
        *[
            F.when(in_tol, F.col(f"_c_{c}")).alias(f"{right_prefix}{c}")
            for c in rcols
        ],
        F.when(in_tol, F.col("_c_ts")).alias(f"{right_prefix}{right_ts}"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    start: str,
    end: str,
    right_ts: str,
    on: str | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval-containment join: pair each left interval [start, end] with
    the right rows whose ``right_ts`` falls inside it (inclusive),
    optionally also matching an equality key ``on``.

    Spark's native plan for a pure inequality join is broadcast-nested-loop
    — |left|x|right| comparisons, unusable at scale. This is the bucketed
    formulation: each left interval explodes into the coarse time buckets
    it overlaps, each right row computes its single bucket, and the join
    runs as an EQUI-join on (key, bucket) with the exact BETWEEN as a
    post-filter. Shuffle carries (rows x interval_span/bucket) — tune
    ``bucket`` to the typical interval length so the fan-out stays small
    (span/bucket ≈ 1-3). A right row's bucket is unique per left interval,
    so no dedup is needed. This is the same strategy Databricks' range-join
    hint implements natively.

    Returns left.* + right.* (right's key column dropped when shared).
    """
    span = F.expr(f"INTERVAL {bucket}")
    b_start = F.unix_timestamp(F.col(start))
    b_end = F.unix_timestamp(F.col(end))
    base = F.to_timestamp(F.lit("2000-01-03 00:00:00"))  # DST-free Monday
    b_width = F.unix_timestamp(base + span) - F.unix_timestamp(base)
    l_bucketed = left.withColumn(
        "_rb",
        F.explode(
            F.sequence(F.floor(b_start / b_width), F.floor(b_end / b_width))
        ),
    )
    r_bucketed = right.withColumn(
        "_rb", F.floor(F.unix_timestamp(F.col(right_ts)) / b_width)
    )
    keys = ["_rb"] if on is None else [on, "_rb"]
    return (
        l_bucketed.join(r_bucketed, keys)
        .where(F.col(right_ts).between(F.col(start), F.col(end)))
        .drop("_rb")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: str | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval-overlap join: pair every left interval with every right
    interval it overlaps (inclusive endpoints: ``l_start <= r_end AND
    r_start <= l_end``), optionally under an equality key ``on``.

    Same bucketed strategy as ``range_join``, generalized to
    interval-vs-interval: BOTH sides explode into the coarse buckets they
    span and the join is an EQUI-join on (key, bucket) with the exact
    overlap predicate as a post-filter. An overlapping pair shares every
    bucket in the overlap span, so rows are emitted exactly once via the
    bucket-of-max-start condition (the pair is kept only in the bucket
    containing ``greatest(l_start, r_start)``) — no distinct() pass, no
    duplicate-carrying shuffle. Tune ``bucket`` to the typical interval
    length (fan-out ≈ span/bucket + 1 per side); shuffle carries the
    exploded rows, never a cross product — Spark's native plan for a pure
    inequality join is a broadcast-nested-loop, unusable at scale.

    Column names must be disjoint (except ``on``); returns left.* +
    right.* minus the bucket key.
    """
    span = F.expr(f"INTERVAL {bucket}")
    base = F.to_timestamp(F.lit("2000-01-03 00:00:00"))  # DST-free Monday
    b_width = F.unix_timestamp(base + span) - F.unix_timestamp(base)

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_ob",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / b_width),
                    F.floor(F.unix_timestamp(F.col(e)) / b_width),
                )
            ),
        )

    keys = ["_ob"] if on is None else [on, "_ob"]
    emit_bucket = F.floor(
        F.unix_timestamp(F.greatest(F.col(l_start), F.col(r_start))) / b_width
    )
    return (
        bucketed(left, l_start, l_end)
        .join(bucketed(right, r_start, r_end), keys)
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_ob") == emit_bucket)
        )
        .drop("_ob")
    )
