"""SCD2 dimension history: validity-interval versions + point-in-time reads.

The reference's dimensions are overwrite-in-place (schema.sql:105-134 keeps
exactly one row per natural key), so a fact row joined later sees the dim's
*latest* attributes — history is lost. SCD Type 2 keeps every version as a
``[valid_from, valid_to)`` interval row; the writer closes the open interval
when a tracked attribute changes and opens a new one, and reads resolve a
dimension *as of a timestamp* instead of "current".

Everything here is set-oriented and single-shuffle-per-key:

- :func:`scd2_apply` folds a batch of (key, attrs, effective_ts) changes
  into an existing history. It handles **many versions per key per batch**
  (a window sequences them by effective time), drops no-op changes
  (attributes equal to the immediately preceding version, null-safely), and
  ignores late rows at or before the open version's start. One shuffle on
  the natural key for the sequencing window, one broadcast-sized join
  against the current rows; never a driver loop.
- :func:`scd2_snapshot` is the dimension as of one instant (a filter).
- :func:`scd2_enrich` attaches the version in effect at each fact row's own
  timestamp via the union + carry-forward :func:`asof_join` (one shuffle,
  no interval explosion) — the point-in-time-correct FK resolution a
  feature/training pipeline needs to avoid label leakage.

Version surrogate ids are ``xxhash64(natural_key, valid_from)``: stateless
and deterministic (same posture as ``lookup_or_insert(id_strategy='hash')``),
so re-applying the same batch yields byte-identical history (idempotent).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.joins import asof_join

_META = ("valid_from", "valid_to", "is_current")


def scd2_apply(
    incoming: DataFrame,
    natural_key: str,
    tracked: Sequence[str],
    ts_col: str = "ts",
    hist: DataFrame | None = None,
    id_col: str = "version_sk",
) -> DataFrame:
    """Fold a change batch into an SCD2 history; returns the new history.

    ``incoming``: one row per observed state — (natural_key, *tracked,
    ts_col). ``hist``: the existing history (schema of this function's
    output) or None to bootstrap from scratch.

    Semantics per key, in effective-time order: a row opens a new version
    iff its tracked attributes differ (null-safely) from the version in
    effect just before it; each new version's ``valid_to`` is the next
    version's ``valid_from`` (half-open intervals, no gaps); the last
    version is open (``valid_to`` null, ``is_current`` true) and the
    previously-open version is closed at the first new ``valid_from``.
    Ties on (key, ts) are broken deterministically by the tracked values
    (lowest first) — pre-dedupe upstream if ties are meaningful. Rows at or
    before the open version's ``valid_from`` are ignored as late arrivals:
    rewriting closed intervals is a backfill, not an append, and needs a
    fresh ``scd2_apply`` over the full event log.
    """
    tracked = list(tracked)
    key = natural_key
    # tie-dedupe on the KEY-partitioned window (not (key, ts)) so it shares
    # one hash partitioning — and therefore one Exchange — with the
    # sequencing window below: keep the first row of each ts group
    w_tie = Window.partitionBy(key).orderBy(
        ts_col, *[F.col(c).asc_nulls_first() for c in tracked]
    )
    inc = (
        incoming.select(key, *tracked, ts_col)
        .withColumn("_prev_ts", F.lag(ts_col).over(w_tie))
        .where(F.col("_prev_ts").isNull() | (F.col(ts_col) != F.col("_prev_ts")))
        .drop("_prev_ts")
        .withColumnRenamed(ts_col, "valid_from")
    )

    if hist is not None:
        cur = hist.where(F.col("is_current")).select(
            F.col(key),
            F.struct(*[F.col(c) for c in tracked]).alias("_cur_attrs"),
            F.col("valid_from").alias("_cur_from"),
        )
        inc = inc.join(cur, key, "left").where(
            F.col("_cur_from").isNull() | (F.col("valid_from") > F.col("_cur_from"))
        )
    else:
        # typed null struct so the coalesce below stays well-typed
        inc = inc.withColumn(
            "_cur_attrs", F.when(F.lit(False), F.struct(*[F.col(c) for c in tracked]))
        )

    # a row is a real change iff its attrs differ from the version in effect
    # just before it: the previous batch row for the key, else the open
    # history row. lag() runs before the filter, but a dropped (no-op) row
    # equals its own predecessor, so comparing against it is transitively
    # comparing against the last kept version.
    w_seq = Window.partitionBy(key).orderBy("valid_from")
    inc = inc.withColumn("_attrs", F.struct(*[F.col(c) for c in tracked]))
    changed = inc.withColumn(
        "_base", F.coalesce(F.lag("_attrs").over(w_seq), F.col("_cur_attrs"))
    ).where(~F.col("_attrs").eqNullSafe(F.col("_base")))

    new_rows = (
        changed.select(key, *tracked, "valid_from")
        .withColumn("valid_to", F.lead("valid_from").over(w_seq))
        .withColumn("is_current", F.col("valid_to").isNull())
    )

    if hist is not None:
        first_new = changed.groupBy(key).agg(F.min("valid_from").alias("_close_at"))
        still = hist.where(~F.col("is_current")).drop(id_col)
        closed = (
            hist.where(F.col("is_current"))
            .drop(id_col)
            .join(first_new, key, "left")
            .withColumn("valid_to", F.coalesce(F.col("_close_at"), F.col("valid_to")))
            .withColumn("is_current", F.col("_close_at").isNull())
            .drop("_close_at")
        )
        new_rows = still.unionByName(closed).unionByName(new_rows)

    return new_rows.select(
        F.xxhash64(F.col(key), F.col("valid_from")).alias(id_col),
        key,
        *tracked,
        *_META,
    )


def scd2_snapshot(hist: DataFrame, as_of) -> DataFrame:
    """The dimension as of one instant: rows whose interval covers ``as_of``
    (``valid_from <= as_of < valid_to``, open intervals unbounded). A pure
    filter — pushes down to the parquet scan when history is stored
    partitioned/sorted on the interval columns."""
    ts = F.lit(as_of).cast("timestamp")
    return hist.where(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )


def scd2_enrich(
    fact: DataFrame,
    hist: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time join: each fact row gets the dimension version that was
    in effect at its own timestamp (the as-of read; facts before a key's
    first version get nulls). Versions are keyed by ``valid_from``, so this
    is exactly the backward :func:`asof_join` — one shuffle on the key, no
    per-interval row explosion."""
    versions = hist.drop("valid_to", "is_current")
    return asof_join(
        fact,
        versions,
        on=on,
        left_ts=ts_col,
        right_ts="valid_from",
        right_prefix=right_prefix,
    )


@dataclass(frozen=True)
class Scd2DimSpec:
    """A history-tracked dimension in the denormalizing writer.

    ``wide_key`` is the wide-frame column holding the natural key;
    ``tracked`` are the wide-frame attribute columns whose changes open new
    versions. The fact keeps ``fk_col`` = the version surrogate in effect
    at the fact row's own timestamp. One spec per role; role-playing the
    same history twice means two specs sharing a pre-updated ``hist`` (pass
    the same frame, update it once upstream).
    """

    name: str
    wide_key: str
    natural_key: str
    tracked: tuple[str, ...] = field(default_factory=tuple)
    fk_col: str = "fk"
    id_col: str = "version_sk"


@dataclass
class PitResult:
    fact: DataFrame
    hists: dict[str, DataFrame]


def write_denormalized_scd2(
    wide: DataFrame,
    specs: list[Scd2DimSpec],
    hists: dict[str, DataFrame | None],
    ts_col: str = "ts",
) -> PitResult:
    """Decompose a denormalized frame into fact + SCD2 dim histories (pure,
    no I/O — the history-tracking twin of ``write_denormalized``).

    Per spec: the wide frame's (key, tracked, ts) observations fold into
    the dimension's history via :func:`scd2_apply`, then every fact row
    resolves ``fk_col`` to the version in effect AT ITS OWN event time via
    :func:`scd2_enrich` — never the latest version, so replaying old facts
    yields the FKs they had then (point-in-time correctness), and a later
    attribute change never rewrites an already-written fact. Natural-key
    and tracked columns leave the fact (they live in the history).
    """
    out_hists: dict[str, DataFrame] = {}
    fact = wide
    for spec in specs:
        tracked = list(spec.tracked)
        incoming = wide.select(
            F.col(spec.wide_key).alias(spec.natural_key),
            *[F.col(c) for c in tracked],
            F.col(ts_col),
        ).where(F.col(spec.wide_key).isNotNull())
        hist = scd2_apply(
            incoming,
            spec.natural_key,
            tracked,
            ts_col=ts_col,
            hist=hists.get(spec.name),
            id_col=spec.id_col,
        )
        out_hists[spec.name] = hist
        enriched = scd2_enrich(
            fact.withColumnRenamed(spec.wide_key, spec.natural_key),
            hist,
            on=spec.natural_key,
            ts_col=ts_col,
            right_prefix="_pit_",
        )
        keep = [
            c
            for c in enriched.columns
            if not c.startswith("_pit_") and c != spec.natural_key and c not in tracked
        ]
        fact = enriched.select(*keep, F.col(f"_pit_{spec.id_col}").alias(spec.fk_col))
    return PitResult(fact=fact, hists=out_hists)
