"""Denormalizing writer — the trigger replacement (SURVEY.md §3.2, §7.3).

The reference lets clients INSERT denormalized rows into a view; an
``INSTEAD OF INSERT`` trigger decomposes each row into fact + dimension
parts with surrogate-key FKs (/root/reference/lib/database/schema.sql:141-173,
lookup-or-insert at :105-134). Spark has no triggers, so the decomposition is
an explicit, set-oriented engine API:

1. per dimension: distinct new natural keys (across all role columns) →
   anti-join current dim → assign dense deterministic surrogate ids →
   union into the dim;
2. join the wide frame to the updated dims (broadcast — dims are small) to
   resolve each role column into its FK;
3. idempotency: anti-join the fact on its primary key before append. The
   reference gets insert-new-keys-only behavior accidentally (PK violations
   swallowed per-row, helpers.js:100-104 + schema.sql:55); we make it
   explicit.

Single-writer batch semantics (matches the reference's one-script-run
model); concurrent writers would need an external lock or Delta-style
transaction log, out of scope per the reference's own semantics. That
declaration is DETECT-AND-FAIL, not trust: the reference's PG sequences
+ trigger tolerate concurrent inserts (schema.sql:105-134,170-173) and a
multi-pipeline user will eventually run two loads at once — so
:func:`audit_dim_collisions` checks a dimension AFTER append for exactly
the corruption interleaved writers produce (one dense id on two natural
keys, or one key under two ids) and raises with the offending rows.
Run it post-append on every dense-strategy dim; the "hash" strategy is
race-free by construction (stateless ids) and only the same-key-two-ids
check applies.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import lookup_or_insert_parts
from ..quality.gates import validate_not_null


@dataclass(frozen=True)
class DimSpec:
    """One dimension's mapping from the wide (denormalized) surface.

    ``roles`` maps wide-frame columns to the FK columns they become — e.g.
    ``jira_user`` is role-played twice (schema.sql:68-79):
    ``{"reviewer_name": "fk_reviewer", "reporter_name": "fk_reporter"}``.
    """

    name: str
    natural_key: str  # dim-side natural-key column, e.g. "username"
    roles: dict[str, str] = field(default_factory=dict)  # wide col -> fk col
    id_col: str = "id"
    #: surrogate strategy, passed through to ``lookup_or_insert``: "dense"
    #: (SERIAL semantics, reference-faithful, default) or "hash" (stateless
    #: xxhash64 ids — no window sort, no max(id) scan; the right call for
    #: huge dims and high-frequency streaming micro-batches where SERIAL
    #: density buys nothing)
    id_strategy: str = "dense"


@dataclass
class DenormResult:
    fact: DataFrame
    dims: dict[str, DataFrame]
    rejected: DataFrame  # rows violating NOT NULL constraints (E-ISOLATE)
    #: per-dim NEW rows only (dims[name] == stored dim ∪ dim_increments[name]):
    #: incremental sinks append these instead of rewriting the whole dim
    dim_increments: dict[str, DataFrame] = field(default_factory=dict)


def write_denormalized(
    wide: DataFrame,
    specs: list[DimSpec],
    dims: dict[str, DataFrame],
    existing_fact: DataFrame | None = None,
    fact_key: str = "key",
    required: list[str] | None = None,
    audit: bool = False,
) -> DenormResult:
    """Decompose a denormalized frame into fact + dims (pure — no I/O).

    Returns new dim frames (old ∪ new rows), the FK-resolved fact increment
    (new keys only when ``existing_fact`` is given), and constraint-violating
    rows. Callers persist with ``result.fact.write.parquet(...)`` etc.; the
    decomposition itself is one lazily-built DAG.

    ``audit=True`` makes the single-writer declaration detect-and-fail one
    argument away (VERDICT r10 item 7): each updated dim is eagerly run
    through :func:`audit_dim_collisions` before the result returns, so an
    interleaved writer's overlapping dense ids raise
    :class:`DimCollisionError` here instead of silently mis-keying the
    fact's FK joins. Cost: two dim-scale aggregates per dimension.
    """
    ok, rejected = validate_not_null(wide, required or [])

    out_dims: dict[str, DataFrame] = {}
    increments: dict[str, DataFrame] = {}
    fact = ok
    for spec in specs:
        dim = dims[spec.name]
        # union the natural keys from every role column, then upsert once
        incoming = None
        for wide_col in spec.roles:
            part = ok.select(F.col(wide_col).alias(spec.natural_key))
            incoming = part if incoming is None else incoming.unionByName(part)
        updated, additions = lookup_or_insert_parts(
            dim, incoming, spec.natural_key, spec.id_col, id_strategy=spec.id_strategy
        )
        increments[spec.name] = additions
        if audit:
            audit_dim_collisions(updated, spec.natural_key, spec.id_col)
        out_dims[spec.name] = updated
        # resolve each role column to its FK via broadcast join
        for wide_col, fk_col in spec.roles.items():
            role_dim = updated.select(
                F.col(spec.natural_key).alias(wide_col), F.col(spec.id_col).alias(fk_col)
            )
            fact = fact.join(F.broadcast(role_dim), wide_col, "left").drop(wide_col)

    if existing_fact is not None:
        # no broadcast hint: existing-fact keys grow with the table, so a
        # forced broadcast would eventually OOM the driver at scale — AQE
        # demotes to broadcast on its own while the key set is small and
        # shuffles both sides on the key once it isn't
        fact = fact.join(existing_fact.select(fact_key), fact_key, "left_anti")
    return DenormResult(
        fact=fact, dims=out_dims, rejected=rejected, dim_increments=increments
    )


class DimCollisionError(RuntimeError):
    """A dimension violates surrogate-key integrity — almost always two
    interleaved writers both ran lookup_or_insert from the same base dim
    (both saw the same max(id) and assigned overlapping dense ids)."""


def audit_dim_collisions(
    dim: DataFrame,
    natural_key: str,
    id_col: str = "id",
    sample: int = 5,
) -> None:
    """Post-append dimension integrity check — the detect-and-fail
    upgrade of the module's single-writer declaration.

    Raises :class:`DimCollisionError` when any surrogate id maps to more
    than one natural key, or any natural key holds more than one id —
    the two corruptions concurrent ``lookup_or_insert`` writers produce
    (PG's sequences make this impossible in the reference; Spark has no
    sequence, so the engine must CHECK instead). Cost: two dim-scale
    aggregates (dimensions are small by design — this never touches
    fact data); the error carries up to ``sample`` offending groups so
    the operator can see WHICH keys collided without re-querying."""
    id_dups = (
        dim.groupBy(id_col)
        .agg(
            F.countDistinct(natural_key).alias("_n"),
            F.collect_set(natural_key).alias("_keys"),
        )
        .where(F.col("_n") > 1)
    )
    key_dups = (
        dim.groupBy(natural_key)
        .agg(F.countDistinct(id_col).alias("_n"), F.collect_set(id_col).alias("_ids"))
        .where(F.col("_n") > 1)
    )
    bad_ids = id_dups.limit(sample).collect()
    bad_keys = key_dups.limit(sample).collect()
    if bad_ids or bad_keys:
        parts = []
        if bad_ids:
            parts.append(
                "ids mapping to multiple natural keys: "
                + "; ".join(f"{r[id_col]} -> {sorted(r['_keys'])}" for r in bad_ids)
            )
        if bad_keys:
            parts.append(
                "natural keys holding multiple ids: "
                + "; ".join(
                    f"{r[natural_key]!r} -> {sorted(r['_ids'])}" for r in bad_keys
                )
            )
        raise DimCollisionError(
            "dimension surrogate-key integrity violated (concurrent writers "
            "racing lookup_or_insert from the same base dim?): "
            + " | ".join(parts)
        )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write (``path/col=value/...``).

    The storage-layout half of scan pruning: a reader filtering on a
    partition column touches only matching directories (PartitionFilters in
    the scan node — asserted in tests), so a date-ranged query over years of
    events reads days, not the table. Choose low-cardinality, always-
    filtered columns (date, source); high-cardinality partitioning makes a
    small-files problem instead.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in ``df``, leaving every other partition untouched — the
    incremental-job primitive (rerun yesterday's load without nuking the
    table; plain ``mode("overwrite")`` + partitionBy deletes EVERYTHING
    first, the classic production incident). Implemented with a scoped
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` so the session
    default (static — the safe-by-noisy-failure setting for full
    rewrites) is restored afterwards. Idempotent under retry: a replayed
    job rewrites the same partitions to the same content."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
