"""Denormalizing writer (SURVEY §3.2/§7.3) against the reference's golden
corpus: the 5 view-inserts from testing.sql must decompose into fact + dims
exactly as the INSTEAD OF trigger would (schema.sql:141-173)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from feasibility_etl_spark.writer.denormalized import DimSpec, write_denormalized

from golden import golden_wide_df

SPECS = [
    DimSpec(
        name="jira_user",
        natural_key="username",
        roles={"reviewer_name": "fk_reviewer", "reporter_name": "fk_reporter"},
    ),
    DimSpec(name="project", natural_key="name", roles={"project_name": "fk_project"}),
]


def empty_dim(spark, natural_key):
    return spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField(natural_key, T.StringType())]
        ),
    )


@pytest.fixture()
def dims(spark):
    return {"jira_user": empty_dim(spark, "username"), "project": empty_dim(spark, "name")}


def test_dims_get_exact_distinct_names(spark, dims):
    res = write_denormalized(golden_wide_df(spark), SPECS, dims)
    users = {r.username for r in res.dims["jira_user"].collect()}
    projects = {r.name for r in res.dims["project"].collect()}
    # testing.sql:84-91 expectation: dims hold exactly the distinct names
    assert users == {"user1", "user2", "user3", "user4"}
    assert projects == {"PROJECT1", "PROJECT2", "PROJECT4", "PROJECT5"}


def test_surrogate_ids_dense_and_deterministic(spark, dims):
    res1 = write_denormalized(golden_wide_df(spark), SPECS, dims)
    res2 = write_denormalized(golden_wide_df(spark), SPECS, dims)
    ids1 = sorted((r.id, r.username) for r in res1.dims["jira_user"].collect())
    ids2 = sorted((r.id, r.username) for r in res2.dims["jira_user"].collect())
    assert ids1 == ids2, "surrogate assignment must be reproducible across runs"
    assert [i for i, _ in ids1] == [1, 2, 3, 4], "SERIAL-like density from 1"


def test_fact_fk_resolution_role_play(spark, dims):
    res = write_denormalized(golden_wide_df(spark), SPECS, dims)
    users = {r.username: r.id for r in res.dims["jira_user"].collect()}
    fact = {r.key: r for r in res.fact.collect()}
    # insert 4: reviewer user2, reporter user4 — two FKs into the same dim
    assert fact["PROJECT5-2000"].fk_reviewer == users["user2"]
    assert fact["PROJECT5-2000"].fk_reporter == users["user4"]
    # natural-key columns replaced by FKs
    for col in ("reviewer_name", "reporter_name", "project_name"):
        assert col not in res.fact.columns
    assert len(fact) == 5


def test_incremental_upsert_extends_sequence(spark, dims):
    first = write_denormalized(golden_wide_df(spark).limit(2), SPECS, dims)
    # second batch reuses the updated dims: existing names keep ids, new
    # names continue the sequence (get_user_id lookup-or-insert semantics)
    second = write_denormalized(golden_wide_df(spark), SPECS, first.dims)
    u1 = {r.username: r.id for r in first.dims["jira_user"].collect()}
    u2 = {r.username: r.id for r in second.dims["jira_user"].collect()}
    for name, uid in u1.items():
        assert u2[name] == uid, "existing surrogate ids must be stable"
    assert set(u2.values()) == {1, 2, 3, 4}


def test_idempotent_rerun_appends_nothing(spark, dims):
    first = write_denormalized(golden_wide_df(spark), SPECS, dims)
    rerun = write_denormalized(
        golden_wide_df(spark), SPECS, first.dims, existing_fact=first.fact
    )
    # reference gets insert-new-only via swallowed PK violations
    # (helpers.js:100-104 + schema.sql:55); we anti-join explicitly
    assert rerun.fact.count() == 0


def test_not_null_rejection(spark, dims):
    wide = golden_wide_df(spark)
    from pyspark.sql import functions as F

    broken = wide.withColumn(
        "summary", F.when(F.col("key") == "PROJECT2-123", None).otherwise(F.col("summary"))
    )
    res = write_denormalized(
        broken, SPECS, dims, required=["key", "summary", "development_estimate"]
    )
    assert res.rejected.count() == 1
    assert res.fact.count() == 4


def test_partitioned_write_prunes_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from feasibility_etl_spark.sources.catalog import load
    from feasibility_etl_spark.writer.denormalized import write_partitioned

    from conftest import SF0001

    events = load(spark, SF0001, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    n_dates = events.select("event_date").distinct().count()
    assert n_dates > 1, "fixture must span multiple dates for a pruning test"
    path = str(tmp_path / "events_by_date")
    write_partitioned(events, path, ["event_date"])

    back = spark.read.parquet(path)
    one_day = events.select(F.min("event_date")).first()[0]
    q = back.where(F.col("event_date") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan
    # row-level check: pruned read returns exactly that day's rows
    want = events.where(F.col("event_date") == F.lit(one_day)).count()
    assert q.count() == want and want > 0


def test_hash_id_dims_resolve_fks_consistently(spark, dims):
    from dataclasses import replace

    from pyspark.sql import functions as F

    hash_specs = [replace(s, id_strategy="hash") for s in SPECS]
    res = write_denormalized(golden_wide_df(spark), hash_specs, dims)
    users = {r.username: r.id for r in res.dims["jira_user"].collect()}
    # ids are the stateless xxhash64 of the natural key
    expected = {
        r.username: r.h
        for r in spark.createDataFrame([(u,) for u in users], "username string")
        .select("username", F.xxhash64("username").alias("h"))
        .collect()
    }
    assert users == expected
    # every fact FK points at the right hash id (role-played dim included)
    fact = {r.key: r for r in res.fact.collect()}
    assert fact["PROJECT5-2000"].fk_reviewer == users["user2"]
    assert fact["PROJECT5-2000"].fk_reporter == users["user4"]
    # no Window sort anywhere in the dim plan (the strategy's point)
    plan = res.dims["jira_user"]._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    import pyspark.sql.functions as F

    from feasibility_etl_spark.writer.denormalized import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [(d, i, "v1") for d in ("d1", "d2", "d3") for i in range(5)],
        "day string, id long, v string",
    )
    write_partitioned(base, path, ["day"])

    # incremental rerun of day 2 only, with different content
    day2 = spark.createDataFrame(
        [("d2", i, "v2") for i in range(3)], "day string, id long, v string"
    )
    overwrite_partitions(day2, path, ["day"])

    back = spark.read.parquet(path)
    by_day = {
        r.day: (r.n, r.vs)
        for r in back.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_set("v").alias("vs"))
        .collect()
    }
    assert by_day["d1"] == (5, ["v1"]) and by_day["d3"] == (5, ["v1"])
    assert by_day["d2"] == (3, ["v2"])  # replaced, not appended
    # the session default is restored (static)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() != "dynamic"

    # idempotent under retry
    overwrite_partitions(day2, path, ["day"])
    assert spark.read.parquet(path).count() == 13

    # contrast: the naive static overwrite destroys the other days —
    # the footgun overwrite_partitions exists to remove
    write_partitioned(day2, path, ["day"], mode="overwrite")
    assert {r.day for r in spark.read.parquet(path).select("day").distinct().collect()} == {"d2"}


def test_lookup_or_insert_parts_increment_parity(spark):
    # the split API (r12: incremental dim persistence for the streaming
    # sink) must satisfy: updated == lookup_or_insert == dim ∪ additions,
    # additions disjoint from dim, for both id strategies
    from feasibility_etl_spark.operators.joins import (
        lookup_or_insert,
        lookup_or_insert_parts,
    )

    dim = spark.createDataFrame([(1, "alice"), (2, "bob")], "id long, name string")
    inc = spark.createDataFrame(
        [("bob",), ("carol",), (None,), ("dave",)], "name string"
    )
    for strategy in ("dense", "hash"):
        updated, additions = lookup_or_insert_parts(
            dim, inc, "name", id_strategy=strategy
        )
        legacy = lookup_or_insert(dim, inc, "name", id_strategy=strategy)
        got_updated = sorted(map(tuple, updated.collect()))
        assert got_updated == sorted(map(tuple, legacy.collect()))
        got_adds = sorted(map(tuple, additions.collect()))
        assert {n for _, n in got_adds} == {"carol", "dave"}
        # union parity: appending additions to the stored dim reproduces
        # the full updated contents exactly (the sink's append invariant)
        assert sorted([*map(tuple, dim.collect()), *got_adds]) == got_updated


def test_audit_dim_collisions_detects_interleaved_writers(spark):
    from pyspark.sql import functions as F

    from feasibility_etl_spark.operators.joins import lookup_or_insert
    from feasibility_etl_spark.writer.denormalized import (
        DimCollisionError,
        audit_dim_collisions,
    )

    base = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id long, username string"
    )
    # two writers race: both read the SAME base dim (both see max(id)=2)
    # and each lookup_or_insert its own new names — PG sequences make
    # this safe in the reference; dense ids here collide by construction
    w1 = lookup_or_insert(
        base, spark.createDataFrame([("carol",)], "username string"), "username"
    )
    w2 = lookup_or_insert(
        base, spark.createDataFrame([("dave",)], "username string"), "username"
    )
    merged = w1.unionByName(w2).distinct()  # both appends landed
    with pytest.raises(DimCollisionError, match="carol|dave"):
        audit_dim_collisions(merged, "username")

    # same key loaded twice under different ids (replayed writer against
    # a moved base) is the other corruption class
    replay = base.unionByName(
        spark.createDataFrame([(7, "alice")], "id long, username string")
    )
    with pytest.raises(DimCollisionError, match="alice"):
        audit_dim_collisions(replay, "username")

    # a healthy dim passes silently — including after a clean single-
    # writer upsert
    clean = lookup_or_insert(
        base,
        spark.createDataFrame([("carol",), ("dave",)], "username string"),
        "username",
    )
    audit_dim_collisions(clean, "username")
    assert clean.where(F.col("id") > 2).count() == 2


def test_audit_flag_is_one_argument_away(spark):
    # VERDICT r10 item 7: the detect-and-fail contract as a flag on the
    # writer path itself, not a separate call site
    from feasibility_etl_spark.operators.joins import lookup_or_insert
    from feasibility_etl_spark.writer.denormalized import (
        DimCollisionError,
        DimSpec,
        write_denormalized,
    )

    # a base dim ALREADY corrupted by a replayed writer: the flag raises
    # from inside lookup_or_insert, eagerly
    corrupt = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (7, "alice")], "id long, username string"
    )
    inc = spark.createDataFrame([("erin",)], "username string")
    with pytest.raises(DimCollisionError, match="alice"):
        lookup_or_insert(corrupt, inc, "username", audit=True)
    # clean dim + audit flag: silent pass, result identical to unaudited
    base = spark.createDataFrame([(1, "alice")], "id long, username string")
    audited = lookup_or_insert(base, inc, "username", audit=True)
    plain = lookup_or_insert(base, inc, "username")
    assert sorted(map(tuple, audited.collect())) == sorted(map(tuple, plain.collect()))

    # and the same flag on write_denormalized audits every dim it updates
    wide = spark.createDataFrame(
        [("K-1", "alice", "erin")], "key string, reviewer_name string, reporter_name string"
    )
    spec = DimSpec(
        name="jira_user",
        natural_key="username",
        roles={"reviewer_name": "fk_reviewer", "reporter_name": "fk_reporter"},
    )
    res = write_denormalized(wide, [spec], {"jira_user": base}, audit=True)
    assert res.fact.count() == 1
    with pytest.raises(DimCollisionError, match="alice"):
        write_denormalized(wide, [spec], {"jira_user": corrupt}, audit=True)
