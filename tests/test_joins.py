"""Join operators (SURVEY §2.3): broadcast dim joins, attach, lookup-or-insert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feasibility_etl_spark.operators.joins import attach_detail, dim_join, lookup_or_insert


def test_dim_join_is_broadcast_left(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], "k int, fk int")
    dim = spark.createDataFrame([(10, "a")], "id int, name string")
    out = dim_join(fact, dim, fact["fk"] == dim["id"])
    rows = {r.k: r.name for r in out.collect()}
    assert rows == {1: "a", 2: None}  # LEFT: unmatched fact rows survive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_attach_detail_left(spark):
    parent = spark.createDataFrame([("K1",), ("K2",)], "key string")
    detail = spark.createDataFrame([("K1", 5)], "key string, v int")
    rows = {r.key: r.v for r in attach_detail(parent, detail, "key").collect()}
    assert rows == {"K1": 5, "K2": None}


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
    )


def test_lookup_or_insert_continues_sequence(spark):
    dim = _dim(spark, [(1, "alice"), (2, "bob")])
    incoming = spark.createDataFrame([("bob",), ("carol",), ("dave",), ("carol",)], "name string")
    out = {r.name: r.id for r in lookup_or_insert(dim, incoming, "name").collect()}
    # existing keep ids; new get dense ids continuing from max (plpgsql
    # get_user_id semantics, schema.sql:123-134)
    assert out == {"alice": 1, "bob": 2, "carol": 3, "dave": 4}


def test_lookup_or_insert_ignores_nulls_and_is_stable(spark):
    dim = _dim(spark, [])
    incoming = spark.createDataFrame([("b",), (None,), ("a",)], "name string")
    out1 = sorted((r.id, r.name) for r in lookup_or_insert(dim, incoming, "name").collect())
    out2 = sorted((r.id, r.name) for r in lookup_or_insert(dim, incoming, "name").collect())
    assert out1 == [(1, "a"), (2, "b")]  # ordered by natural key, no null row
    assert out1 == out2


def test_lookup_or_insert_hash_strategy(spark):
    # hash mode: stateless xxhash64 ids — no window sort, no max(id) scan;
    # existing rows keep their ids, new rows get the hash of their key
    dim = _dim(spark, [(1, "alice")])
    incoming = spark.createDataFrame([("alice",), ("bob",), (None,)], "name string")
    out = lookup_or_insert(dim, incoming, "name", id_strategy="hash")
    got = {r.name: r.id for r in out.collect()}
    expected_bob = spark.sql("SELECT xxhash64('bob') AS h").collect()[0].h
    assert got == {"alice": 1, "bob": expected_bob}
    # no Window/Sort node in the plan (the whole point of the escape hatch)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # deterministic across runs
    got2 = {r.name: r.id for r in lookup_or_insert(dim, incoming, "name", id_strategy="hash").collect()}
    assert got == got2
    with pytest.raises(ValueError, match="id_strategy"):
        lookup_or_insert(dim, incoming, "name", id_strategy="uuid")


def test_salted_join_matches_plain_join(spark):
    from feasibility_etl_spark.operators.joins import salted_join

    # skewed: one hot key with 1000 rows
    skewed = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", i) for i in range(5)],
        "k string, row_id long",
    )
    other = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("absent", "A")], "k string, tag string"
    )
    plain = {(r.k, r.row_id, r.tag) for r in skewed.join(other, "k").collect()}
    salted = {
        (r.k, r.row_id, r.tag)
        for r in salted_join(skewed, other, "k", salt_col="row_id", n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 1005


def test_salted_join_rejects_replicated_side_preserving_joins(spark):
    import pytest

    from feasibility_etl_spark.operators.joins import salted_join

    skewed = spark.createDataFrame([("hot", 1)], "k string, row_id long")
    other = spark.createDataFrame([("hot", "H")], "k string, tag string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(skewed, other, "k", salt_col="row_id", n_salts=8, how=how)
    # left variants stay accepted
    out = salted_join(skewed, other, "k", salt_col="row_id", n_salts=8, how="left")
    assert out.count() == 1


def test_salted_agg_matches_plain_agg(spark):
    from pyspark.sql import functions as F

    from feasibility_etl_spark.operators.joins import salted_agg

    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(1000)] + [("cold", i, 1.0) for i in range(3)],
        "k string, row_id long, v double",
    )
    plain = {
        (r.k, r.n, r.total)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.round("v", 0).cast("long")).alias("total")
        ).collect()
    }
    two_stage = {
        (r.k, r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.round("v", 0).cast("long")).alias("pt"),
            ],
            final_aggs=[F.sum("pn").alias("n"), F.sum("pt").alias("total")],
            salt_col="row_id",
            n_salts=8,
        ).collect()
    }
    assert two_stage == plain


def _asof_frames(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [
            (1, "u1", dt(2024, 1, 1, 10, 0)),
            (2, "u1", dt(2024, 1, 1, 12, 0)),
            (3, "u2", dt(2024, 1, 1, 11, 0)),
            (4, "u3", dt(2024, 1, 1, 9, 0)),   # u3 has no right rows at all
        ],
        "obs_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", dt(2024, 1, 1, 9, 30), 100.0),
            ("u1", dt(2024, 1, 1, 12, 0), 200.0),  # equal ts → inclusive match
            ("u2", dt(2024, 1, 1, 11, 30), 300.0),  # after left → no match
        ],
        "user string, ts timestamp, value double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    from feasibility_etl_spark.operators.joins import asof_join

    left, right = _asof_frames(spark)
    got = {
        r.obs_id: r.right_value
        for r in asof_join(left, right, on="user").collect()
    }
    # obs1 ← 9:30 row; obs2 ← the equal-ts 12:00 row (inclusive);
    # obs3: only right row is LATER → null; obs4: keyless → null
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_asof_join_tolerance_voids_stale_matches(spark):
    from feasibility_etl_spark.operators.joins import asof_join

    left, right = _asof_frames(spark)
    got = {
        r.obs_id: r.right_value
        for r in asof_join(left, right, on="user", tolerance="15 MINUTES").collect()
    }
    # obs1's 9:30 match is 30 min stale → voided; obs2's equal-ts match stays
    assert got == {1: None, 2: 200.0, 3: None, 4: None}


def test_asof_join_keeps_left_rowcount(spark):
    from feasibility_etl_spark.operators.joins import asof_join

    left, right = _asof_frames(spark)
    assert asof_join(left, right, on="user").count() == left.count()


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    from datetime import datetime as dt, timedelta

    from feasibility_etl_spark.operators.joins import range_join

    base = dt(2024, 3, 1, 0, 0)
    anchors = spark.createDataFrame(
        [
            (i, f"u{i % 3}", base + timedelta(minutes=37 * i),
             base + timedelta(minutes=37 * i + 90))
            for i in range(12)
        ],
        "aid long, user string, w_start timestamp, w_end timestamp",
    )
    events = spark.createDataFrame(
        [
            (j, f"u{j % 3}", base + timedelta(minutes=11 * j), float(j))
            for j in range(60)
        ],
        "eid long, user string, ts timestamp, v double",
    )
    got = {
        (r.aid, r.eid)
        for r in range_join(
            anchors, events, start="w_start", end="w_end",
            right_ts="ts", on="user", bucket="1 hour",
        ).collect()
    }
    naive = {
        (r.aid, r.eid)
        for r in anchors.join(events, "user")
        .where(F.col("ts").between(F.col("w_start"), F.col("w_end")))
        .collect()
    }
    assert got == naive and len(got) > 0
    # inclusive bounds: an event exactly at w_start and one at w_end match
    edge_a = spark.createDataFrame(
        [(1, "u", base, base + timedelta(hours=1))],
        "aid long, user string, w_start timestamp, w_end timestamp",
    )
    edge_e = spark.createDataFrame(
        [(1, "u", base, 0.0), (2, "u", base + timedelta(hours=1), 0.0)],
        "eid long, user string, ts timestamp, v double",
    )
    assert (
        range_join(edge_a, edge_e, "w_start", "w_end", "ts", on="user").count() == 2
    )
    # the scale contract: equi-join on (key, bucket), never a nested loop
    plan = (
        range_join(anchors, events, "w_start", "w_end", "ts", on="user")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_join_matches_naive_emits_once(spark):
    from datetime import datetime as dt, timedelta

    from feasibility_etl_spark.operators.joins import interval_overlap_join

    base = dt(2024, 3, 1, 0, 0)
    # long (multi-bucket) intervals: overlapping pairs share MANY 1-hour
    # buckets, so this fails if the emit-once rule double-counts
    left = spark.createDataFrame(
        [
            (i, f"u{i % 2}", base + timedelta(minutes=50 * i),
             base + timedelta(minutes=50 * i + 300))
            for i in range(10)
        ],
        "lid long, user string, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, f"u{j % 2}", base + timedelta(minutes=70 * j),
             base + timedelta(minutes=70 * j + 200))
            for j in range(10)
        ],
        "rid long, user string, r_start timestamp, r_end timestamp",
    )
    out = interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        on="user", bucket="1 hour",
    )
    got = [(r.lid, r.rid) for r in out.collect()]
    assert len(got) == len(set(got))  # exactly-once per pair
    naive = {
        (r.lid, r.rid)
        for r in left.join(right, "user")
        .where(
            (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end"))
        )
        .collect()
    }
    assert set(got) == naive and len(naive) > 0

    # touching endpoints are inclusive
    a = spark.createDataFrame(
        [(1, base, base + timedelta(hours=1))], "lid long, l_start timestamp, l_end timestamp"
    )
    b = spark.createDataFrame(
        [(1, base + timedelta(hours=1), base + timedelta(hours=2)),
         (2, base + timedelta(hours=1, seconds=1), base + timedelta(hours=2))],
        "rid long, r_start timestamp, r_end timestamp",
    )
    touch = interval_overlap_join(a, b, "l_start", "l_end", "r_start", "r_end")
    assert [r.rid for r in touch.collect()] == [1]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
