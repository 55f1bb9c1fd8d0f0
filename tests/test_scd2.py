"""SCD2 history writer: interval maintenance + point-in-time reads."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from feasibility_etl_spark.writer.scd2 import scd2_apply, scd2_enrich, scd2_snapshot


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _hist_rows(hist):
    return sorted(
        (r.k, str(r.tier), str(r.valid_from), str(r.valid_to), r.is_current)
        for r in hist.collect()
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k string, tier string, ts timestamp")


def test_scd2_update_closes_old_interval_and_opens_new(spark):
    # bootstrap: alice gold @08:00, bob silver @08:00
    h0 = scd2_apply(
        _changes(spark, [("alice", "gold", _ts(8)), ("bob", "silver", _ts(8))]),
        "k",
        ["tier"],
    )
    # alice changes to platinum @12:00; bob unchanged (no-op row)
    h1 = scd2_apply(
        _changes(spark, [("alice", "platinum", _ts(12)), ("bob", "silver", _ts(12))]),
        "k",
        ["tier"],
        hist=h0,
    )
    assert _hist_rows(h1) == [
        ("alice", "gold", "2024-01-01 08:00:00", "2024-01-01 12:00:00", False),
        ("alice", "platinum", "2024-01-01 12:00:00", "None", True),
        ("bob", "silver", "2024-01-01 08:00:00", "None", True),
    ]
    # as-of read at an old timestamp sees the old row
    snap = {r.k: r.tier for r in scd2_snapshot(h1, _ts(10)).collect()}
    assert snap == {"alice": "gold", "bob": "silver"}
    snap_now = {r.k: r.tier for r in scd2_snapshot(h1, _ts(13)).collect()}
    assert snap_now == {"alice": "platinum", "bob": "silver"}


def test_scd2_many_versions_per_batch_and_late_rows(spark):
    h0 = scd2_apply(_changes(spark, [("a", "t1", _ts(8))]), "k", ["tier"])
    # one batch: no-op @9, change @10, change @11, late row @7 (ignored)
    h1 = scd2_apply(
        _changes(
            spark,
            [("a", "t1", _ts(9)), ("a", "t2", _ts(10)), ("a", "t3", _ts(11)), ("a", "t0", _ts(7))],
        ),
        "k",
        ["tier"],
        hist=h0,
    )
    assert _hist_rows(h1) == [
        ("a", "t1", "2024-01-01 08:00:00", "2024-01-01 10:00:00", False),
        ("a", "t2", "2024-01-01 10:00:00", "2024-01-01 11:00:00", False),
        ("a", "t3", "2024-01-01 11:00:00", "None", True),
    ]


def test_scd2_apply_is_idempotent_with_stable_version_sks(spark):
    inc = _changes(spark, [("a", "t1", _ts(8)), ("a", "t2", _ts(10))])
    h1 = scd2_apply(inc, "k", ["tier"])
    sks1 = sorted(r.version_sk for r in h1.collect())
    # re-applying the identical batch on top changes nothing (every row is a
    # no-op or late) and version sks are content-derived, not sequential
    h2 = scd2_apply(inc, "k", ["tier"], hist=h1)
    assert _hist_rows(h2) == _hist_rows(h1)
    assert sorted(r.version_sk for r in h2.collect()) == sks1


def test_scd2_null_attrs_are_versioned_null_safely(spark):
    h = scd2_apply(
        _changes(spark, [("a", None, _ts(8)), ("a", None, _ts(9)), ("a", "t", _ts(10))]),
        "k",
        ["tier"],
    )
    # null==null is a no-op (no version at 9); null->t is a change
    assert _hist_rows(h) == [
        ("a", "None", "2024-01-01 08:00:00", "2024-01-01 10:00:00", False),
        ("a", "t", "2024-01-01 10:00:00", "None", True),
    ]


def test_scd2_enrich_point_in_time_fk_resolution(spark):
    hist = scd2_apply(
        _changes(spark, [("alice", "gold", _ts(8)), ("alice", "platinum", _ts(12))]),
        "k",
        ["tier"],
    )
    facts = spark.createDataFrame(
        [("alice", _ts(9), 1.0), ("alice", _ts(12), 2.0), ("alice", _ts(7), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = {r.v: (r.dim_tier, r.dim_version_sk is not None) for r in
           scd2_enrich(facts, hist, on="k").collect()}
    # fact@9 sees the gold version (not the later platinum one); fact@12 the
    # new version (inclusive); fact@7 predates history -> nulls
    assert out == {1.0: ("gold", True), 2.0: ("platinum", True), 3.0: (None, False)}


def test_write_denormalized_scd2_point_in_time_fks(spark):
    from feasibility_etl_spark.writer.scd2 import Scd2DimSpec, write_denormalized_scd2

    spec = Scd2DimSpec(
        name="actor", wide_key="actor", natural_key="k",
        tracked=("tier",), fk_col="fk_actor",
    )
    wide1 = spark.createDataFrame(
        [("A", "alice", "gold", _ts(8), 1.0), ("B", "bob", "silver", _ts(8), 2.0)],
        "key string, actor string, tier string, ts timestamp, v double",
    )
    r1 = write_denormalized_scd2(wide1, [spec], {"actor": None})
    hist1 = r1.hists["actor"]
    fact1 = {r.key: r.fk_actor for r in r1.fact.collect()}
    v1 = {r.k: r.version_sk for r in hist1.where("is_current").collect()}
    assert fact1 == {"A": v1["alice"], "B": v1["bob"]}
    # dim columns left the fact
    assert set(r1.fact.columns) == {"key", "ts", "v", "fk_actor"}

    # batch 2: alice changes tier @12; order C lands @13 (new version),
    # order D replays an old timestamp @9 (must resolve to the OLD version)
    wide2 = spark.createDataFrame(
        [("C", "alice", "platinum", _ts(13), 3.0), ("D", "alice", "gold", _ts(9), 4.0),
         ("E", "alice", "platinum", _ts(12), 5.0)],
        "key string, actor string, tier string, ts timestamp, v double",
    )
    r2 = write_denormalized_scd2(wide2, [spec], {"actor": hist1})
    hist2 = r2.hists["actor"]
    by_tier = {(r.k, r.tier): r.version_sk for r in hist2.collect()}
    fact2 = {r.key: r.fk_actor for r in r2.fact.collect()}
    # C and E sit at/after the platinum version's start
    assert fact2["C"] == by_tier[("alice", "platinum")]
    assert fact2["E"] == by_tier[("alice", "platinum")]
    # D's event time predates the change -> the gold version, though the
    # history now has a newer one (no retroactive FK rewrite)
    assert fact2["D"] == by_tier[("alice", "gold")]
    # the old interval is closed at the platinum valid_from
    gold = hist2.where("tier = 'gold'").collect()[0]
    assert str(gold.valid_to) == "2024-01-01 12:00:00" and not gold.is_current
