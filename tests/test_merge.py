"""SCD1 merge_upsert: MERGE INTO semantics on plain frames."""

from __future__ import annotations

from feasibility_etl_spark.writer.merge import merge_upsert


def test_merge_upsert_semantics(spark):
    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 10, False),   # update
            (2, None, 11, True),    # delete
            (3, "x", 10, True),     # earlier delete ...
            (3, "c2", 12, False),   # ... overridden by later upsert
            (4, "d", 10, False),    # insert
            (5, None, 10, True),    # delete of absent key: no-op
        ],
        "id long, val string, ts long, dead boolean",
    )
    out = merge_upsert(current, changes, "id", order_cols=["ts"], delete_col="dead")
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "a2", 3: "c2", 4: "d"}
    assert out.columns == current.columns


def test_merge_upsert_latest_wins_with_tiebreak(spark):
    current = spark.createDataFrame([(1, "a")], "id long, val string")
    changes = spark.createDataFrame(
        [(1, "first", 10, 100), (1, "second", 10, 101)],
        "id long, val string, ts long, seq long",
    )
    out = merge_upsert(current, changes, "id", order_cols=["ts", "seq"])
    assert [r.val for r in out.collect()] == ["second"]


def test_merge_upsert_broadcasts_small_change_batch(spark):
    current = spark.createDataFrame(
        [(i, "v") for i in range(1000)], "id long, val string"
    )
    changes = spark.createDataFrame([(1, "x", False)], "id long, val string, dead boolean")
    out = merge_upsert(current, changes, "id", delete_col="dead")
    out.collect()  # let AQE finalize join strategies
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # untouched-rows pass is map-side


def test_merge_upsert_batch_composability(spark):
    """Applying two change batches in sequence == applying their union once
    (order_cols totally order the changes) — the property that makes the
    operator safe to run per-micro-batch behind a stream."""
    current = spark.createDataFrame(
        [(i, "base") for i in range(20)], "id long, val string"
    )
    b1 = spark.createDataFrame(
        [(1, "x", 10, False), (2, None, 11, True), (3, "y", 12, False)],
        "id long, val string, ts long, dead boolean",
    )
    b2 = spark.createDataFrame(
        [(1, "z", 20, False), (2, "back", 21, False), (4, None, 22, True)],
        "id long, val string, ts long, dead boolean",
    )
    from feasibility_etl_spark.writer.merge import merge_upsert

    def apply(cur, ch):
        return merge_upsert(cur, ch, "id", order_cols=["ts"], delete_col="dead")

    seq = apply(apply(current, b1), b2)
    once = apply(current, b1.unionByName(b2))
    assert {(r.id, r.val) for r in seq.collect()} == {
        (r.id, r.val) for r in once.collect()
    }
