"""Quality gates (SURVEY §2.8): E-DROP, E-GATE threshold (>=), E-ISOLATE."""

from __future__ import annotations

import pytest

from feasibility_etl_spark.quality.gates import (
    DataLossExceeded,
    assert_loss_below,
    drop_failed,
    loss_report,
    validate_not_null,
)


def test_drop_failed(spark):
    data = spark.createDataFrame([("K1", 1), ("K2", 2), ("K3", 3)], "key string, v int")
    failed = spark.createDataFrame([("K2",)], "key string")
    assert sorted(r.key for r in drop_failed(data, failed, "key").collect()) == ["K1", "K3"]


def test_gate_passes_under_threshold(spark):
    before = spark.range(100)
    after = before.limit(85)  # 15% loss < 20%
    b, a, loss = assert_loss_below(before, after, 20.0)
    assert (b, a) == (100, 85)
    assert abs(loss - 15.0) < 1e-12


def test_gate_aborts_at_threshold_inclusive(spark):
    # etl.js:269 compares with >=, so exactly 20% must abort
    before = spark.range(100)
    after = before.limit(80)
    with pytest.raises(DataLossExceeded):
        assert_loss_below(before, after, 20.0)


def test_loss_report_edges():
    assert loss_report(0, 0) == 0.0
    assert loss_report(0, 5) == float("inf")
    assert loss_report(100, 120) == 20.0  # growth counts as change too


def test_validate_not_null_split(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", None)], "k string, v int"
    )
    ok, bad = validate_not_null(df, ["k", "v"])
    assert ok.count() == 1
    assert bad.count() == 2


def test_validate_not_null_no_constraints(spark):
    df = spark.createDataFrame([("a",)], "k string")
    ok, bad = validate_not_null(df, [])
    assert ok.count() == 1 and bad.count() == 0


def test_filter_by_quantile_global_and_per_key(spark):
    from feasibility_etl_spark.quality.gates import filter_by_quantile

    df = spark.createDataFrame(
        [("en", float(i)) for i in range(1, 5)] + [("de", 10.0), ("de", 20.0)],
        "lang string, score double",
    )
    # per-key median: en median 2.5 -> keeps 3,4; de median 15 -> keeps 20
    got = sorted((r.lang, r.score) for r in
                 filter_by_quantile(df, "score", 0.5, keys=["lang"]).collect())
    assert got == [("de", 20.0), ("en", 3.0), ("en", 4.0)]
    # global: median of {1,2,3,4,10,20} = 3.5 -> keeps 4,10,20
    got_g = sorted(r.score for r in filter_by_quantile(df, "score", 0.5).collect())
    assert got_g == [4.0, 10.0, 20.0]
    # q=0 keeps everything
    assert filter_by_quantile(df, "score", 0.0).count() == 6


def test_filter_by_quantile_approx_mode(spark):
    from feasibility_etl_spark.quality.gates import filter_by_quantile

    df = spark.range(1000).selectExpr("'en' AS lang", "CAST(id AS DOUBLE) AS score")
    exact = filter_by_quantile(df, "score", 0.5, keys=["lang"])
    approx = filter_by_quantile(df, "score", 0.5, keys=["lang"], exact=False)
    # sketch threshold lands within its accuracy bound of the true median
    n_exact, n_approx = exact.count(), approx.count()
    assert abs(n_exact - n_approx) <= 2


def test_profile_columns_stats(spark):
    from feasibility_etl_spark.quality.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (2, None, 1.0), (None, "a", 4.0)],
        "k long, s string, v double",
    )
    got = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 1, 2)
    assert (k.min_val, k.max_val) == ("1", "2")
    assert k.mean_val == (1 + 2 + 2) / 3  # exact integral mean over non-nulls
    s = got["s"]
    assert (s.n_nulls, s.n_distinct, s.min_val, s.max_val) == (1, 2, "a", "b")
    assert s.mean_val is None  # non-integral: no order-dependent double mean
    assert got["v"].mean_val is None


def test_profile_columns_approx_mode_no_expand(spark):
    from feasibility_etl_spark.quality.profile import profile_columns

    df = spark.range(1000).selectExpr("id", "id % 7 AS g")
    prof = profile_columns(df, approx_distinct=True, rsd=0.01)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # HLL++ keeps the plan a plain partial/final agg
    got = {r.col_name: r for r in prof.collect()}
    assert got["g"].n_distinct == 7  # HLL exact at tiny cardinality
    assert abs(got["id"].n_distinct - 1000) <= 30


# ------------------------------------------------- robust-statistics gates

def test_winsorize_clips_to_exact_quantiles(spark):
    import numpy as np

    from feasibility_etl_spark.quality.gates import winsorize

    vals = list(range(101))  # 0..100 -> q10=10, q90=90 exactly
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, v double")
    out = {r.id: r.v for r in winsorize(df, "v", 0.1, 0.9).collect()}
    assert min(out.values()) == 10.0 and max(out.values()) == 90.0
    assert out[50] == 50.0  # interior untouched
    assert out[0] == 10.0 and out[100] == 90.0


def test_winsorize_per_key(spark):
    from feasibility_etl_spark.quality.gates import winsorize

    rows = [("a", float(v)) for v in range(11)] + [("b", float(v)) for v in range(100, 111)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorize(df, "v", 0.0, 0.5, keys=["k"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r.v)
    assert max(by_key["a"]) == 5.0 and max(by_key["b"]) == 105.0


def test_mad_outliers_flags_robustly(spark):
    from feasibility_etl_spark.quality.gates import mad_outliers

    # 20 inliers around 10 (MAD 1) + one wild outlier that would wreck a
    # mean/stddev z-score but not the median/MAD rule
    rows = [(i, 10.0 + (i % 3) - 1) for i in range(20)] + [(99, 1000.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.id: r.is_outlier for r in mad_outliers(df, "v", k=3.0).collect()}
    assert out[99] is True
    assert sum(out.values()) == 1  # nothing else flagged


def test_mad_zero_flags_only_exact_deviants(spark):
    from feasibility_etl_spark.quality.gates import mad_outliers

    # >half identical -> MAD = 0 -> only values different from the median flag
    rows = [(i, 5.0) for i in range(8)] + [(8, 5.5), (9, 7.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.id: r.is_outlier for r in mad_outliers(df, "v", k=3.0).collect()}
    assert out[8] is True and out[9] is True
    assert not any(out[i] for i in range(8))
