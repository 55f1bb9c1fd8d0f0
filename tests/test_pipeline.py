"""Stage-4 transform (etl.js:285-304) as one declarative plan: from raw
nested inputs, compute every derived metric with the reference's exact
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feasibility_etl_spark.functions.json_fns import ISSUE_LINKS_TYPE
from feasibility_etl_spark.plans.pipeline import ESTIMATE_COLS, transform_feasibilities

ENTRY = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("timespent", T.LongType()),
        T.StructField("unit", T.StringType()),
        T.StructField("id", T.StringType()),
    ]
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("worklog_entries", T.ArrayType(ENTRY)),
        T.StructField("issue_links", ISSUE_LINKS_TYPE),
        *[T.StructField(c, T.DoubleType()) for c in ESTIMATE_COLS],
    ]
)


def link(total):
    return {
        "summary": "s", "status": "Done", "issuetype": "Task",
        "worklog": {"worklog": [], "total": total} if total is not None else None,
        "reviewer": None, "reporter": "u", "project": "P",
        "created": None, "resolution": None, "resolution date": None,
    }


def raw_df(spark):
    rows = [
        # insert-1 shape: own worklog 60s, one link totalling 180s,
        # estimates 1.2+2+1+1.5+1+1.5 h = 29520 s
        ("K-1", [("u1", 60, "seconds", "1")], {"L-1": link(180)},
         1.2, 2.0, 1.0, 1.5, 1.0, 1.5),
        # no worklog, no links → timespent null, linked 0, delta pair null
        ("K-2", [], None, 1.2, 2.0, 1.0, 1.5, 1.0, 1.5),
        # null estimates coalesce to 0 in the horizontal sum
        ("K-3", [("u2", 120, "seconds", "2")], {"L-2": link(60), "L-3": link(None)},
         None, 2.0, None, None, None, None),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_transform_full_record(spark):
    out = {r.key: r for r in transform_feasibilities(raw_df(spark)).collect()}
    r1 = out["K-1"]
    assert r1.feasibility_timespent == 60.0
    assert r1.issue_links_timespent == 180.0
    assert r1.feasibility_estimate_total == 29520.0
    assert r1.delta == 29520.0 - 180.0
    expected_pct = (29520.0 - 180.0) / ((29520.0 + 180.0) / 2) * 100
    assert abs(r1.delta_percentage - expected_pct) < 1e-9
    # estimates visibly converted to seconds (helpers.js:281)
    assert r1.design_estimate == 4320.0


def test_transform_empty_semantics(spark):
    out = {r.key: r for r in transform_feasibilities(raw_df(spark)).collect()}
    r2 = out["K-2"]
    assert r2.worklog is None  # A-WORKLOG: null on empty
    assert r2.feasibility_timespent is None
    assert r2.issue_links_timespent == 0.0  # A-LINKED: zero on empty
    assert r2.delta is None and r2.delta_percentage is None  # falsy-zero rule


def test_transform_null_estimates_and_null_link_worklog(spark):
    out = {r.key: r for r in transform_feasibilities(raw_df(spark)).collect()}
    r3 = out["K-3"]
    assert r3.feasibility_estimate_total == 7200.0  # only dev=2h
    assert r3.issue_links_timespent == 60.0  # null-worklog link skipped
    assert r3.feasibility_timespent == 120.0


def test_transform_serializes_json_at_sink(spark):
    out = transform_feasibilities(raw_df(spark), serialize_json=True)
    schema = dict(out.dtypes)
    assert schema["worklog"] == "string"
    assert schema["issue_links"] == "string"
    rows = {r.key: r for r in out.collect()}
    assert rows["K-2"].worklog is None  # null stays null (etl.js:296 && guard)
    assert '"total":60' in rows["K-1"].worklog


def test_pipe_corpus_composes_and_filters_monotonically(spark):
    # the end-to-end corpus pipeline: survivors are a strict subset of
    # the corpus, every output doc is packed and BPE-encoded, and the
    # DSIR gate kept only docs above the threshold (non-trivial filter)
    from conftest import SF0001
    from feasibility_etl_spark.driver_queries.pipelines_joins import q_pipe_corpus
    from feasibility_etl_spark.sources.catalog import load

    out = q_pipe_corpus(spark, SF0001)
    rows = out.collect()
    n_corpus = load(spark, SF0001, "documents").count()
    assert 0 < len(rows) < n_corpus
    assert all(r.shard_id >= 0 and r.n_bpe_tok > 0 and r.bpe_text for r in rows)
    assert all(r.doc_id % 97 != 0 for r in rows)       # eval slice scrubbed
    assert len({r.doc_id for r in rows}) == len(rows)  # exactly-once


def test_pipe_corpus_components_grain_prunes_at_least_as_much(spark, tmp_path):
    # VERDICT r11 item 4: the clique-safe component grain is the 100x
    # default — on a boilerplate-heavy corpus (the banding graph's worst
    # case) it must keep NO MORE near-dup survivors than the exact pair
    # grain, and the rest of the chain must behave identically
    from feasibility_etl_spark.driver_queries.pipelines_joins import (
        pipe_corpus_stage_frames,
    )

    # boilerplate-heavy fixture in the sf-dir layout: a 40-replica
    # near-identical clique (distinct trailing token — exact dedup must
    # not collapse it; near-dup must) + 20 distinct docs
    clique = "please accept our cookie terms of service policy " * 8
    rows = [
        (i, clique + f"tail{i}", "en", "web", len(clique) + 6) for i in range(40)
    ] + [
        (
            100 + i,
            f"distinct document number {i} with its own unrepeated story "
            f"about topic{i} and detail{i * 7} told plainly",
            "en",
            "web",
            100,
        )
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    def survivors(near_dup: str) -> set[int]:
        stages, shared = pipe_corpus_stage_frames(spark, sf, near_dup=near_dup)
        by_name = dict(stages)
        try:
            return {r.doc_id for r in by_name["near_dup_prune"].collect()}
        finally:
            shared.release()

    pairs_kept = survivors("pairs")
    comp_kept = survivors("components")
    assert len(comp_kept) <= len(pairs_kept)
    # both grains collapse the clique to (at most) one representative
    assert len([d for d in comp_kept if d < 40]) <= 1
    assert len([d for d in pairs_kept if d < 40]) <= 1
    # and neither touches the distinct docs that survived the gates
    assert {d for d in pairs_kept if d >= 100} == {d for d in comp_kept if d >= 100}
