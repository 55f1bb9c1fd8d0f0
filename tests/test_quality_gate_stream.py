"""Streaming model-based quality gate: streamed acceptance == the batch
composition ``classifier_score(...).where(logit_e9 > thr)`` bit for bit,
``score_cut`` == ``threshold_filter``'s cut, replay idempotency, reject
quarantine accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from feasibility_etl_spark.operators.classifier import (
    classifier_score,
    train_log_odds,
)
from feasibility_etl_spark.operators.sketches import threshold_filter
from feasibility_etl_spark.streaming.quality_gate import (
    quality_gate_batch,
    quality_gate_sink,
    score_cut,
)

# reference corpus: "good" docs share prose vocabulary, "bad" docs share
# spam vocabulary — lexically separable so the gate has a real signal
REF = [
    (100, "clean structured prose about query engines and planners", 1),
    (101, "careful prose describing shuffle exchange and partitions", 1),
    (102, "measured writing on catalyst rules and codegen stages", 1),
    (103, "buy cheap pills now click here winner prize", 0),
    (104, "click now cheap winner prize pills offer offer", 0),
    (105, "prize prize click buy cheap now now now", 0),
]
STREAM = [
    (1, "prose about planners and codegen stages"),
    (2, "cheap pills click prize now"),
    (3, "shuffle exchange partitions described with care"),
    (4, "winner winner cheap offer click"),
    (5, ""),
]


def _fit(spark, num_buckets=512):
    """Model + the neutral cut (logit > 0 == sigmoid > 0.5): the REF
    classes separate by sign (good ≈ +1e10, spam ≈ −1.8e10), so zero is
    the class boundary regardless of stream-doc length. score_cut's
    quantile mode is pinned separately against threshold_filter."""
    ref = spark.createDataFrame(REF, "doc_id long, text string, label int")
    model = train_log_odds(ref, "label", num_buckets=num_buckets)
    return ref, model, 0


def test_score_cut_matches_threshold_filter(spark):
    ref, model, _ = _fit(spark)
    scored = classifier_score(ref, model, num_buckets=512)
    for frac in (0.5, 0.25):
        thr_q = score_cut(scored, keep_frac=frac)
        via_filter = sorted(
            r.doc_id
            for r in threshold_filter(scored, "logit_e9", frac).collect()
        )
        via_cut = sorted(
            r.doc_id for r in scored.where(F.col("logit_e9") > thr_q).collect()
        )
        assert via_filter == via_cut and len(via_cut) > 0, frac


def test_gate_batch_equals_batch_composition(spark):
    _, model, thr = _fit(spark)
    batch = spark.createDataFrame(STREAM, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in quality_gate_batch(batch, model, thr, num_buckets=512).collect()
    )
    ref_kept = sorted(
        r.doc_id
        for r in classifier_score(batch, model, num_buckets=512)
        .where(F.col("logit_e9") > thr)
        .collect()
    )
    assert kept == ref_kept
    # the separable fixture routes prose in, spam out
    assert set(kept) >= {1, 3} and not set(kept) & {2, 4}


def test_streaming_equals_batch_and_replays_idempotently(spark, tmp_path):
    _, model, thr = _fit(spark)
    b0 = spark.createDataFrame(STREAM[:2], "doc_id long, text string")
    b1 = spark.createDataFrame(STREAM[2:], "doc_id long, text string")
    stage = str(tmp_path / "stage")
    b0.coalesce(1).write.parquet(stage + "/f0")
    b1.coalesce(1).write.parquet(stage + "/f1")

    def run(ckpt, base, rejects=None):
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage + "/f*")
        )
        quality_gate_sink(
            src, model, thr, base, str(tmp_path / ckpt),
            num_buckets=512, shuffle_partitions=4, rejects_dir=rejects,
        ).awaitTermination()

    base = str(tmp_path / "gated")
    rejects = str(tmp_path / "rejects")
    run("ckpt1", base, rejects)
    accepted = sorted(
        r.doc_id for r in spark.read.parquet(base + "/docs").collect()
    )
    all_docs = b0.unionByName(b1)
    batch_ref = sorted(
        r.doc_id
        for r in classifier_score(all_docs, model, num_buckets=512)
        .where(F.col("logit_e9") > thr)
        .collect()
    )
    assert accepted == batch_ref
    # quarantine accounts for every dropped row, with the reason tagged
    rej = spark.read.parquet(rejects)
    assert sorted(r.doc_id for r in rej.collect()) == sorted(
        set(r[0] for r in STREAM) - set(accepted)
    )
    assert rej.select("reason").distinct().collect()[0][0] == "low_quality"
    # fresh checkpoint -> full replay over existing output -> unchanged
    run("ckpt2", base)
    again = sorted(
        r.doc_id for r in spark.read.parquet(base + "/docs").collect()
    )
    assert again == accepted
