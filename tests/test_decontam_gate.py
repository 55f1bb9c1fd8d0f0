"""Streaming decontamination gate: streamed acceptance == batch
decontaminate (UNCONDITIONALLY — the sink anti-joins eval ids too, so
an eval doc arriving in the stream is dropped even when its grams
would not catch it), bloom fast path changes nothing under heavy false
positives, replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from feasibility_etl_spark.operators.corpus import decontaminate
from feasibility_etl_spark.operators.dedup import shingles
from feasibility_etl_spark.operators.sketches import bloom_build
from feasibility_etl_spark.streaming.decontam_gate import (
    decontam_gate_batch,
    decontam_gate_sink,
)

EVAL = [
    (9001, "the quick brown fox jumps over the lazy dog near the river"),
    (9002, "four score and seven years ago our fathers brought forth a nation"),
]
CLEAN = "completely novel content about distributed query engines and shuffles"
CONTAM = "she said the quick brown fox jumps over the lazy dog near the bank"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval_frames(spark, m_bits=1 << 14):
    ev = _df(spark, EVAL)
    sh = F.array_distinct(shingles(F.col("text"), n=8))
    grams = ev.select(F.explode(sh).alias("_g")).distinct()
    return ev, grams, bloom_build(grams, "_g", m_bits=m_bits)


def test_gate_batch_matches_batch_operator(spark):
    ev, grams, bloom = _eval_frames(spark)
    batch = _df(spark, [(1, CLEAN), (2, CONTAM), (3, "short text")])
    kept = sorted(
        r.doc_id
        for r in decontam_gate_batch(batch, grams, bloom, m_bits=1 << 14).collect()
    )
    batch_ref = sorted(
        r.doc_id for r in decontaminate(batch, ev).collect()
    )
    assert kept == batch_ref == [1, 3]


def test_gate_exact_under_heavy_false_positives(spark):
    # 64-bit filter: nearly every probe is a false positive -> all grams
    # take the exact tier -> acceptance unchanged
    ev, grams, _ = _eval_frames(spark)
    bloom = bloom_build(grams, "_g", m_bits=64, n_hashes=2)
    batch = _df(spark, [(1, CLEAN), (2, CONTAM)])
    kept = sorted(
        r.doc_id
        for r in decontam_gate_batch(
            batch, grams, bloom, m_bits=64, n_hashes=2
        ).collect()
    )
    assert kept == [1]


def test_gate_batch_eval_ids_make_equivalence_unconditional(spark):
    """An EMPTY-TEXT eval row contributes no grams, so only the id
    anti-join can drop a stream row reusing its id — the case where the
    gram tier alone diverges from corpus.decontaminate."""
    ev = _df(spark, EVAL + [(9003, "")])
    sh = F.array_distinct(shingles(F.col("text"), n=8))
    grams = ev.where(F.trim("text") != "").select(
        F.explode(sh).alias("_g")
    ).distinct()
    bloom = bloom_build(grams, "_g", m_bits=1 << 14)
    batch = _df(spark, [(1, CLEAN), (9003, "novel words sharing no grams at all")])
    eval_ids = ev.select("doc_id").distinct()
    kept = sorted(
        r.doc_id
        for r in decontam_gate_batch(
            batch, grams, bloom, m_bits=1 << 14, eval_ids=eval_ids
        ).collect()
    )
    batch_ref = sorted(r.doc_id for r in decontaminate(batch, ev).collect())
    assert kept == batch_ref == [1]
    # without eval_ids the gram tier alone admits the id-colliding row
    kept_gram_only = sorted(
        r.doc_id
        for r in decontam_gate_batch(batch, grams, bloom, m_bits=1 << 14).collect()
    )
    assert kept_gram_only == [1, 9003]


def test_streaming_equals_batch_and_replays_idempotently(spark, tmp_path):
    b0 = _df(spark, [(1, CLEAN), (2, CONTAM)])
    b1 = _df(spark, [(3, "more clean text about catalyst optimizer rules"),
                     (4, "four score and seven years ago our fathers brought forth a nation again")])
    stage = str(tmp_path / "stage")
    b0.coalesce(1).write.parquet(stage + "/f0")
    b1.coalesce(1).write.parquet(stage + "/f1")
    ev = _df(spark, EVAL)

    def run(ckpt, base):
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage + "/f*")
        )
        decontam_gate_sink(
            src, ev, base, str(tmp_path / ckpt), m_bits=1 << 14,
            shuffle_partitions=4,
        ).awaitTermination()

    base = str(tmp_path / "gated")
    run("ckpt1", base)
    accepted = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    all_docs = b0.unionByName(b1)
    batch_ref = sorted(r.doc_id for r in decontaminate(all_docs, ev).collect())
    assert accepted == batch_ref == [1, 3]
    # fresh checkpoint -> full replay over existing output -> unchanged
    run("ckpt2", base)
    again = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    assert again == accepted
