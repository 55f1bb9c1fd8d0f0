"""Streaming exact-dedup gate: streamed result == batch exact_dedup,
exactness survives Bloom false positives, near-dups are NOT dropped
(this is the exact gate), replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from feasibility_etl_spark.operators.dedup import exact_dedup
from feasibility_etl_spark.operators.sketches import bloom_build
from feasibility_etl_spark.operators.text import fingerprint
from feasibility_etl_spark.streaming.bloom_gate import (
    _read_state,
    exact_dedup_gate_sink,
    exact_gate_batch,
)

A = "the quick brown fox jumps over the lazy dog"
B = "completely different content about database engines"
C = "yet another unrelated passage describing mountains"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gate_batch_intra_batch_and_exactness(spark):
    batch = _df(
        spark,
        [
            (10, A),
            (11, "  " + A + "  "),  # normalizes equal -> dup of 10
            (12, A.replace("lazy", "sleepy")),  # near but NOT exact -> kept
            (13, B),
        ],
    )
    kept = sorted(r.doc_id for r in exact_gate_batch(batch, None, None).collect())
    assert kept == [10, 12, 13]


def test_gate_batch_drops_state_matches_only(spark):
    fps = _df(spark, [(1, A)]).select(
        fingerprint("text").alias("fp")
    )
    bloom = bloom_build(fps, "fp", m_bits=1 << 14)
    batch = _df(spark, [(20, A), (21, A.replace("dog", "cat")), (22, C)])
    kept = sorted(
        r.doc_id
        for r in exact_gate_batch(batch, fps, bloom, m_bits=1 << 14).collect()
    )
    assert kept == [21, 22]


def test_gate_batch_exact_under_heavy_false_positives(spark):
    # 64-bit filter over 200 fingerprints: nearly every probe is a false
    # positive -> everything takes the exact tier -> result unchanged
    state_docs = _df(spark, [(i, f"state doc number {i}") for i in range(200)])
    fps = state_docs.select(fingerprint("text").alias("fp"))
    bloom = bloom_build(fps, "fp", m_bits=64, n_hashes=2)
    batch = _df(
        spark,
        [(500, "state doc number 7"), (501, "a genuinely new document")],
    )
    kept = sorted(
        r.doc_id
        for r in exact_gate_batch(
            batch, fps, bloom, m_bits=64, n_hashes=2
        ).collect()
    )
    assert kept == [501]


def test_streaming_equals_batch_exact_dedup(spark, tmp_path):
    b0 = _df(spark, [(1, A), (2, B), (3, A)])          # 3 dups 1 in-batch
    b1 = _df(spark, [(4, "  " + A), (5, C), (6, B)])   # 4,6 dup state; 5 new
    b2 = _df(spark, [(7, C), (8, "brand new final doc")])
    stage = str(tmp_path / "stage")
    b0.coalesce(1).write.parquet(stage + "/f0")
    b1.coalesce(1).write.parquet(stage + "/f1")
    b2.coalesce(1).write.parquet(stage + "/f2")

    base = str(tmp_path / "gated")
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage + "/f*")
    )
    q = exact_dedup_gate_sink(src, base, str(tmp_path / "ckpt"), m_bits=1 << 14)
    q.awaitTermination()

    accepted = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    # batch order may vary with file listing, but content-wise the gate
    # keeps exactly one doc per distinct normalized text
    all_docs = b0.unionByName(b1).unionByName(b2)
    batch_equiv = exact_dedup(all_docs)
    assert len(accepted) == batch_equiv.count() == 4
    texts = {
        r.text.strip().lower()
        for r in spark.read.parquet(base + "/docs").collect()
    }
    assert texts == {
        r.text.strip().lower() for r in batch_equiv.collect()
    }
    # the fingerprint index IS the docs state's fp column (one write per
    # batch, column-pruned on read); bloom state: one CUMULATIVE filter
    # file per batch — later filters contain every earlier set bit
    fps = spark.read.parquet(base + "/docs").select("fp")
    assert fps.count() == fps.distinct().count() == 4
    from feasibility_etl_spark.streaming.bloom_gate import _read_prev_bloom

    n_words = (1 << 14) // 32
    prev = _read_prev_bloom(spark, base + "/bloom", 2, n_words)  # thru batch 1
    last = _read_prev_bloom(spark, base + "/bloom", 3, n_words)  # thru batch 2
    assert prev is not None and last is not None
    assert any(w != 0 for w in prev)
    assert all((a & b) == a for a, b in zip(prev, last))  # monotone OR
    # stale filters retire as the stream advances (nothing reads < N-1):
    # batch 2's commit deleted batch-0.bin
    assert _read_prev_bloom(spark, base + "/bloom", 1, n_words) is None
    # a restart with a DIFFERENT m_bits must treat the state file as
    # absent (mis-sized word arrays corrupt the probe: too-small makes
    # out-of-range element_at NULL -> false definitely-new), not probe it
    assert _read_prev_bloom(spark, base + "/bloom", 3, n_words * 2) is None
    assert _read_prev_bloom(spark, base + "/bloom", 3, n_words // 2) is None


def test_lost_bloom_state_rebuilds_cumulative_filter(spark, tmp_path):
    """Losing the cumulative filter (file gone, or an m_bits change
    rejected by the size check) degrades ONE batch to the exact tier and
    the commit REBUILDS the filter from the full accepted index — the
    next batch's filter must again cover every accepted fingerprint, or
    old duplicates would ride a false definitely-new straight past the
    exact tier."""
    import os

    from feasibility_etl_spark.streaming.bloom_gate import (
        _read_prev_bloom,
        _sparse_bloom_words,
    )

    stage = str(tmp_path / "stage")
    _df(spark, [(1, A), (2, B)]).coalesce(1).write.parquet(stage + "/f0")
    base = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    m_bits = 1 << 14

    def run():
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage + "/f*")
        )
        exact_dedup_gate_sink(src, base, ckpt, m_bits=m_bits).awaitTermination()

    run()  # batch 0: accepts 1, 2
    os.remove(base + "/bloom/batch-0.bin")  # lose the cumulative state
    _df(spark, [(3, C), (4, A)]).coalesce(1).write.parquet(stage + "/f1")
    run()  # batch 1: no usable predecessor -> exact-tier degrade + rebuild
    _df(spark, [(5, "  " + A), (6, "one more new doc")]).coalesce(1).write.parquet(
        stage + "/f2"
    )
    run()  # batch 2 trusts batch-1.bin — it must cover A's fingerprint
    accepted = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    assert accepted == [1, 2, 3, 6]  # 4 and 5 are dups of 1 — never admitted
    # the rebuilt filter is a superset of the OR of ALL accepted bits
    words = _read_prev_bloom(spark, base + "/bloom", 3, m_bits // 32)
    assert words is not None
    all_fps = spark.read.parquet(base + "/docs").select("fp")
    for r in _sparse_bloom_words(all_fps, m_bits, 5):
        assert words[r["_w"]] & r["_word"] == r["_word"]


def test_packed_probe_and_python_bits_match_distributed(spark):
    """The round-6 fast path replays bloom arithmetic in two new forms —
    a binary-literal Spark probe and pure-Python bit setting — both of
    which must stay bit-identical to the canonical array expressions,
    or the gate's no-false-negative invariant silently breaks."""
    import random
    import string

    from feasibility_etl_spark.operators.sketches import bloom_maybe_contains
    from feasibility_etl_spark.streaming.bloom_gate import (
        _bloom_hit_packed,
        _pack_bytes,
        _py_set_bits,
        _sparse_bloom_words,
    )

    rng = random.Random(6)
    fps = [
        "".join(rng.choices(string.hexdigits.lower(), k=32)) for _ in range(300)
    ]
    m_bits, n_hashes = 1 << 12, 5  # small filter -> real false positives
    fdf = spark.createDataFrame([(f,) for f in fps[:150]], "fp string")
    # python bits == distributed sparse bit_or bits
    words_py = [0] * (m_bits // 32)
    _py_set_bits(words_py, fps[:150], m_bits, n_hashes)
    words_sp = [0] * (m_bits // 32)
    for r in _sparse_bloom_words(fdf, m_bits, n_hashes):
        words_sp[r["_w"]] |= r["_word"]
    assert words_py == words_sp
    # packed binary probe == array probe, row for row (incl. FP rows)
    probe_df = spark.createDataFrame([(f,) for f in fps], "fp string")
    got_packed = sorted(
        r.fp
        for r in probe_df.where(
            _bloom_hit_packed("fp", _pack_bytes(words_py), m_bits, n_hashes)
        ).collect()
    )
    bloom_row = spark.createDataFrame([(words_py,)], "bloom array<long>")
    got_array = sorted(
        r.fp
        for r in probe_df.crossJoin(F.broadcast(bloom_row))
        .where(bloom_maybe_contains(F.col("fp"), F.col("bloom"), m_bits, n_hashes))
        .collect()
    )
    assert got_packed == got_array
    assert set(fps[:150]) <= set(got_packed)  # no false negatives


def test_micro_gate_exact_with_capped_driver_dict(spark, tmp_path):
    """driver_index_max=0 forces the driver fp dict permanently
    INCOMPLETE, so every suspect resolves through the isin-pushdown
    index-scan tier (the billion-doc posture) — acceptance must still
    equal exact_dedup, including across a restart (bootstrap collects
    nothing at cap 0)."""
    stage = str(tmp_path / "stage")
    _df(spark, [(1, A), (2, B)]).coalesce(1).write.parquet(stage + "/f0")
    _df(spark, [(3, A), (4, C)]).coalesce(1).write.parquet(stage + "/f1")
    base = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")

    def run():
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage + "/f*")
        )
        exact_dedup_gate_sink(
            src, base, ckpt, m_bits=1 << 14, driver_index_max=0
        ).awaitTermination()

    run()
    # restart with fresh sink (empty dict, bootstrap at cap 0) + a batch
    # duplicating batch-0 content: must be caught via the scan tier
    _df(spark, [(5, "  " + A + " "), (6, "novel closing doc")]).coalesce(
        1
    ).write.parquet(stage + "/f2")
    run()
    accepted = sorted(r.doc_id for r in spark.read.parquet(base + "/docs").collect())
    assert accepted == [1, 2, 4, 6]


def test_replay_excludes_own_state_partition(spark, tmp_path):
    fps_dir = str(tmp_path / "fps")
    batch = _df(spark, [(1, A), (2, B)])
    batch.select(fingerprint("text").alias("fp")).write.parquet(
        fps_dir + "/batch_id=0"
    )
    replay_view = _read_state(spark, fps_dir, before_batch=0)
    assert replay_view.count() == 0
    later_view = _read_state(spark, fps_dir, before_batch=1)
    assert later_view.count() == 2
    missing = _read_state(spark, str(tmp_path / "nope"), before_batch=5)
    assert missing is None
