"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``

Each query executes its full plan into a noop sink (no driver collect
overhead, no result materialization skew). Session startup and a JVM
warm-up job are excluded from timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.driver_queries import ALL_QUERIES  # noqa: E402
from feasibility_etl_spark.flagship import flagship  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402

#: Headline set: the flagship plus the heaviest representatives of each
#: operator family (joins, aggs, windows, dedup, similarity, text).
BENCH_QUERIES = [
    "FLAGSHIP",
    "J-DIM-REPORTER",
    "J-ATTACH",
    "A-WORKLOG",
    "A-COLLECT",
    "A-PIVOT",
    "VIEW-CTE",
    "VIEW-IDIOMATIC",
    "WIN-SESSION",
    "WIN-SLIDE",
    "WIN-RESAMPLE",
    "DEDUP-EXACT",
    "DEDUP-NGRAM",
    "DEDUP-MINHASH",
    "DEDUP-PRUNE",
    "DEDUP-SUBSTRING",
    "CORPUS-PACK",
    "CORPUS-DECONTAM",
    "CORPUS-DECONTAM-BLOOM",
    "SIM-TOPK",
    "SIM-BQ",
    "TEXT-QUALITY",
    "TEXT-GOPHER",
    "TEXT-LANGID",
    "J-SALTED",
    "J-ASOF",
    "J-RANGE",
    "SIM-IVF",
    "MM-IMAGE",
    "PIPE-DOCS",
    "PIPE-CORPUS",
    "PIPE-CORPUS-COMPONENTS",
    "PIPE-EVENTS",
    "TEXT-WINNOW",
    "SCD2-APPLY",
    "TEXT-REPETITION",
    "E-PROFILE",
    "E-ROBUST",
    "DEDUP-INCR",
    "TEXT-BM25",
    "TEXT-TFIDF",
    "COMPRESS-RATIO",
    "SEARCH-RRF",
    "SKETCH-HLL",
    "SKETCH-THETA",
    "LINE-DEDUP",
    "BPE-ENCODE",
    "WP-ENCODE",
    "UNIGRAM-ENCODE",
    "SKETCH-FREQ",
    "LM-SCORE",
    "CLS-SCORE",
    "CLS-ROUTE",
    "CLS-GATE",
    "CORPUS-DSIR",
    "CORPUS-NOVELTY",
    "CORPUS-SAMPLEK",
    "CORPUS-CONTAMSCORE",
    "CORPUS-PACKSEQ",
    "QUALITY-KLLGATE",
]


def run_query(spark, name: str, sf_dir: str, tracker=None) -> float:
    fn = flagship if name == "FLAGSHIP" else ALL_QUERIES[name]
    if tracker is not None:
        # metrics fold happens AFTER the timed action (statusStore read),
        # so tracking adds no inside-the-window cost
        with tracker.track(name):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


# Median-of-N timing: single-rep numbers on this host swing with ±40%
# ambient variance and forced a manual "is it a regression or noise?"
# triage three rounds running (every flagged regression turned out to be
# noise). The median absorbs one bad rep per query; the rep count rides
# in the output JSON so round-over-round comparisons know what they read.
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


#: The host anchor's nominal seconds — pinned to the value recorded the
#: round the anchor was introduced (BENCH_r09 host_anchor_sec = 1.035),
#: so normalized values are comparable across ALL rounds that carry an
#: anchor. Normalized time = raw × (nominal / measured anchor): on a
#: host-day 10% slower than r9's the anchor reads ~1.14 and every
#: normalized timing shrinks by the same 10% the host inflated it —
#: round-over-round regression triage on normalized ratios cancels host
#: drift instead of re-deriving it from PERF-NOTES each round (r9's 8
#: phantom regressions, all host-band, would have self-cleared).
ANCHOR_NOMINAL_SEC = 1.035

#: IO-probe companion anchor (round 11, VERDICT r10 item 1). The CPU
#: anchor demonstrably under-corrects IO-heavy drift: three same-day
#: same-code r10 runs normalized to 86.2/95.6/102.2 s, and the r10
#: record's worst "regressions" (view-cte/flagship at 1.26-1.28×) were
#: sub-second IO-bound entries whose code did not change. This probe is
#: a fixed parquet scan+aggregate+write through the same FS/page-cache
#: stack the bench entries use, so it moves with disk/kernel/page-cache
#: weather the way those entries do. Triage rule: for an entry that
#: regressed in `queries_normalized` but not `queries_normalized_io`
#: (or vice versa), trust the anchor whose resource profile matches the
#: entry — IO-bound sub-second entries against the IO anchor, codegen
#: -bound entries against the CPU anchor. Nominal pinned to the median
#: measured the round the probe was introduced (r11), like the CPU
#: anchor's r9 pin.
IO_ANCHOR_NOMINAL_SEC = 1.044
IO_ANCHOR_ROWS = 8_000_000


def normalize_by_anchor(
    timings: dict[str, float],
    host_anchor: float,
    nominal: float = ANCHOR_NOMINAL_SEC,
) -> dict[str, float]:
    """Anchor-normalized copy of a {query: seconds} dict.

    Error sentinels (<= 0, e.g. the -1.0 a failed query records) pass
    through unscaled; a missing/invalid anchor returns {} so readers
    can't mistake unnormalized values for normalized ones."""
    if not host_anchor or host_anchor <= 0:
        return {}
    k = nominal / host_anchor
    return {
        q: (round(t * k, 3) if isinstance(t, (int, float)) and t > 0 else t)
        for q, t in timings.items()
    }


def io_anchor_setup(spark, base_dir: str, rows: int = IO_ANCHOR_ROWS) -> str:
    """Write the IO probe's fixed source dataset (untimed): deterministic
    content (id, small-modulus key, 32-char md5 string) so every round
    probes the identical byte stream."""
    path = os.path.join(base_dir, "io_anchor_src")
    (
        spark.range(rows)
        .select(
            "id",
            (F.col("id") % 9973).alias("k"),
            F.md5(F.col("id").cast("string")).alias("s"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def io_anchor_once(spark, src: str, out: str) -> float:
    """One timed IO probe rep: full-scan aggregate over the fixed parquet
    source plus a filtered parquet re-write — read and write through the
    same filesystem/page-cache stack the bench entries use, with
    negligible compute (sum/length/count only)."""
    t0 = time.time()
    df = spark.read.parquet(src)
    df.select(
        F.sum("k").alias("a"), F.sum(F.length("s")).alias("b"), F.count("id").alias("c")
    ).collect()
    spark.read.parquet(src).where(F.col("k") < 2500).write.mode("overwrite").parquet(out)
    return round(time.time() - t0, 3)


def run_query_med(
    spark, name: str, sf_dir: str, tracker=None
) -> tuple[float, list[float]]:
    """(median, per-rep raw times) of BENCH_REPS; the LAST rep (warm
    caches, steady plan) is the one whose job metrics land in the
    tracker. The raw reps ride to BENCH_DETAIL so a poisoned single rep
    (host drift, GC pause) is distinguishable from a real regression —
    the r7 corpus-dsir record was a 20× outlier nothing could explain
    because only the median survived."""
    reps = [run_query(spark, name, sf_dir) for _ in range(BENCH_REPS - 1)]
    reps.append(run_query(spark, name, sf_dir, tracker=tracker))
    return _median(reps), [round(r, 3) for r in reps]


def run_stream_med(fn, spark, sf_dir: str) -> tuple[float, int, list[float]]:
    """Median-of-reps for the streaming entries (each rep is a full
    stage→stream→drain cycle; row count is constant across reps).
    Returns (median_sec, rows, per-rep raw secs)."""
    runs = [fn(spark, sf_dir) for _ in range(BENCH_REPS)]
    sec = _median([s for s, _ in runs])
    return sec, runs[0][1], [round(s, 3) for s, _ in runs]


def isolate_entry(spark) -> None:
    """Inter-entry isolation (round 8, VERDICT r7 item 1b): a poisoned
    predecessor must not inflate its successor. Python gc.collect()
    fires the StageCache weakref finalizers (unpersisting any cached
    stages whose owning result frame just went unreachable),
    clearCache() drops anything still pinned, and a JVM System.gc()
    nudges ContextCleaner to reap dead shuffle files and broadcast
    blocks between entries. Runs OUTSIDE every timed window."""
    import gc

    gc.collect()
    try:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — isolation must never fail the bench
        pass


def run_stream_bench(spark, sf_dir: str) -> tuple[float, int]:
    """End-to-end Structured Streaming throughput: the events table replayed
    as a file stream (8 files, 2 per trigger → 4 micro-batches) through a
    watermarked tumbling-window agg into a noop sink, Trigger.AvailableNow.
    Staging the files and clearing the checkpoint are setup, not timed."""
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.windows import tumbling_agg, with_watermark

    staging = "/tmp/spark_graft_stream_stage"
    ckpt = staging + "_ckpt"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    events = cat_load(spark, sf_dir, "events")
    n_rows = events.count()
    events.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    agg = tumbling_agg(
        with_watermark(stream, "ts", "1 hour"),
        "ts",
        "1 hour",
        [F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")],
        keys=["event_type"],
    )
    # state-store partition count = shuffle partitions at query start; 32
    # tiny stores per micro-batch is pure overhead at bench volume
    from feasibility_etl_spark.streaming.conf import scoped_shuffle_partitions

    with scoped_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return time.time() - t0, n_rows


def run_denorm_sink_bench(spark, sf_dir: str) -> tuple[float, int]:
    """foreachBatch write path at bench SF: the events stream (4 micro-
    batches) through denormalizing_sink — every batch runs the full
    write_denormalized decomposition (dim lookup-or-insert + idempotent
    fact anti-join) and lands parquet, all executor-side."""
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.stateful import denormalizing_sink
    from feasibility_etl_spark.writer.denormalized import DimSpec

    staging = "/tmp/spark_graft_denorm_stage"
    ckpt = staging + "_ckpt"
    out_root = staging + "_out"
    for p in (staging, ckpt, out_root):
        shutil.rmtree(p, ignore_errors=True)
    events = cat_load(spark, sf_dir, "events")
    n_rows = events.count()
    events.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
        .select(
            F.col("event_id").alias("key"),
            F.concat(F.lit("user_"), F.col("user_id")).alias("actor"),
            F.col("event_type").alias("kind"),
            "value",
        )
    )
    # hash ids: the at-scale sink posture — no per-batch max(id) scan or
    # single-task window over new names (dense/SERIAL stays the writer
    # default for reference-faithful batch loads)
    specs = [
        DimSpec(name="actor_dim", natural_key="actor", roles={"actor": "fk_actor"},
                id_strategy="hash"),
        DimSpec(name="kind_dim", natural_key="kind", roles={"kind": "fk_kind"},
                id_strategy="hash"),
    ]
    # fact_partitions=1: §6 output sizing — a micro-batch here is ~3k
    # rows, so 8 shuffle-width files per batch were pure file-count
    # overhead for every later fact reader (and for the write commit)
    q = denormalizing_sink(
        stream, specs, out_root, ckpt, fact_key="key", available_now=True,
        shuffle_partitions=8, fact_partitions=1,
    )
    q.awaitTermination()
    return time.time() - t0, n_rows


def run_sessionize_bench(spark, sf_dir: str) -> tuple[float, int]:
    """Stateful-streaming throughput: the events table replayed as a file
    stream (4 micro-batches) through the timer-driven sessionizer
    (applyInPandasWithState, event-time timeout) into a noop sink — the
    per-key state path under real volume, not just the semantics test."""
    import shutil

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.stateful import sessionize_stream

    staging = "/tmp/spark_graft_sess_stage"
    ckpt = staging + "_ckpt"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    events = cat_load(spark, sf_dir, "events")
    n_rows = events.count()
    events.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
        .selectExpr("CAST(user_id AS STRING) AS key", "ts")
    )
    sessions = sessionize_stream(stream, "key", "ts", gap_seconds=1800)
    from feasibility_etl_spark.streaming.conf import scoped_shuffle_partitions

    # width 20: round-7 sweep over state-store partition counts at bench SF
    # (1500 keys/batch, 4 micro-batches) — 8→16.8k, 12→20.4k, 16→21.1k,
    # 20→23.1k, 24→16.3k, 32→10.7k rows/s median-of-3. Below ~20 the
    # per-partition Python worker batches are too coarse (parallelism-
    # starved); above it the per-batch state-store commit fixed cost
    # (delta files × partitions × 4 batches) wins. PERF-NOTES 30.
    with scoped_shuffle_partitions(spark, 20):
        q = (
            sessions.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return time.time() - t0, n_rows


def run_exact_gate_bench(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming EXACT-dedup gate at bench SF (streaming/bloom_gate.py):
    the same 4-micro-batch documents replay as run_dedup_gate_bench, but
    gated on content fingerprints with the Bloom fast path — the
    comparative entry: exact membership should run far above the
    near-dup gate's rate (one md5 probe per doc vs banded LSH joins)."""
    import shutil

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.bloom_gate import exact_dedup_gate_sink

    staging = "/tmp/spark_graft_xgate_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    # m_bits sized per the sink's own guidance (~10 bits per expected
    # accepted doc, next power of two): an undersized filter saturates
    # (every row takes the exact tier, measuring index scans instead of
    # the gate); an oversized one ships dead literal bytes every batch
    m_bits = max(1 << 16, 1 << (n_rows * 10 - 1).bit_length())
    q = exact_dedup_gate_sink(
        stream, out, ckpt, m_bits=m_bits, shuffle_partitions=1
    )
    q.awaitTermination()
    return time.time() - t0, n_rows


def run_exact_gate_10x_bench(spark, sf_dir: str) -> tuple[float, int]:
    """The exact gate at 10x micro-batch size — the amortization proof
    the minhash-gate 10x entry gives its family: rows/s should scale
    near-linearly with batch size because the per-batch cost is fixed
    (checkpoint commit, bloom merge, plan bring-up) while the per-row
    cost is one md5 probe. Same 10-replica corpus recipe as
    run_dedup_gate_10x_bench — shuffled-word replicas keep fingerprints
    distinct from their parents, so the gate does representative work."""
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.operators.text import tokens
    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.bloom_gate import exact_dedup_gate_sink

    staging = "/tmp/spark_graft_xgate10_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    replicas = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.col("text")
            if i == 0
            else F.concat_ws(" ", F.shuffle(tokens("text"))).alias("text"),
        )
        for i in range(10)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    n_rows = big.count()
    big.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    m_bits = max(1 << 16, 1 << (n_rows * 10 - 1).bit_length())
    q = exact_dedup_gate_sink(
        stream, out, ckpt, m_bits=m_bits, shuffle_partitions=8
    )
    q.awaitTermination()
    return time.time() - t0, n_rows


#: The exact-gate bar, as a fraction of the MEASURED harness floor
#: (the gate's own normalized fingerprint + first-occurrence window +
#: write, no membership state — run_exact_gate_floor_bench /
#: tools/gate_floor.py). Formally REPLACES the fixed 2000 rows/s bar
#: (PERF-NOTES 22/33): that constant was set on a faster host-day and
#: hovers at ~0.7-0.8× whatever the floor happens to measure, so it
#: punished ambient drift, not gate regressions. Measured gate/floor:
#: 0.81 (r6 implied), 0.69 (r7, warm interleaved median-of-4 — the gap
#: is the bloom probe + CollectMetrics in the write plan and ~0.1 s/batch
#: of driver bookkeeping, breakdown in PERF-NOTES 33). 0.65 flags a
#: structural regression (a new per-batch job/index scan drops the ratio
#: to ~0.5) without tripping on noise. Round 8: gate and floor reps are
#: INTERLEAVED (g f g f …) after one untimed warm-up pair, and the
#: recorded ratio is the median of the per-pair ratios, so a drifting
#: host inflates both sides of every pair equally and the bar measures
#: the gate, not the weather. With the instrument made trustworthy, the
#: bar is re-calibrated to what it actually measures: warm interleaved
#: pairs on identical code read 0.63–0.67 across sessions (measured
#: distributions 0.564/0.639/0.673 cold-first and 0.629/0.638/0.672
#: warmed — the true warm ratio is ~0.65 ± 0.02, i.e. the old bar sat
#: INSIDE the instrument's noise band and coin-flipped on healthy
#: code). The structural-regression signature this bar exists to catch
#: (one extra per-batch job/index scan) halves the ratio to ~0.5 —
#: comfortably below 0.60 — so detection power is unchanged.
EXACT_GATE_FLOOR_FRACTION = 0.60

#: The SAME bar for the BLOCKWISE methodology (tools/gate_floor.py:
#: gate and floor measured as independent block medians, NOT
#: interleaved pairs). 0.60 above was re-calibrated specifically for
#: the interleaved per-pair-ratio instrument, whose pairing cancels
#: host drift; a blockwise ratio keeps the drift term, but that term
#: INFLATES noise rather than excusing regressions — so the blockwise
#: bar stays at the pre-r8 0.65 (its calibration, PERF-NOTES 33) and
#: any blockwise reading below it warrants an interleaved re-measure
#: before being treated as a regression. Bar-change discipline for
#: BOTH constants: see COVERAGE.md "Bar-change rule" (a bar may only
#: move alongside the measured healthy-code distribution AND the
#: regression-class signature, with the old bar's verdict on the
#: current record stated — PERF-NOTES 39 is the template).
EXACT_GATE_FLOOR_FRACTION_BLOCKWISE = 0.65


def run_exact_gate_floor_bench(spark, sf_dir: str) -> tuple[float, int]:
    """The exact gate's harness floor: the SAME 4-trigger stream shape as
    run_exact_gate_bench running only the gate's irreducible per-batch
    dataflow — md5 fingerprint, within-batch first-occurrence window,
    parquet write. No bloom, no membership state, no index maintenance:
    the gate cannot beat this, so gate/floor is the honest health ratio
    (emitted as stream_exact_gate_vs_floor)."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.conf import scoped_shuffle_partitions

    staging = "/tmp/spark_graft_xgate_floor_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)

    def process(batch, batch_id: int) -> None:
        from feasibility_etl_spark.operators.text import fingerprint

        w = Window.partitionBy("fp").orderBy("doc_id")
        (
            batch.withColumn("fp", fingerprint("text"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .write.mode("overwrite")
            .parquet(f"{out}/batch_id={batch_id}")
        )

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    with scoped_shuffle_partitions(spark, 1):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return time.time() - t0, n_rows


def run_decontam_gate_bench(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming decontamination gate at bench SF: the documents table
    replayed as the standard 4-micro-batch file stream through
    decontam_gate_sink against the doc_id%97 eval slice. STATELESS per
    batch (no index reads, one action per batch), so this is the
    throughput ceiling of the ingest-gate trio — the eval gram set and
    its Bloom filter build once at sink start (timed: a real job pays
    it too, once per stream lifetime, and it is eval-sized not
    corpus-sized)."""
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.decontam_gate import decontam_gate_sink

    staging = "/tmp/spark_graft_dgate_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    n_rows = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    q = decontam_gate_sink(
        stream, eval_docs, out, ckpt, m_bits=1 << 20, shuffle_partitions=8
    )
    q.awaitTermination()
    return time.time() - t0, n_rows


#: Per-tier recall@10 floors on the bench corpus (sf0.1 embeddings, the
#: SIM-* query set). Set from measured values minus margin; a tier
#: sliding under its floor is a RECALL REGRESSION and fails the ann
#: entry (reported as -1) so it surfaces exactly like a perf one.
#: Round-7 serving defaults (measured at sf0.1, deterministic — fixed
#: seeds, fixed corpus): lsh 0.60 (planes=8, multiprobe radius 3 — 36%
#: scan), ivf 0.62 (nprobe=6), pq 0.68 (refine=16), ivfpq 0.64
#: (nprobe=8, refine=32), bq 0.60 (Hamming shortlist + exact re-rank,
#: refine=8 — SIM-BQRR), ivfbq 0.67 (nprobe=8, shortlist=120). The
#: corpus is unclustered random 64-d vectors — the HARD case for every
#: tier (the clustered-fixture tests pin the >0.9 regime); floors sit
#: at the 0.5 quality bar, under every measured default. The
#: recall-vs-scan-bytes trade per tier is published as ``ann_curve``
#: in BENCH_DETAIL.json (run_ann_curve).
ANN_RECALL_FLOORS = {
    "lsh": 0.62,
    "ivf": 0.50,
    "pq": 0.55,
    "ivfpq": 0.50,
    "bq": 0.50,
    "ivfbq": 0.50,
}

#: Serving-scale recall floors, re-based on the 200k-vector sf1 curve
#: (tools/ann_curve_sf1.py → tools/ann_curve_sf1_r08.json; VERDICT r7
#: item 4). At sf1 the index geometry finally matters and every tier
#: clears >=0.6 recall@10 UNDER a 10% scan budget — measured serving
#: points: lsh 0.64 @ 7.3% (planes=12, multiprobe=3), ivf 0.86 @ 10%
#: (200 cells, nprobe=20), pq 0.94 @ 2.6% (refine=200), ivfpq 0.88 @
#: 1.2%, bq 1.00 @ 4.1% (refine=200), ivfbq 0.92 @ 1.3% (nprobe=30,
#: shortlist=1600). The r7 caveat ("LSH needs 36% scan for 0.60") was a
#: small-corpus artifact: at 2k vectors 8 planes give 256 buckets ≈ 8
#: vectors/bucket, so multiprobe must eat the corpus to fill k=10.
#: Floors sit a margin under the measured points; the artifact test
#: (tests/test_bench_ann.py) holds the scale-path tiers to >=0.6 @
#: <=10% whenever the artifact is regenerated.
ANN_RECALL_FLOORS_SF1 = {
    "lsh": 0.55,
    "ivf": 0.75,
    "pq": 0.85,
    "ivfpq": 0.75,
    "bq": 0.90,
    "ivfbq": 0.80,
}


def run_ann_recall(spark, sf_dir: str) -> dict[str, float]:
    """recall@10 of every ANN tier against the brute-force SIM-TOPK
    ground truth on the bench embeddings — tracked per round so recall
    regressions surface like perf ones (tests pin recall on CLUSTERED
    fixtures; this pins it on the actual bench corpus). The cosine
    tiers answer the 5-query SIM set; the Hamming tiers (bq/ivfbq)
    answer the 3-query SIM-BQRR/SIM-IVFBQ sets against the same cosine
    truth."""
    from feasibility_etl_spark.driver_queries import ALL_QUERIES

    def result_sets(df) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for r in df.select("query_id", "vec_id").collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    truth = result_sets(ALL_QUERIES["SIM-TOPK"](spark, sf_dir))

    def recall_on(qids, sets) -> float:
        per_q = [
            len(sets.get(q, set()) & truth[q]) / len(truth[q])
            for q in qids
            if q in truth
        ]
        return round(sum(per_q) / len(per_q), 3) if per_q else 0.0

    out: dict[str, float] = {}
    for tier, qid in (
        ("lsh", "SIM-LSH"),
        ("ivf", "SIM-IVF"),
        ("pq", "SIM-PQ"),
        ("ivfpq", "SIM-IVFPQ"),
        # bq = the SERVING tier (Hamming shortlist + exact re-rank,
        # SIM-BQRR); the un-reranked integer primitive stays SIM-BQ
        ("bq", "SIM-BQRR"),
        ("ivfbq", "SIM-IVFBQ"),
    ):
        sets = result_sets(ALL_QUERIES[qid](spark, sf_dir))
        qids = [0, 1, 2] if tier in ("bq", "ivfbq") else truth.keys()
        out[tier] = recall_on(qids, sets)
    return out


def run_pipe_corpus_stage_bench(
    spark, sf_dir: str, near_dup: str = "pairs"
) -> dict[str, float]:
    """Per-stage wall-time attribution for PIPE-CORPUS (VERDICT r9 item
    6): every stage boundary is persisted and driven to a noop sink in
    chain order, so stage k's timing measures computing k FROM ITS
    MATERIALIZED PREDECESSOR — a composition regression now names its
    stage. The boundaries come from the same builder the composed entry
    runs (pipe_corpus_stage_frames — single source of truth). The
    stage-sum is expected to sit NEAR the composed PIPE-CORPUS timing
    (each stage runs once either way); a large gap means the composition
    itself regressed (lost cache reuse, re-executed subtree)."""
    from feasibility_etl_spark.driver_queries.pipelines_joins import (
        pipe_corpus_stage_frames,
    )

    out: dict[str, float] = {}
    t0 = time.time()
    stages, shared = pipe_corpus_stage_frames(spark, sf_dir, near_dup=near_dup)
    # frame CONSTRUCTION kept as a stage so construction-time jobs can
    # never hide again: r10-r11's count-gated driver union-find executed
    # the ENTIRE d1→pairs→CC chain while the DAG was being BUILT (14.2 s
    # here at r11). r12 moved CC inside the plan (lazy two-phase
    # contraction) and reduced construction to ONE deliberate job: the
    # StageCache.cut() at the composition's fan-out root (d3 — dup-
    # survivor-sized, ~2 s), which r12's measurements showed is load-
    # bearing (a cold leaf made the composed single action re-execute
    # the persist hierarchy per reference: 1700+ stages, 133 s). A jump
    # here beyond the cut's ~2 s job means some operator reintroduced a
    # hidden construction-time action
    out["_build_eager_components"] = round(time.time() - t0, 3)
    persisted = []
    try:
        for name, df in stages:
            df = df.persist()
            persisted.append(df)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
    finally:
        for df in persisted:
            try:
                df.unpersist(blocking=False)
            except Exception:  # noqa: BLE001
                pass
        shared.release()
    return out


def run_ann_curve(spark, sf_dir: str) -> dict[str, list[dict]]:
    """The recall-vs-scan-bytes trade per ANN tier: 3 budget points per
    tier, each with recall@10 vs brute-force truth and ``scan_frac`` —
    the candidate-stage bytes read as a fraction of one full float64
    corpus scan (analytic from the tier's geometry: LSH probes/2^planes;
    IVF nprobe/n_cells; PQ/BQ code bytes over float bytes, plus the
    re-rank rows). Deterministic (fixed seeds/corpus), so round-over-
    round diffs are real regressions, not noise."""
    from pyspark.sql import functions as F

    from feasibility_etl_spark.driver_queries import ALL_QUERIES
    from feasibility_etl_spark.operators.similarity import (
        bq_rerank_topk,
        cosine_topk_lsh,
        ivf_topk,
        ivfbq_topk,
        ivfpq_topk,
        pq_topk,
    )
    from feasibility_etl_spark.sources.catalog import load as cat_load

    def result_sets(df) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for r in df.select("query_id", "vec_id").collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    emb = cat_load(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > 20_000:  # brute-force truth + a battery of ANN runs: bench-SF only
        return {}
    truth = result_sets(ALL_QUERIES["SIM-TOPK"](spark, sf_dir))
    q5 = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    q3 = q5.where(F.col("query_id") < 3)

    def recall(df, qids) -> float:
        s = result_sets(df)
        per = [
            len(s.get(q, set()) & truth[q]) / len(truth[q])
            for q in qids
            if q in truth
        ]
        return round(sum(per) / len(per), 3) if per else 0.0

    from math import comb

    k = 10
    all_q = list(truth.keys())
    curve: dict[str, list[dict]] = {t: [] for t in ANN_RECALL_FLOORS}
    for np_, mp in ((8, 1), (8, 2), (8, 3), (10, 3), (10, 4)):
        # the 8-plane radius series keeps round-over-round continuity;
        # planes=10 radius=4 is the canonical SIM-LSH config since r12
        # (recall 0.70 at the same ~0.37 scan as 8/3's 0.60)
        probes = sum(comb(np_, r) for r in range(mp + 1))
        curve["lsh"].append({
            "cfg": f"planes={np_},multiprobe={mp}",
            "recall": recall(
                cosine_topk_lsh(emb, q5, k=k, dim=64, n_planes=np_, multiprobe=mp),
                all_q,
            ),
            "scan_frac": round(probes / 2 ** np_, 4),
        })
    # query-directed probing (Lv et al. 2007): flips subsets of the 5
    # lowest-|margin| planes — 32 probes vs radius-2's blind 37 — so the
    # curve tracks both probing strategies round-over-round (the SIM-LSH-QD
    # granular entry is the same config)
    curve["lsh"].append({
        "cfg": "planes=8,probe_lowmargin=5",
        "recall": recall(
            cosine_topk_lsh(emb, q5, k=k, dim=64, n_planes=8,
                            probe_lowmargin=5),
            all_q,
        ),
        "scan_frac": round(32 / 256, 4),
    })
    for npb in (4, 6, 8):
        curve["ivf"].append({
            "cfg": f"n_cells=16,nprobe={npb}",
            "recall": recall(
                ivf_topk(emb, q5, k=k, n_cells=16, nprobe=npb,
                         train_fraction=0.5, max_iter=8),
                all_q,
            ),
            "scan_frac": round(npb / 16, 4),
        })
    for ref in (4, 8, 16):
        curve["pq"].append({
            "cfg": f"M=8,K=16,refine={ref}",
            "recall": recall(
                pq_topk(emb, q5, k=k, n_subspaces=8, n_codes=16,
                        train_fraction=0.5, max_iter=4, refine=ref),
                all_q,
            ),
            # 8 code bytes per vector vs 512 float64 bytes + re-rank rows
            "scan_frac": round(8 / 512 + ref * k / n, 4),
        })
    for npb, ref in ((4, 4), (6, 16), (8, 32)):
        curve["ivfpq"].append({
            "cfg": f"n_cells=16,nprobe={npb},refine={ref}",
            "recall": recall(
                ivfpq_topk(emb, q5, k=k, n_cells=16, nprobe=npb, n_subspaces=8,
                           n_codes=16, train_fraction=0.5, max_iter=4,
                           refine=ref),
                all_q,
            ),
            "scan_frac": round((npb / 16) * (8 / 512) + ref * k / n, 4),
        })
    for ref in (4, 8, 16):
        curve["bq"].append({
            "cfg": f"refine={ref}",
            "recall": recall(bq_rerank_topk(emb, q3, k=k, refine=ref), [0, 1, 2]),
            # 16 packed-long bytes per 64-d vector vs 512 float bytes
            "scan_frac": round(16 / 512 + ref * k / n, 4),
        })
    for npb, sl in ((4, 40), (6, 80), (8, 120)):
        curve["ivfbq"].append({
            "cfg": f"n_cells=16,nprobe={npb},shortlist={sl}",
            "recall": recall(
                ivfbq_topk(emb, q3, k=k, n_cells=16, nprobe=npb, shortlist=sl,
                           train_fraction=0.5, max_iter=8),
                [0, 1, 2],
            ),
            "scan_frac": round((npb / 16) * (16 / 512) + sl / n, 4),
        })
    return curve


def run_scd2_sink_bench(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming SCD2 fold at bench SF: per-user event_type observations
    replayed as a 4-micro-batch CDC stream through scd2_sink — every
    batch folds into the persisted open slice (read back → scd2_apply →
    append closed delta + commit open/v=N), all executor-side."""
    import shutil

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.scd2_sink import scd2_sink

    staging = "/tmp/spark_graft_scd2_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    events = cat_load(spark, sf_dir, "events").selectExpr(
        "CAST(user_id AS STRING) AS k", "event_type AS tier", "ts"
    )
    n_rows = events.count()
    events.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("k string, tier string, ts timestamp")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    q = scd2_sink(stream, out + "/hist", ckpt, "k", ["tier"], shuffle_partitions=8)
    q.awaitTermination()
    return time.time() - t0, n_rows


def run_dedup_gate_bench(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming near-dup gate at bench SF: the documents table replayed as
    a 4-micro-batch file stream through near_dup_gate_sink — every batch
    runs the full incremental-MinHash gate against the index accumulated by
    the previous batches and appends survivors to corpus + index, all
    executor-side."""
    import shutil

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.dedup_gate import near_dup_gate_sink

    staging = "/tmp/spark_graft_gate_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()
    docs.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    q = near_dup_gate_sink(stream, out, ckpt, shuffle_partitions=8)
    q.awaitTermination()
    return time.time() - t0, n_rows


def run_dedup_gate_10x_bench(spark, sf_dir: str) -> tuple[float, int]:
    """The gate at 10× micro-batch size — proves the per-batch fixed cost
    (checkpoint commit, index probe, plan bring-up) amortizes: rows/s
    should scale near-linearly with batch size until the gate is
    CPU-bound on signatures. Corpus = documents × 10 replicas; each
    replica's words are independently shuffled (F.shuffle), which
    preserves length/token statistics but destroys word-3-gram shingles,
    so replicas are NOT near-dups of their parents and the gate does
    representative work instead of degenerate all-drop batches. Same
    4-trigger stream shape as run_dedup_gate_bench, so each micro-batch
    carries ~12.5k docs at sf0.1 (vs 1.25k in the 1× entry)."""
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.operators.text import tokens
    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.streaming.dedup_gate import near_dup_gate_sink

    staging = "/tmp/spark_graft_gate10_stage"
    ckpt = staging + "_ckpt"
    out = staging + "_out"
    for p in (staging, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)
    docs = cat_load(spark, sf_dir, "documents").select("doc_id", "text")
    replicas = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.col("text")
            if i == 0
            else F.concat_ws(" ", F.shuffle(tokens("text"))).alias("text"),
        )
        for i in range(10)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    n_rows = big.count()
    big.repartition(8).write.mode("overwrite").parquet(staging)

    t0 = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
    )
    # width 16, not 32: a 12.5k-doc micro-batch keeps 16 cores busy
    # through the signature stage, and halving the task/file count per
    # shuffle+write measured 2x faster end-to-end (scheduler-bound)
    q = near_dup_gate_sink(stream, out, ckpt, shuffle_partitions=16)
    q.awaitTermination()
    return time.time() - t0, n_rows


def run_rest_bench(spark, sf_dir: str) -> tuple[float, int]:
    """REST ingest plumbing at volume over an in-memory transport: the
    paged search fans (orders-count / 100) pages out to executors and
    parses each page's JSON array against the declared schema; the per-key
    N+1 lookup then fetches details for ~1/13th of the items. Rates are set
    effectively unthrottled so the timing measures the Spark plumbing
    (range fan-out, Arrow batches, JSON parse, error columns), not sleeps.
    The paged result is staged to parquet between the two stages so each
    transport call happens exactly once."""
    import json as _json
    import shutil

    from pyspark.sql import functions as F

    from feasibility_etl_spark.sources.catalog import load as cat_load
    from feasibility_etl_spark.sources.rest import fetch_paged, fetch_per_key

    staging = "/tmp/spark_graft_rest_stage"
    shutil.rmtree(staging, ignore_errors=True)
    total = cat_load(spark, sf_dir, "orders").count()
    page_size = 100

    def fetch_page(i: int) -> str:
        base = i * page_size
        return _json.dumps(
            [
                {
                    "key": f"K-{base + j}",
                    "status": "open" if (base + j) % 3 else "closed",
                    "points": (base + j) % 13,
                }
                for j in range(min(page_size, total - base))
            ]
        )

    def fetch_one(key: str) -> str:
        kid = int(key.split("-")[1])
        return _json.dumps({"assignee": f"user_{kid % 97}", "worklogs": kid % 7})

    t0 = time.time()
    items = fetch_paged(
        spark,
        fetch_page,
        "key string, status string, points long",
        count_total=lambda: total,
        page_size=page_size,
    )
    items.write.mode("overwrite").parquet(staging)
    keys = spark.read.parquet(staging).filter(F.col("points") == 0).select("key")
    detail = fetch_per_key(
        keys,
        "key",
        fetch_one,
        "assignee string, worklogs long",
        max_parallel=32,
        requests_per_sec=1e9,
    )
    detail.write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    n_keys = keys.count()
    return elapsed, total + n_keys


#: The driver keeps only the LAST 2000 characters of stdout and parses the
#: final JSON line out of them (measured: the recorded BENCH_r1x.json
#: ``tail`` fields are exactly 2000 chars). The final line plus its newline
#: must sit entirely inside that window or the driver sees truncated JSON.
DRIVER_TAIL_BUDGET = 1980


def render_headline_line(headline: dict, batch_timings: dict) -> str:
    """Render the driver-contract final JSON line, keeping ``queries``
    inline whenever the line fits the driver's tail window.

    Cascade: 2-decimal queries → 1-decimal queries → a ``queries_file``
    pointer as the last resort (BENCH_DETAIL.json always carries the
    full-precision dict either way). Rounds 10–11 used a blanket 1800-char
    guard that ALWAYS dropped the dict once the suite passed ~55 entries;
    the contract wants ``queries`` inline, and at 2 decimals the current
    60-entry line measures 1959 chars — inside the window. Fixed r12.
    """
    for decimals in (2, 1):
        h = dict(headline)
        h["queries"] = {k: round(v, decimals) for k, v in batch_timings.items()}
        line = json.dumps(h, separators=(",", ":"))
        if len(line) < DRIVER_TAIL_BUDGET:
            return line
    h = dict(headline)
    h["queries_file"] = "BENCH_DETAIL.json"
    return json.dumps(h, separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    spark = build_session("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    # Pre-fork the Python worker pool + Arrow serialization machinery so
    # the first mapInPandas-bearing query doesn't absorb that one-time
    # bring-up (same rationale as the parquet/broadcast warm-up below —
    # measured ~3.5s on the first Python-stage query without this).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    # warm the parquet reader / broadcast / window / noop-sink machinery on
    # the smallest SF so per-query timings measure the query, not one-time
    # session bring-up (falls back to the bench SF if no sibling exists)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    try:
        flagship(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as e:  # noqa: BLE001
        print(f"bench warm-up skipped: {e}", file=sys.stderr)

    # HOST-SPEED ANCHOR (round 9, PERF-NOTES 49): a fixed synthetic
    # CPU+shuffle plan (1e9-row codegen'd modulo groupBy over 32
    # partitions) timed after warm-up, reps=3 median. The anchor has no
    # engine code in it, so across rounds it moves ONLY with the host —
    # this round measured the same engine at 93.7/114.1/99.3 s across
    # sessions (PERF-NOTES 47: interleaved A/B proved zero code change),
    # and record readers previously had no way to see that from the
    # record itself. Divide headline by anchor before comparing rounds;
    # within-record per-query comparisons never needed it.
    def _anchor_once() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).select(
            (F.col("id") % 9973).alias("k"), "id"
        ).groupBy("k").agg(F.sum("id").alias("s")).select(
            F.sum("s")
        ).collect()
        return round(time.time() - t0, 3)

    _anchor_once()  # untimed: the anchor plan's own codegen warm-up
    anchor_reps = [_anchor_once() for _ in range(3)]
    host_anchor = sorted(anchor_reps)[1]

    # IO-PROBE COMPANION ANCHOR (round 11, VERDICT r10 item 1): fixed
    # parquet scan+agg+write; see IO_ANCHOR_NOMINAL_SEC for the triage
    # rule. Setup write and first (page-cache-priming) rep are untimed.
    import shutil
    import tempfile

    io_anchor = 0.0
    io_anchor_reps: list[float] = []
    io_dir = tempfile.mkdtemp(prefix="feasibility_etl_spark_io_anchor_")
    try:
        io_src = io_anchor_setup(spark, io_dir)
        io_out = os.path.join(io_dir, "io_anchor_out")
        io_anchor_once(spark, io_src, io_out)  # untimed warm rep
        io_anchor_reps = [io_anchor_once(spark, io_src, io_out) for _ in range(3)]
        io_anchor = sorted(io_anchor_reps)[1]
    except Exception as e:  # noqa: BLE001
        print(f"io anchor failed: {e}", file=sys.stderr)
    finally:
        shutil.rmtree(io_dir, ignore_errors=True)

    # per-query job metrics (records/bytes in, shuffle read/write,
    # executor time) from the warm final rep — the scale-posture
    # evidence: a timing can look fine while shuffle bytes quietly grow
    from feasibility_etl_spark.observability import JobMetricsTracker

    tracker = JobMetricsTracker(spark)
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        isolate_entry(spark)
        try:
            med, reps = run_query_med(spark, name, sf_dir, tracker=tracker)
            timings[name.lower()] = round(med, 3)
            rep_times[name.lower()] = reps
        except Exception as e:  # noqa: BLE001
            timings[name.lower()] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)
    # POST-SUITE anchor re-reads (r11): the anchors are point measurements,
    # and the clean2 r11 record caught the IO anchor drifting 1.586 → 1.108
    # WITHIN one run — a single pre-suite median then mis-scales entries
    # that ran under different weather. Publishing a post-suite read of
    # each anchor makes intra-run drift visible in the record itself;
    # triage should distrust per-entry normalized ratios when pre/post
    # disagree by more than ~10%.
    host_anchor_post = _anchor_once()
    io_anchor_post = 0.0
    io_dir2 = tempfile.mkdtemp(prefix="feasibility_etl_spark_io_anchor_post_")
    try:
        io_src2 = io_anchor_setup(spark, io_dir2)
        io_out2 = os.path.join(io_dir2, "out")
        io_anchor_once(spark, io_src2, io_out2)  # untimed warm rep
        io_anchor_post = io_anchor_once(spark, io_src2, io_out2)
    except Exception as e:  # noqa: BLE001
        print(f"io anchor post failed: {e}", file=sys.stderr)
    finally:
        shutil.rmtree(io_dir2, ignore_errors=True)

    plan_metrics: dict[str, dict[str, int]] = {}
    for row in tracker.metrics_df().collect():
        plan_metrics[row.query.lower()] = {
            "input_mb": round(row.input_bytes / 1e6, 1),
            "shuffle_write_mb": round(row.shuffle_write_bytes / 1e6, 2),
            "shuffle_read_mb": round(row.shuffle_read_bytes / 1e6, 2),
            "executor_run_ms": row.executor_run_ms,
            "n_tasks": row.n_tasks,
        }
    # batch suite total first — streaming entries are reported per-query but
    # excluded from the headline sum so `value` stays comparable round-over-
    # round (micro-batch/checkpoint fixed costs dominate them at bench SF and
    # would drown the batch signal; at production scale they amortize away)
    total = round(sum(v for v in timings.values() if v >= 0), 3)

    stream_entries = [
        ("stream-window", run_stream_bench, "stream_rows_per_sec"),
        ("stream-denorm-sink", run_denorm_sink_bench, "stream_denorm_rows_per_sec"),
        ("stream-sessionize", run_sessionize_bench, "stream_sessionize_rows_per_sec"),
        ("rest-ingest", run_rest_bench, "rest_rows_per_sec"),
        ("stream-dedup-gate", run_dedup_gate_bench, "stream_dedup_gate_rows_per_sec"),
        (
            "stream-dedup-gate-10x",
            run_dedup_gate_10x_bench,
            "stream_dedup_gate_10x_rows_per_sec",
        ),
        ("stream-exact-gate", None, "stream_exact_gate_rows_per_sec"),
        (
            "stream-exact-gate-10x",
            run_exact_gate_10x_bench,
            "stream_exact_gate_10x_rows_per_sec",
        ),
        ("stream-scd2-sink", run_scd2_sink_bench, "stream_scd2_rows_per_sec"),
        (
            "stream-decontam-gate",
            run_decontam_gate_bench,
            "stream_decontam_gate_rows_per_sec",
        ),
    ]
    rates: dict[str, int | float | None] = {}
    for entry_name, fn, rate_key in stream_entries:
        isolate_entry(spark)
        if entry_name == "stream-exact-gate":
            # INTERLEAVED gate/floor measurement (VERDICT r7 item 1c):
            # each gate rep is immediately followed by a floor rep, so
            # every per-pair ratio compares two runs seconds apart under
            # the same ambient conditions — host drift that poisons a
            # whole block of reps (the r7 record's 0.634-vs-0.687 split
            # between driver and builder runs) cancels out of the ratio.
            # The health metric is the MEDIAN PER-PAIR RATIO, not the
            # ratio of independently-measured medians.
            #
            # Pre-seed the failure sentinels (r8 ADVICE): an exception
            # anywhere in the interleaved block must leave the same
            # -1.0/None failure shape every other stream entry records,
            # or round-over-round record diffing loses the marker.
            timings["stream-exact-gate"] = -1.0
            timings["stream-exact-gate-floor"] = -1.0
            rates["stream_exact_gate_rows_per_sec"] = None
            rates["stream_exact_gate_floor_rows_per_sec"] = None
            rates["stream_exact_gate_vs_floor"] = None
            try:
                # one UNTIMED warm-up pair: the first gate rep carries
                # the family's cold costs (checkpoint dir creation, state
                # bring-up — measured 2.76 s vs 2.25 s warm) and lands a
                # ~0.56 ratio in the pair set, dragging the median below
                # the warm regime the bar was calibrated on
                run_exact_gate_bench(spark, sf_dir)
                run_exact_gate_floor_bench(spark, sf_dir)
                g_runs, f_runs = [], []
                for _ in range(BENCH_REPS):
                    g_runs.append(run_exact_gate_bench(spark, sf_dir))
                    f_runs.append(run_exact_gate_floor_bench(spark, sf_dir))
                g_sec = _median([s for s, _ in g_runs])
                f_sec = _median([s for s, _ in f_runs])
                g_n, f_n = g_runs[0][1], f_runs[0][1]
                timings["stream-exact-gate"] = round(g_sec, 3)
                timings["stream-exact-gate-floor"] = round(f_sec, 3)
                rep_times["stream-exact-gate"] = [round(s, 3) for s, _ in g_runs]
                rep_times["stream-exact-gate-floor"] = [
                    round(s, 3) for s, _ in f_runs
                ]
                rates["stream_exact_gate_rows_per_sec"] = round(g_n / g_sec)
                rates["stream_exact_gate_floor_rows_per_sec"] = round(
                    f_n / f_sec
                )
                ratios = [
                    (g_n / gs) / (f_n / fs)
                    for (gs, _), (fs, _) in zip(g_runs, f_runs)
                ]
                vs_floor = round(_median(ratios), 3)
                rates["stream_exact_gate_vs_floor"] = vs_floor
                if vs_floor < EXACT_GATE_FLOOR_FRACTION:
                    print(
                        f"bench exact-gate below floor bar: {vs_floor} < "
                        f"{EXACT_GATE_FLOOR_FRACTION} (median per-pair "
                        f"ratio, {BENCH_REPS} interleaved pairs)",
                        file=sys.stderr,
                    )
            except Exception as e:  # noqa: BLE001
                print(f"bench error stream-exact-gate: {e}", file=sys.stderr)
            continue
        sec, n = -1.0, 0
        try:
            sec, n, reps = run_stream_med(fn, spark, sf_dir)
            sec = round(sec, 3)
            rep_times[entry_name] = reps
        except Exception as e:  # noqa: BLE001
            print(f"bench error {entry_name}: {e}", file=sys.stderr)
        timings[entry_name] = sec
        rates[rate_key] = round(n / sec) if sec > 0 else None

    # ANN recall@10 vs brute-force truth — deterministic (fixed seeds +
    # corpus), so one rep; floors pin each tier (ANN_RECALL_FLOORS)
    recall_metrics: dict[str, object] = {}
    try:
        recalls = run_ann_recall(spark, sf_dir)
        for tier, r in recalls.items():
            recall_metrics[f"ann_recall_{tier}"] = r
        below = [
            t for t, r in recalls.items() if r < ANN_RECALL_FLOORS.get(t, 0.0)
        ]
        if below:
            recall_metrics["ann_recall_below_floor"] = below
            print(f"bench ANN recall below floor: {below}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"bench error ann-recall: {e}", file=sys.stderr)

    # recall-vs-scan-bytes curve (detail-only; 3 budget points per tier)
    ann_curve: dict[str, list] = {}
    try:
        ann_curve = run_ann_curve(spark, sf_dir)
    except Exception as e:  # noqa: BLE001
        print(f"bench error ann-curve: {e}", file=sys.stderr)

    # PIPE-CORPUS per-stage attribution (detail-only): stage-sum should
    # sit near the composed timing — warn loudly when it doesn't, since
    # that means the composition re-executes a subtree or lost a persist
    pipe_stages: dict[str, float] = {}
    try:
        isolate_entry(spark)
        pipe_stages = run_pipe_corpus_stage_bench(spark, sf_dir)
        composed = timings.get("pipe-corpus", -1.0)
        stage_sum = round(sum(pipe_stages.values()), 3)
        pipe_stages["_stage_sum"] = stage_sum
        pipe_stages["_composed"] = composed
        if composed > 0 and not (0.4 <= stage_sum / composed <= 2.5):
            print(
                f"bench pipe-corpus composition drift: stage sum {stage_sum}s "
                f"vs composed {composed}s — a stage lost cache reuse or the "
                "composed plan re-executes a subtree",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001
        print(f"bench error pipe-corpus-stages: {e}", file=sys.stderr)

    # same attribution for the component-grain variant (VERDICT r11 item
    # 4: the clique-safe grain is the 100x default — benched first-class)
    pipe_comp_stages: dict[str, float] = {}
    try:
        isolate_entry(spark)
        pipe_comp_stages = run_pipe_corpus_stage_bench(
            spark, sf_dir, near_dup="components"
        )
        comp_composed = timings.get("pipe-corpus-components", -1.0)
        comp_sum = round(sum(pipe_comp_stages.values()), 3)
        pipe_comp_stages["_stage_sum"] = comp_sum
        pipe_comp_stages["_composed"] = comp_composed
        if comp_composed > 0 and not (0.4 <= comp_sum / comp_composed <= 2.5):
            print(
                f"bench pipe-corpus-components composition drift: stage sum "
                f"{comp_sum}s vs composed {comp_composed}s",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001
        print(f"bench error pipe-corpus-components-stages: {e}", file=sys.stderr)

    # Output contract (round 7, VERDICT r6 item 1): the driver keeps only
    # the LAST 2000 chars of stdout and parses the final line — round 6's
    # headline was lost because plan_metrics rode inline and pushed the
    # line's head out of the tail window. So: full diagnostics go to a
    # repo file + an EARLIER stdout line; the FINAL line is a compact
    # headline hard-capped well under the tail window.
    detail = {
        "metric": "bench_detail",
        "value": total,
        "unit": "sec",
        "reps": BENCH_REPS,
        "queries": timings,
        "rep_times": rep_times,
        "host_anchor_sec": host_anchor,
        "host_anchor_reps": anchor_reps,
        # anchor-normalized values (raw × nominal/anchor): USE these for
        # round-over-round regression triage; raw stays the ground truth
        "anchor_nominal_sec": ANCHOR_NOMINAL_SEC,
        "value_normalized": round(total * ANCHOR_NOMINAL_SEC / host_anchor, 3)
        if host_anchor > 0
        else None,
        "queries_normalized": normalize_by_anchor(timings, host_anchor),
        "io_anchor_sec": io_anchor,
        "io_anchor_reps": io_anchor_reps,
        "io_anchor_post_sec": io_anchor_post,
        "host_anchor_post_sec": host_anchor_post,
        "io_anchor_nominal_sec": IO_ANCHOR_NOMINAL_SEC,
        "value_normalized_io": round(total * IO_ANCHOR_NOMINAL_SEC / io_anchor, 3)
        if io_anchor > 0
        else None,
        "queries_normalized_io": normalize_by_anchor(
            timings, io_anchor, nominal=IO_ANCHOR_NOMINAL_SEC
        ),
        "plan_metrics": plan_metrics,
        "ann_curve": ann_curve,
        "pipe_corpus_stage_sec": pipe_stages,
        "pipe_corpus_components_stage_sec": pipe_comp_stages,
        "sf": sf,
        **rates,
        **recall_metrics,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:
        print(f"bench detail write failed: {e}", file=sys.stderr)
    print(json.dumps(detail, separators=(",", ":")))

    # streaming entries are excluded from the compact `queries` dict — the
    # *_rows_per_sec keys carry them (same numbers, shorter encoding)
    batch_timings = {
        k: round(v, 2)
        for k, v in timings.items()
        if not (k.startswith(("stream-", "rest-")))
    }
    headline = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "reps": BENCH_REPS,
        "sf": sf,
        "host_anchor_sec": host_anchor,
        "anchor_nominal_sec": ANCHOR_NOMINAL_SEC,
        "value_normalized": round(total * ANCHOR_NOMINAL_SEC / host_anchor, 3)
        if host_anchor > 0
        else None,
        "io_anchor_sec": io_anchor,
        "io_anchor_nominal_sec": IO_ANCHOR_NOMINAL_SEC,
        "value_normalized_io": round(total * IO_ANCHOR_NOMINAL_SEC / io_anchor, 3)
        if io_anchor > 0
        else None,
        **rates,
        **recall_metrics,
    }
    print(render_headline_line(headline, batch_timings))
    spark.stop()


if __name__ == "__main__":
    main()
