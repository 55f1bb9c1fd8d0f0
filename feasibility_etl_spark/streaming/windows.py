"""Event-time windowing — the Structured Streaming bridge (SURVEY.md §2.9).

The reference is batch-only; the engine adds the windowed aggregations a
streaming ingest needs, built so the SAME code runs in batch mode (over the
``events`` parquet) and streaming mode (``readStream`` source): ``F.window``
/ ``F.session_window`` work identically in both, and watermarks are a no-op
on batch frames per Spark semantics.

Scale shape: windowed groupBy shuffles on (key, window); watermarks bound
streaming state so late data past the horizon is dropped rather than held.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str = "1 hour") -> DataFrame:
    """Attach an event-time watermark (streaming state bound; batch no-op)."""
    return df.withWatermark(ts_col, delay)


def _flatten(grouped: DataFrame, window_col: str, prefix: str) -> DataFrame:
    rest = [c for c in grouped.columns if c != window_col]
    return grouped.select(
        F.col(f"{window_col}.start").alias(f"{prefix}_start"),
        F.col(f"{window_col}.end").alias(f"{prefix}_end"),
        *rest,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Non-overlapping fixed windows: groupBy(window(ts, d), *keys).agg(...)."""
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    return _flatten(out, "window", "window")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Overlapping windows of ``duration`` every ``slide``."""
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    return _flatten(out, "window", "window")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge (per key)."""
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("session"), *[F.col(k) for k in keys]).agg(*aggs)
    return _flatten(out, "session", "session")


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming-safe exact dedup on key columns.

    With ``ts_col``, uses ``dropDuplicatesWithinWatermark`` — state for a key
    is evicted once the watermark passes it, so the dedup state store is
    bounded by the watermark horizon instead of growing with the stream's
    lifetime key cardinality (the 100 TB/day posture). Without ``ts_col``
    falls back to plain ``dropDuplicates`` (batch, or streams with bounded
    keys). Batch frames take the plain path too: within-watermark dedup is
    streaming-only in Spark.
    """
    if ts_col is None or not df.isStreaming:
        return df.dropDuplicates(list(keys))
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    max_lag: str = "1 hour",
    how: str = "inner",
    right_prefix: str = "right_",
) -> DataFrame:
    """Stream-stream equi-join with DUAL watermarks and a time-range bound.

    Both inputs are unbounded, so each side must buffer rows that future
    rows of the other side might still match. Two things bound that state:
    a watermark on EACH side (how late its events may arrive) and the
    ``max_lag`` range condition ``right_ts ∈ [left_ts − max_lag, left_ts +
    max_lag]`` — together they let Spark compute a global eviction horizon
    (state older than watermark + lag can never match again and is dropped).
    Without the range bound an inner join buffers forever; for outer joins
    Spark outright requires watermark + time constraint. This is the
    correlation shape (clicks ⋈ impressions, request ⋈ response) that
    stream-static ``enrich_stream`` can't express.

    Right-side non-key/non-ts columns come back ``right_prefix``-renamed so
    same-named metrics survive the join unambiguously. Works identically on
    batch frames (watermarks are a no-op there), which is how the oracle
    test pins the semantics.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lw = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right
    renames = {
        c: right_prefix + c for c in rw.columns if c not in keys
    }
    rw = rw.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(a) for c, a in renames.items()],
    )
    r_ts = right_prefix + right_ts
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated right-side key columns (equi-join keeps one value)
    return joined.drop(*[rw[k] for k in keys])


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the static dim is broadcast to every
    micro-batch task — no stream-side shuffle, no state store. The standard
    shape for attaching slowly-changing reference data to an event stream;
    for stream-stream joins use watermarks on both sides instead.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), keys, how)


def resample(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Fixed-interval resampling WITH GAP FILL — the time-series
    completion of ``tumbling_agg``: buckets with no events become
    explicit rows instead of silently missing, so downstream
    charting/forecasting/rate math sees a dense, regular series.

    Per key, a bucket spine spans that key's own [min, max] bucket
    (``sequence`` over timestamps — no global clock assumption, keys
    with different lifetimes get different spines) and left-joins the
    bucket aggregates; ``fill`` maps agg columns to the value empty
    buckets take (e.g. ``{"n_events": 0}``) — unfilled columns stay
    NULL, the honest default for means/sums.

    Scale shape: one shuffle for the bucket aggregation (map-side
    partials), one bounded per-key bounds agg, and the spine join keyed
    identically to the aggregation. The spine is keys × buckets rows —
    generated, never scanned.
    """
    agged = tumbling_agg(df, ts_col, duration, aggs, keys)
    bounds = agged.groupBy(*[F.col(k) for k in keys]).agg(
        F.min("window_start").alias("_lo"), F.max("window_start").alias("_hi")
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {duration}"))
        ).alias("window_start"),
    )
    out = spine.join(agged, [*keys, "window_start"], "left").drop("window_end")
    if fill:
        out = out.select(
            *keys,
            "window_start",
            *[
                F.coalesce(F.col(c), F.lit(fill[c])).alias(c) if c in fill else F.col(c)
                for c in agged.columns
                if c not in (*keys, "window_start", "window_end")
            ],
        )
    return out
