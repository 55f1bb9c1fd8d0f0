"""Paged + per-key REST ingest, distributed (SURVEY §2.1 S-SEARCH/S-LOOKUP/S-THROTTLE).

The reference's primary source is a JIRA search POST returning a page of
issues (etl.js:92-195) followed by N+1 per-key detail GETs throttled to 5
concurrent requests (async.parallelLimit, etl.js:206; request closures in
helpers.js:41-88). Errors don't halt the run — they're recorded on the
result object (helpers.js:64-86). The engine-side read of the *landed*
payloads is S-SEARCH (sources/readers.py); this module is the transport
demo that completes the story: how those HTTP calls run on a cluster.

Spark-first shape — the fetch fan-out is a *dataflow*, not a driver loop:

- :func:`fetch_paged`: ONE driver-side probe call learns the result count,
  then page indexes become a ``spark.range`` frame and executors fetch
  pages in parallel through an Arrow-batched ``mapInPandas`` stage. 10M
  pages is a 10M-row frame, not 10M driver callbacks.
- :func:`fetch_per_key`: the N+1 lookup. The key frame is repartitioned to
  ``max_parallel`` tasks (the reference's parallelLimit, as a real cluster
  knob) and each task paces its calls to ``requests_per_sec`` — so the
  aggregate rate against the remote API is bounded by
  ``max_parallel * requests_per_sec`` regardless of cluster size.
- Failures land as an ``_err`` column on the row (null on success), the
  reference's record-errors-don't-halt semantics; no retries, matching the
  reference (E-THRESH-RETRY absent by design, SURVEY §2.8).

The transport is an injected callable (page index / key → raw JSON string),
so the same operators run against a real ``urllib`` transport in production
and a deterministic in-memory fake in this networkless container — the
Spark-side plumbing (schema, partitioning, batching, error capture) is real
and tested either way.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _throttled_fetch(keys, fetch_one, requests_per_sec: float):
    """Call ``fetch_one`` per key, spacing calls to the per-task rate."""
    import time

    min_gap = 1.0 / requests_per_sec if requests_per_sec else 0.0
    last = 0.0
    for k in keys:
        wait = last + min_gap - time.monotonic()
        if wait > 0:
            time.sleep(wait)
        last = time.monotonic()
        try:
            yield k, fetch_one(k), None
        except Exception as e:  # noqa: BLE001 — record, don't halt (ref semantics)
            yield k, None, f"{type(e).__name__}: {e}"


def fetch_paged(
    spark: SparkSession,
    fetch_page: Callable[[int], str],
    payload_schema: T.StructType | str,
    count_total: Callable[[], int],
    page_size: int,
) -> DataFrame:
    """Distributed paged search: one row per fetched item.

    ``count_total`` runs ONCE on the driver (the probe the reference's
    first search response carries as ``total``); page indexes then fan out
    as a ``range`` frame and ``fetch_page(i)`` runs executor-side, each
    call returning the JSON array for one page. Items parse against the
    explicit ``payload_schema`` (never schema inference on an API — the
    contract is declared, S-SEARCH posture). A failed page yields one row
    with null payload fields and ``_err`` set.
    """
    n_pages = max(1, math.ceil(count_total() / page_size))

    def fetch(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = list(_throttled_fetch(pdf["page_id"], fetch_page, 0.0))
            yield pd.DataFrame(
                {
                    "page_id": [r[0] for r in rows],
                    "_raw": [r[1] for r in rows],
                    "_err": [r[2] for r in rows],
                }
            )

    pages = spark.range(n_pages).toDF("page_id")
    raw = pages.mapInPandas(fetch, "page_id long, _raw string, _err string")
    item_t = payload_schema if isinstance(payload_schema, T.StructType) else T._parse_datatype_string(payload_schema)
    parsed = raw.select(
        "page_id",
        F.explode_outer(F.from_json("_raw", T.ArrayType(item_t))).alias("item"),
        "_err",
    )
    return parsed.select("page_id", "item.*", "_err")


def fetch_per_key(
    keys_df: DataFrame,
    key_col: str,
    fetch_one: Callable,
    payload_schema: T.StructType | str,
    max_parallel: int = 5,
    requests_per_sec: float = 10.0,
) -> DataFrame:
    """The N+1 per-key lookup as a throttled distributed map.

    Input: a frame of keys (e.g. issue keys from :func:`fetch_paged`).
    Output: one row per key with the parsed payload struct columns plus
    ``_err``. ``max_parallel`` bounds concurrent fetch tasks (the
    reference's parallelLimit of 5, etl.js:206) and each task paces to
    ``requests_per_sec``, so the remote API sees at most
    ``max_parallel * requests_per_sec`` calls/sec from the whole cluster.
    """

    def fetch(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = list(_throttled_fetch(pdf[key_col], fetch_one, requests_per_sec))
            yield pd.DataFrame(
                {
                    key_col: [r[0] for r in rows],
                    "_raw": [r[1] for r in rows],
                    "_err": [r[2] for r in rows],
                }
            )

    key_t = keys_df.schema[key_col].dataType.simpleString()
    raw = (
        keys_df.select(key_col)
        .repartition(max_parallel)
        .mapInPandas(fetch, f"{key_col} {key_t}, _raw string, _err string")
    )
    return raw.select(
        key_col, F.from_json("_raw", payload_schema).alias("payload"), "_err"
    ).select(key_col, "payload.*", "_err")
