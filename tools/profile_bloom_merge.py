"""One-shot before/after profile for bloom_merge's dense re-assembly
(r8 ADVICE: the single-task collect_list + array_sort over all m/32
words was the same linear-in-m serial tail PERF-NOTES 36 measured and
removed from bloom_build — this measures the merge-side fix).

Builds ``shards`` per-key filters at ``m_bits`` (dense long arrays) and
times (a) the OLD shape — one global struct sort over every word — and
(b) the shipped segmented shape, merging them down to a single filter.
Asserts the two merged arrays are bit-identical before reporting.

Usage: python tools/profile_bloom_merge.py [log2_m] [shards] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_merge,
)
from feasibility_etl_spark.session import build_session  # noqa: E402


def bloom_merge_old(
    df: DataFrame, keys: list[str] | None = None, bloom_col: str = "bloom"
) -> DataFrame:
    """The pre-r9 shape: dense order restored by ONE collect_list +
    array_sort over all m/32 (index, word) structs — a single-task sort
    linear in m (the serial tail this profile measures)."""
    keys = keys or []
    words = (
        df.select(*keys, F.posexplode(bloom_col).alias("_i", "_v"))
        .groupBy(*keys, "_i")
        .agg(F.bit_or("_v").alias("_word"))
    )
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("_i"), F.col("_word")))
    ).alias("_ws")
    agged = words.groupBy(*keys).agg(packed) if keys else words.agg(packed)
    return agged.select(
        *keys,
        F.transform(F.col("_ws"), lambda s: s.getField("_word")).alias(bloom_col),
    )


def main() -> None:
    log2_m = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    m_bits = 1 << log2_m

    spark = build_session("profile-bloom-merge")
    spark.sparkContext.setLogLevel("ERROR")

    # one modest filter per shard key — the cost under test is the
    # m-word re-assembly, not the probe volume
    vals = spark.range(200_000).select(
        (F.col("id") % shards).alias("shard"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    filters = bloom_build(
        vals, "v", m_bits=m_bits, n_hashes=4, keys=["shard"]
    ).persist()
    n = filters.count()
    assert n == shards, n

    rows_new = bloom_merge(filters).collect()
    rows_old = bloom_merge_old(filters).collect()
    assert rows_new[0]["bloom"] == rows_old[0]["bloom"], "merge shapes diverge"

    out: dict[str, object] = {
        "metric": "bloom_merge_profile",
        "log2_m": log2_m,
        "shards": shards,
        "reps": reps,
    }
    for name, fn in (("old_global_sort", bloom_merge_old),
                     ("new_segmented", bloom_merge)):
        secs = []
        for _ in range(reps):
            t0 = time.time()
            fn(filters).collect()
            secs.append(round(time.time() - t0, 2))
        out[f"{name}_sec"] = sorted(secs)[len(secs) // 2]
        out[f"{name}_reps"] = secs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
