"""Interleaved A/B of IVF cell-assignment implementations (VERDICT r11 item 1).

r11 made `assign_cells` (exact per-cell dist2 via interpreted HOF
aggregate + array_min) the canonical assignment in ivf_topk/ivf_build,
replacing MLlib model.transform; BENCH_r11 recorded sim-ivf 2.24 -> 3.88 s.
This script times the full q_sim_ivf serve path with three assignment
backends, interleaved (A,B,C,A,B,C,...) over >=5 reps, both orders,
at the bench SF (default /root/testdata/sf0.1).

Backends:
  hof    - current assign_cells: 16 struct(zip_with+aggregate) + array_min
  mllib  - KMeans model.transform (JVM norm-shortcut distance)
  numpy  - mapInPandas: (n x 64) @ (64 x 16) matmul argmin (Arrow-batched)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import DataFrame, functions as F

from feasibility_etl_spark.session import build_session
from feasibility_etl_spark.operators.similarity import (
    _ivf_probe_score,
    assign_cells,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def assign_numpy(df: DataFrame, cents, id_col="vec_id", vec_col="embedding"):
    import pandas as pd

    cent_mat = np.array([c for _, c in cents], dtype=np.float64)  # (16, 64)
    cells = np.array([cell for cell, _ in cents], dtype=np.int64)
    cent_sq = (cent_mat * cent_mat).sum(axis=1)  # (16,)

    schema = f"{id_col} long, {vec_col} array<float>, _cell int"

    def assign(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (n, 64)
            # dist2 = |x|^2 - 2 x.c + |c|^2 ; |x|^2 constant per row -> skip
            scores = cent_sq[None, :] - 2.0 * (vecs @ cent_mat.T)  # (n, 16)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "_cell": cells[np.argmin(scores, axis=1)],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def run_once(spark, backend: str) -> float:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.monotonic()
    train = emb.sample(0.5, 42)
    featurized = train.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=16, seed=42, maxIter=8, featuresCol="features").fit(featurized)
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]

    if backend == "hof":
        assigned = assign_cells(emb, cents)
    elif backend == "numpy":
        assigned = assign_numpy(emb, cents)
    elif backend == "mllib":
        assigned = (
            model.transform(
                emb.select(
                    "vec_id",
                    "embedding",
                    array_to_vector(F.col("embedding").cast("array<double>")).alias(
                        "features"
                    ),
                )
            )
            .select("vec_id", "embedding", F.col("prediction").alias("_cell"))
        )
    else:
        raise ValueError(backend)

    centroids = spark.createDataFrame(cents, "_cell int, _centroid array<double>")
    out = _ivf_probe_score(
        assigned, centroids, queries, 10, 6,
        "vec_id", "embedding", "query_id", "query_vec",
    )
    n = out.count()
    dt = time.monotonic() - t0
    assert n == 50, n
    return dt


def main():
    spark = build_session()
    backends = ["hof", "mllib", "numpy"]
    reps = int(os.environ.get("AB_REPS", "5"))
    # warm-up once per backend (JIT/codegen/Arrow init off the record)
    for b in backends:
        run_once(spark, b)
    results: dict[str, list[float]] = {b: [] for b in backends}
    for r in range(reps):
        order = backends if r % 2 == 0 else backends[::-1]
        for b in order:
            results[b].append(run_once(spark, b))
    summary = {
        b: {
            "reps": [round(x, 3) for x in v],
            "median": round(sorted(v)[len(v) // 2], 3),
            "min": round(min(v), 3),
        }
        for b, v in results.items()
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
