"""ANN recall-vs-scan curve at the sf1-equivalent dir (VERDICT r7 item 4).

The bench-SF curve (run_ann_curve, 2k vectors) measures tiers where the
index machinery barely matters — LSH's 0.60 recall there costs 36% of a
full scan. This tool measures the SERVING question at the 200k-vector
sf1 dir: which configs reach >=0.6 recall@10 under a <=10% scan budget?
Geometry scales with the corpus (the operators' documented contract):
IVF/IVFBQ cells sized to ~1k vectors each, LSH deepened to 12 planes.

Writes tools/ann_curve_sf1_r08.json: per tier, a list of
{cfg, recall, scan_frac, search_sec} points plus the chosen serving
point. tests/test_bench_ann.py asserts the committed artifact meets the
>=0.6 @ <=10% bar for ivf/pq/ivfbq.

Run: python tools/ann_curve_sf1.py [sf_dir] (default /root/repo/.scale/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from math import comb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feasibility_etl_spark.operators.similarity import (  # noqa: E402
    bq_rerank_topk,
    cosine_topk,
    cosine_topk_lsh,
    ivf_build,
    ivf_search,
    ivfbq_topk,
    ivfpq_topk,
    pq_topk,
)
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402

K = 10


def result_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "vec_id").collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = build_session("ann-curve-sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = load(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    cells = max(16, n // 1000)  # the operators' ~1k-vectors-per-cell contract
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qids = [0, 1, 2, 3, 4]

    t0 = time.time()
    truth = result_sets(cosine_topk(emb, queries, k=K))
    brute_sec = round(time.time() - t0, 2)
    print(json.dumps({"op": "truth", "n": n, "sec": brute_sec}), flush=True)

    def recall(df) -> tuple[float, float]:
        t = time.time()
        s = result_sets(df)
        sec = time.time() - t
        per = [len(s.get(q, set()) & truth[q]) / len(truth[q]) for q in qids]
        return round(sum(per) / len(per), 3), round(sec, 2)

    curve: dict[str, list[dict]] = {}

    def point(tier: str, cfg: str, df, scan_frac: float) -> None:
        r, sec = recall(df)
        p = {"cfg": cfg, "recall": r, "scan_frac": round(scan_frac, 4),
             "search_sec": sec}
        curve.setdefault(tier, []).append(p)
        print(json.dumps({"tier": tier, **p}), flush=True)

    # LSH: 12 planes (the big-corpus contract), multiprobe radius sweep
    for mp in (2, 3, 4):
        probes = sum(comb(12, i) for i in range(mp + 1))
        point(
            "lsh", f"planes=12,multiprobe={mp}",
            cosine_topk_lsh(emb, queries, k=K, dim=64, n_planes=12,
                            multiprobe=mp),
            probes / 4096,
        )

    # IVF: train ONCE (ivf_build), sweep nprobe on the persisted index
    idx = "/tmp/ann_curve_sf1_ivf"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    ivf_build(emb, idx, n_cells=cells, train_fraction=0.25, max_iter=8)
    print(json.dumps({"op": "ivf_build", "n_cells": cells,
                      "sec": round(time.time() - t0, 2)}), flush=True)
    for npb in (10, 20, 30):
        point(
            "ivf", f"n_cells={cells},nprobe={npb}",
            ivf_search(spark, idx, queries, k=K, nprobe=npb),
            npb / cells,
        )

    # PQ: 8 subspaces x 16 codes ADC scan + exact re-rank sweep
    for ref in (50, 100, 200):
        point(
            "pq", f"M=8,K=16,refine={ref}",
            pq_topk(emb, queries, k=K, n_subspaces=8, n_codes=16,
                    train_fraction=0.1, max_iter=4, refine=ref),
            8 / 512 + ref * K / n,
        )

    # IVFPQ: cells prune rows, codes prune bytes, re-rank recovers order
    for npb, ref in ((10, 50), (20, 100), (30, 200)):
        point(
            "ivfpq", f"n_cells={cells},nprobe={npb},refine={ref}",
            ivfpq_topk(emb, queries, k=K, n_cells=cells, nprobe=npb,
                       n_subspaces=8, n_codes=16, train_fraction=0.1,
                       max_iter=4, refine=ref),
            (npb / cells) * (8 / 512) + ref * K / n,
        )

    # BQ re-rank: Hamming shortlist over packed longs + exact re-rank
    for ref in (100, 200, 400):
        point(
            "bq", f"refine={ref}",
            bq_rerank_topk(emb, queries, k=K, refine=ref),
            16 / 512 + ref * K / n,
        )

    # IVFBQ: fused cells + Hamming shortlist + re-rank
    for npb, sl in ((10, 400), (20, 800), (30, 1600)):
        point(
            "ivfbq", f"n_cells={cells},nprobe={npb},shortlist={sl}",
            ivfbq_topk(emb, queries, k=K, n_cells=cells, nprobe=npb,
                       shortlist=sl, train_fraction=0.25, max_iter=8),
            (npb / cells) * (16 / 512) + sl / n,
        )

    # serving point per tier: best recall among points within 10% scan
    serving = {}
    for tier, pts in curve.items():
        ok = [p for p in pts if p["scan_frac"] <= 0.10]
        if ok:
            serving[tier] = max(ok, key=lambda p: p["recall"])
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "k": K,
        "brute_force_sec": brute_sec,
        "curve": curve,
        "serving_at_10pct": serving,
    }
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ann_curve_sf1_r08.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"op": "summary", "serving_at_10pct": serving}),
          flush=True)
    emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
