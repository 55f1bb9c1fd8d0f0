"""Interleaved A/B: r12 contracted-components (repartition(1) merge of
the NODE forest) vs r13 root-graph merge (groupBy node → root edges →
root-grain union-find → distributed label join), on the DEDUP-PRUNE
shape at the bench SF. Parity asserted on labels first.

Run: python tools/ab_cc_rootgraph_r13.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F, types as T  # noqa: E402

from feasibility_etl_spark.operators.dedup import (  # noqa: E402
    _union_find_batches,
    blocked_jaccard_pairs,
    connected_components,
    prune_components,
)
from feasibility_etl_spark.session import build_session  # noqa: E402
from feasibility_etl_spark.sources.catalog import load  # noqa: E402


def r12_contracted(pairs: DataFrame, id_a="id_a", id_b="id_b") -> DataFrame:
    dt = pairs.schema[id_a].dataType
    forest_schema = T.StructType([T.StructField("src", dt), T.StructField("dst", dt)])
    out_schema = T.StructType(
        [T.StructField("doc_id", dt), T.StructField("component_id", dt)]
    )
    forest = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).mapInPandas(_union_find_batches("src", "dst"), forest_schema)
    return forest.repartition(1).mapInPandas(
        _union_find_batches("doc_id", "component_id"), out_schema
    )


def prune_with(docs, pairs, comps):
    # replicate prune_by_components' anti-join shape for the r12 arm
    from feasibility_etl_spark.operators.dedup import prune_by_components

    return prune_by_components(docs, comps)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session("ab-cc-rootgraph")
    import bench

    docs = load(spark, sf_dir, "documents")

    def pairs():
        return blocked_jaccard_pairs(
            docs, ["lang", "source"], threshold=0.2, broadcast_routing=True
        )

    # parity on labels at the bench SF
    old_l = sorted(
        (r.doc_id, r.component_id) for r in r12_contracted(pairs()).collect()
    )
    new_l = sorted(
        (r.doc_id, r.component_id) for r in connected_components(pairs()).collect()
    )
    assert old_l == new_l, f"label parity FAIL {len(old_l)} vs {len(new_l)}"
    print(f"label parity OK: {len(old_l)} nodes", flush=True)

    def run(arm: str) -> float:
        bench.isolate_entry(spark)
        t0 = time.time()
        p = pairs()
        if arm == "r12":
            comps = r12_contracted(p)
            out = prune_with(docs, p, comps)
        else:
            out = prune_components(docs, p)
        out.select("doc_id", "lang", "source").write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    run("r12"), run("r13")
    times = {"r12": [], "r13": []}
    for i in range(reps):
        order = ["r12", "r13"] if i % 2 == 0 else ["r13", "r12"]
        for arm in order:
            times[arm].append(run(arm))
        print({a: round(times[a][-1], 2) for a in order}, flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for arm in ("r12", "r13"):
        print(f"{arm}: median {med(times[arm]):.2f}s  all {[round(x, 2) for x in times[arm]]}")


if __name__ == "__main__":
    main()
