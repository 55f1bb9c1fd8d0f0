"""Driver-RSS probe for the connected_components union-find fast path.

Usage: python tools/rss_unionfind_probe.py {rows|arrow}

Builds a 2M-edge synthetic pair frame, transfers it to the driver the
old way (collect() → Row objects) or the new way (toPandas → tolist),
runs the identical union-find, and prints peak driver RSS. Run each
mode in its own process so ru_maxrss is attributable.
"""
import resource
import sys

from pyspark.sql import functions as F

from feasibility_etl_spark.session import build_session

N = 2_000_000
mode = sys.argv[1]
spark = build_session()
# 2M distinct edges: chains of length 10 over 2.2M nodes
edges = (
    spark.range(N)
    .select(
        (F.col("id") + (F.col("id") / 10).cast("long")).alias("src"),
        (F.col("id") + (F.col("id") / 10).cast("long") + 1).alias("dst"),
    )
)
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

parent: dict = {}


def find(x):
    parent.setdefault(x, x)
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:
        parent[x], x = root, parent[x]
    return root


if mode == "rows":
    head = edges.collect()
    for r in head:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
else:
    pdf = edges.toPandas()
    for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(
    f"mode={mode} n_edges={N} n_nodes={len(parent)} "
    f"rss_before_kb={base} rss_peak_kb={peak} delta_mb={(peak - base) / 1024:.0f}"
)
spark.stop()
