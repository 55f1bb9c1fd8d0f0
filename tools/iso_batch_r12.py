"""Isolated bench-methodology timing for named batch entries: same
warm-ups, isolation, and construction+noop window as bench.py's
run_query_med. Usage: python tools/iso_batch_r12.py QUERY [QUERY...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("iso-batch")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in args:
        vals = []
        for i in range(reps):
            bench.isolate_entry(spark)
            spark.sparkContext.setJobDescription(f"iso {name} rep{i}")
            t0 = time.time()
            vals.append(round(bench.run_query(spark, name, sf_dir), 3))
        bench.isolate_entry(spark)
        print(json.dumps({"entry": name, "reps": vals,
                          "median": sorted(vals)[len(vals) // 2]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
