"""Isolated rerun of one bench.py run_*_bench entry, reps on one warm session.

Usage: python tools/iso_stream_r12.py <name> [reps]   # name: denorm_sink,
dedup_gate_10x, sessionize, ... (anything with a run_<name>_bench in bench.py).
Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
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
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = getattr(bench, f"run_{name}_bench")
    spark = build_session("iso-" + name)
    # same warm-ups as bench.py main(): JVM + Python worker pool + Arrow
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    vals = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"iso {name} rep{i}")
        t0 = time.time()
        elapsed, n_rows = fn(spark, sf_dir)
        vals.append(round(elapsed, 3))
        print(
            json.dumps(
                {"entry": name, "rep": i, "sec": round(elapsed, 3),
                 "wall": round(time.time() - t0, 3), "rows": n_rows}
            ),
            flush=True,
        )
    print(json.dumps({"entry": name, "reps": vals}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
