"""Dump explain("formatted") for named bench entries to plans/r13/.

Usage: python tools/dump_one_plan_r13.py QUERY[:suffix] [QUERY...]
  suffix defaults to "after"; pass e.g. PIPE-CORPUS:before.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feasibility_etl_spark.driver_queries import ALL_QUERIES  # noqa: E402
from feasibility_etl_spark.flagship import flagship  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session("dump-plans-r13")
    for arg in sys.argv[1:]:
        name, _, suffix = arg.partition(":")
        suffix = suffix or "after"
        fn = flagship if name == "FLAGSHIP" else ALL_QUERIES[name]
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
