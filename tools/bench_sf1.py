"""Engine-only wall-clock at the sf1 scale dir — the committed record
the r8 verdict named as the last gap in the scale story (item 1): every
BENCH_r0x timing is sf0.1; sf1 had correctness sweeps (per-entry seconds
UNDER ORACLE LOAD) but no clean engine-only bench.

Runs the scale-representative subset (the pipelines, dedup family,
decontam, classifier, ANN serving, tokenizer/text battery, plus the
×10 relational/events entries) at BOTH sf0.1 and the sf1 dir in one
session — same code, same host, same instrument — with bench.py's
isolation + median-of-reps + per-rep raw arrays, then reports each
entry's sf0.1→sf1 ratio NORMALIZED by its primary input's actual row
scale (documents/embeddings grow ×100 between these dirs, lineitem/
orders/events ×10 — a flat "12× is super-linear" bar would misread
every document entry). ``per_row_ratio = time_ratio / input_scale``;
entries above FLAG_PER_ROW are flagged for PERF-NOTES.

Excluded: the six ENGINE_DISK_BOUNDS entries (exact-Jaccard t≤0.6
family — their verify shuffle exceeds one-node disk past ~60k docs of
this corpus shape; declared, measured, PERF-NOTES 29).

Usage: python tools/bench_sf1.py [--out FILE] [--sf1 DIR] [--sf01 DIR]
       [ONLY ...]
Writes the artifact JSON and prints a one-line summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from feasibility_etl_spark.session import build_session  # noqa: E402

#: entry -> primary input table (sets the expected row-scale denominator)
SUBSET: dict[str, str] = {
    # pipelines (events-grain; the doc pipelines are disk-bound-declared)
    "PIPE-EVENTS": "events",
    # dedup family (minus the six ENGINE_DISK_BOUNDS entries)
    "DEDUP-EXACT": "documents",
    "DEDUP-MINHASH": "documents",
    "DEDUP-SUBSTRING": "documents",
    "DEDUP-FUZZY": "documents",
    "DEDUP-INCR": "documents",
    "LINE-DEDUP": "documents",
    # decontam + corpus management
    "CORPUS-DECONTAM": "documents",
    "CORPUS-DECONTAM-BLOOM": "documents",
    "CORPUS-CONTAMSCORE": "documents",
    "CORPUS-NOVELTY": "documents",
    "CORPUS-DSIR": "documents",
    "CORPUS-PACK": "documents",
    "CORPUS-SAMPLEK": "documents",
    "QUALITY-KLLGATE": "documents",
    # classifier family
    "CLS-SCORE": "documents",
    "CLS-ROUTE": "documents",
    "CLS-GATE": "documents",
    "LM-SCORE": "documents",
    # ANN serving
    "SIM-TOPK": "embeddings",
    "SIM-BQ": "embeddings",
    "SIM-IVF": "embeddings",
    # tokenizer + text battery (BPE represents the trio)
    "BPE-ENCODE": "documents",
    "TEXT-WINNOW": "documents",
    "TEXT-QUALITY": "documents",
    "TEXT-GOPHER": "documents",
    "TEXT-LANGID": "documents",
    "TEXT-TFIDF": "documents",
    "TEXT-BM25": "documents",
    "SEARCH-RRF": "documents",
    # sketches over events
    "SKETCH-HLL": "events",
    "SKETCH-FREQ": "events",
    # relational / events ×10 grain
    "FLAGSHIP": "lineitem",
    "J-SALTED": "orders",
    "J-ASOF": "events",
    "A-WORKLOG": "lineitem",
    "WIN-SESSION": "events",
    "SCD2-APPLY": "events",
}

#: time_ratio / input_scale above this flags the entry (20% super-linear
#: allowance over proportional — the verdict's "~12× at one decade")
FLAG_PER_ROW = 1.2


def _table_rows(spark, sf_dir: str, table: str) -> int:
    from feasibility_etl_spark.sources.catalog import load

    return load(spark, sf_dir, table).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/BENCH_SF1_r09.json")
    ap.add_argument("--sf1", default="/root/repo/.scale/sf1")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("only", nargs="*")
    args = ap.parse_args()

    names = [n for n in SUBSET if not args.only or n in args.only]

    spark = build_session("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    # same small-SF warm-up as bench.main: one-time reader/broadcast/
    # window/noop bring-up must not land in the first timed entry
    from bench import flagship

    try:
        flagship(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # noqa: BLE001
        print(f"warm-up skipped: {e}", file=sys.stderr)

    scales = {
        t: _table_rows(spark, args.sf1, t) / _table_rows(spark, args.sf01, t)
        for t in sorted(set(SUBSET.values()))
    }

    result: dict[str, dict] = {}
    t_wall0 = time.time()
    for sf_key, sf_dir in (("sf0.1", args.sf01), ("sf1", args.sf1)):
        block: dict[str, dict] = {}
        for name in names:
            bench.isolate_entry(spark)
            rec: dict[str, object] = {"sec": -1.0, "reps": None}
            t0 = time.time()
            try:
                med, reps = bench.run_query_med(spark, name, sf_dir)
                rec = {"sec": round(med, 3), "reps": reps}
            except Exception as e:  # noqa: BLE001
                rec["error"] = f"{type(e).__name__}: {e}"[:300]
                print(f"[fail] {sf_key} {name}: {rec['error']}",
                      file=sys.stderr, flush=True)
            block[name] = rec
            print(
                f"[{sf_key}] {name}: {rec['sec']}s "
                f"(entry wall {time.time()-t0:.1f}s)",
                flush=True,
            )
        result[sf_key] = block

    ratios: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        a = result["sf0.1"][name]["sec"]
        b = result["sf1"][name]["sec"]
        if a and b and a > 0 and b > 0:
            scale = scales[SUBSET[name]]
            r = b / a
            pr = r / scale
            ratios[name] = {
                "table": SUBSET[name],
                "input_scale": round(scale, 1),
                "time_ratio": round(r, 2),
                "per_row_ratio": round(pr, 3),
            }
            if pr > FLAG_PER_ROW:
                flagged.append(name)
    artifact = {
        "metric": "bench_sf1",
        "reps": bench.BENCH_REPS,
        "sf01_dir": args.sf01,
        "sf1_dir": args.sf1,
        "input_scales": {t: round(s, 1) for t, s in scales.items()},
        "flag_per_row": FLAG_PER_ROW,
        "flagged": flagged,
        "timings": result,
        "ratios": ratios,
        "total_wall_sec": round(time.time() - t_wall0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    tot1 = sum(
        v["sec"] for v in result["sf1"].values() if v["sec"] and v["sec"] > 0
    )
    print(json.dumps({
        "metric": "bench_sf1_summary",
        "entries": len(names),
        "sf1_total_sec": round(tot1, 1),
        "flagged": flagged,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
