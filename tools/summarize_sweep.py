"""Summarize a granular sweep jsonl: status counts, failures, slowest
entries, and a markdown table suitable for SURVEY/COVERAGE appendices.

Usage: python tools/summarize_sweep.py tools/sweep_sf1_r06_full.jsonl
"""

from __future__ import annotations

import json
import sys
from collections import Counter


def main(path: str) -> int:
    recs: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            recs[r["name"]] = r  # last record wins

    by_status: dict[str, list[str]] = {}
    for name, r in sorted(recs.items()):
        by_status.setdefault(r["status"], []).append(name)

    print(f"{len(recs)} entries: {dict(Counter(r['status'] for r in recs.values()))}")
    for st in ("fail", "oom_skip", "oracle_oom", "rows_only"):
        if st in by_status:
            print(f"\n[{st}] ({len(by_status[st])})")
            for n in by_status[st]:
                print(f"  {n}: {recs[n]['detail'][:150]}")
    timed = sorted(
        ((r.get("secs") or 0, n) for n, r in recs.items()), reverse=True
    )[:15]
    print("\nslowest:")
    for s, n in timed:
        print(f"  {n}: {s:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
