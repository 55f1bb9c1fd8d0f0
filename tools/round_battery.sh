#!/usr/bin/env bash
# Round-closing battery (r8 verdict item 5 made durable): run AFTER the
# round's last code change, sequentially (each step is timing- or
# cache-sensitive; never overlap Spark sessions on this host).
#
#   bash tools/round_battery.sh r09
#
# Steps:
#  1. full pytest          — correctness + the artifact-honesty guards
#  2. reduced sf1 ANN curve — regenerates ann_curve_sf1_<round>.json so
#     tests/test_bench_ann.py grades THIS round's recall, not a stale
#     artifact (a recall regression in ivf_build/pq_encode must surface
#     in the round that ships it)
#  3. reference bench       — BENCH_DETAIL.json with per-rep arrays
#
# The sf1 engine-only bench (tools/bench_sf1.py, ~1 h) and the x100
# scale probe are NOT in the default battery — run them when a round
# touches an operator's dataflow (see COVERAGE.md round sections for
# which rounds re-ran them and why).
set -euo pipefail
ROUND="${1:?usage: round_battery.sh rNN}"
cd "$(dirname "$0")/.."

echo "== [1/3] pytest =="
python -m pytest tests/ -x -q

echo "== [2/3] sf1 ANN curve (reduced, tag ${ROUND}) =="
python tools/ann_curve_sf1.py --reduced --tag "${ROUND}"

echo "== [3/3] bench (sf0.1 reference record) =="
python bench.py

echo "== battery ${ROUND} complete =="
