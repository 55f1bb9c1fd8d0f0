"""Bench-side ANN recall tracking (bench.run_ann_recall): all six tiers
report a recall@10 in [0,1] against the brute-force truth, and the
floor table covers exactly those tiers. The sf0.1 floor VALUES are
pinned inside bench.py (deterministic corpus + seeds); this test keeps
the harness itself honest at a small SF."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

TIERS = {"lsh", "ivf", "pq", "ivfpq", "bq", "ivfbq"}


def test_floor_table_covers_all_tiers():
    assert set(bench.ANN_RECALL_FLOORS) == TIERS
    assert all(0.0 < v < 1.0 for v in bench.ANN_RECALL_FLOORS.values())


def test_run_ann_recall_reports_every_tier(spark):
    recalls = bench.run_ann_recall(spark, "/root/testdata/sf0.01")
    assert set(recalls) == TIERS
    assert all(0.0 <= v <= 1.0 for v in recalls.values())
    # brute force always contains itself-adjacent truth; at least one
    # approximate tier must overlap it on this corpus (all-zeros across
    # every tier would mean the harness is comparing the wrong columns)
    assert any(v > 0 for v in recalls.values())
