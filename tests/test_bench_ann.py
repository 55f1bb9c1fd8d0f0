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


def test_sf1_curve_artifact_meets_serving_bar():
    """The LATEST committed sf1 ANN-curve artifact (tools/
    ann_curve_sf1.py, 200k vectors, highest round tag — each round's
    closing battery regenerates one with --reduced --tag rNN, r8
    verdict item 5) must show >=0.6 recall@10 at <=10% scan for the
    scale-path tiers ivf/pq/ivfbq (VERDICT r7 item 4's bar). Guards the
    artifact's honesty: a recall regression in ivf_build/pq_encode
    surfaces in the round that ships it."""
    import glob
    import json

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    arts = sorted(glob.glob(os.path.join(tools_dir, "ann_curve_sf1_r*.json")))
    if not arts:
        import pytest

        pytest.skip("sf1 ANN curve artifact not generated yet")
    path = arts[-1]
    art = json.load(open(path))
    assert art["n_vectors"] >= 100_000
    serving = art["serving_at_10pct"]
    for tier in ("ivf", "pq", "ivfbq"):
        assert tier in serving, f"{tier} has no point within 10% scan"
        p = serving[tier]
        assert p["recall"] >= 0.6, (tier, p)
        assert p["scan_frac"] <= 0.10, (tier, p)
    # every tier's serving point must hold its sf1 floor (re-based from
    # the measured curve, margin under the recorded points)
    for tier, floor in bench.ANN_RECALL_FLOORS_SF1.items():
        assert tier in serving, f"{tier} missing from sf1 serving points"
        assert serving[tier]["recall"] >= floor, (tier, serving[tier], floor)
