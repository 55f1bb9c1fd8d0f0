"""Guards the committed engine-only sf1 bench artifact
(tools/bench_sf1.py -> BENCH_SF1_r*.json, r8 verdict item 1): the
LATEST artifact must carry per-rep raw arrays for every timed entry
(the r7 drift lesson — a single median hides poisoned-session
outliers), zero failed entries (the subset already excludes the six
declared ENGINE_DISK_BOUNDS entries), and every entry whose
input-scale-normalized sf0.1->sf1 ratio exceeds the flag bar must be
named in PERF-NOTES.md — a super-linear decade either gets a written
root-cause or fails the suite; it cannot sit silently in the JSON."""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def artifact():
    arts = sorted(glob.glob(os.path.join(REPO, "BENCH_SF1_r*.json")))
    if not arts:
        pytest.skip("sf1 engine-only bench artifact not generated yet")
    return json.load(open(arts[-1]))


def test_every_entry_timed_with_rep_arrays(artifact):
    reps = artifact["reps"]
    for sf_key in ("sf0.1", "sf1"):
        block = artifact["timings"][sf_key]
        assert block, f"{sf_key} block empty"
        for name, rec in block.items():
            assert "error" not in rec, (sf_key, name, rec.get("error"))
            assert rec["sec"] > 0, (sf_key, name)
            assert isinstance(rec["reps"], list) and len(rec["reps"]) == reps, (
                sf_key, name, rec["reps"])
            # the recorded median must be consistent with its reps
            # (same rule as bench._median: mean of middle two when even)
            srt = sorted(rec["reps"])
            n = len(srt)
            med = srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) / 2
            assert abs(rec["sec"] - med) < 0.01, (sf_key, name)


def test_ratios_cover_all_entries(artifact):
    assert set(artifact["ratios"]) == set(artifact["timings"]["sf1"])
    for name, r in artifact["ratios"].items():
        assert r["input_scale"] >= 9.0, (name, r)  # x10 or x100 dirs
        assert r["per_row_ratio"] > 0, (name, r)


def test_flagged_entries_are_root_caused_in_perf_notes(artifact):
    flagged = artifact["flagged"]
    bar = artifact["flag_per_row"]
    # the flag list must agree with the recorded ratios (no hand edits)
    recomputed = [n for n, r in sorted(artifact["ratios"].items())
                  if r["per_row_ratio"] > bar]
    assert sorted(flagged) == recomputed
    if flagged:
        notes = open(os.path.join(REPO, "PERF-NOTES.md")).read()
        for name in flagged:
            assert name in notes, (
                f"{name} exceeds the per-row flag bar ({bar}) but has no "
                "PERF-NOTES root-cause entry")
