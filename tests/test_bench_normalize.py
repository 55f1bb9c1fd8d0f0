"""Host-anchor normalization guard (VERDICT r9 item 3): BENCH records
must carry anchor-normalized values computed as raw × nominal/anchor,
with error sentinels passed through and a missing anchor yielding an
explicit empty result rather than silently-unnormalized numbers."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_nominal_is_pinned_to_the_r09_recording():
    # the nominal is a cross-round constant, not a per-run measurement —
    # moving it re-bases every historical normalized value and must be a
    # deliberate, called-out act (the COVERAGE.md bar-change rule)
    assert bench.ANCHOR_NOMINAL_SEC == 1.035


def test_normalization_math():
    raw = {"q1": 10.0, "q2": 2.07}
    # anchor exactly 2× nominal → host ran 2× slow → normalized halves
    out = bench.normalize_by_anchor(raw, host_anchor=2.07)
    assert out == {"q1": 5.0, "q2": 1.035}
    # anchor at nominal → identity (up to rounding)
    same = bench.normalize_by_anchor(raw, host_anchor=bench.ANCHOR_NOMINAL_SEC)
    assert same == {"q1": 10.0, "q2": 2.07}


def test_error_sentinels_pass_through_unscaled():
    out = bench.normalize_by_anchor({"ok": 4.14, "failed": -1.0}, 2.07)
    assert out["failed"] == -1.0
    assert out["ok"] == 2.07


def test_missing_anchor_yields_empty_not_raw():
    assert bench.normalize_by_anchor({"q": 1.0}, 0.0) == {}
    assert bench.normalize_by_anchor({"q": 1.0}, None) == {}


def test_io_anchor_nominal_is_pinned_to_the_r11_recording():
    # same cross-round-constant rule as the CPU anchor: pinned to the
    # median measured the round the IO probe was introduced (r11)
    assert bench.IO_ANCHOR_NOMINAL_SEC == 1.044


def test_io_anchor_normalization_uses_io_nominal():
    raw = {"q1": 10.0}
    out = bench.normalize_by_anchor(
        raw, bench.IO_ANCHOR_NOMINAL_SEC * 2, nominal=bench.IO_ANCHOR_NOMINAL_SEC
    )
    assert out == {"q1": 5.0}


def test_io_anchor_probe_runs_and_times(spark, tmp_path):
    # functional guard: the probe's setup + timed rep work end-to-end on a
    # tiny row count (the real size is for signal, not correctness)
    src = bench.io_anchor_setup(spark, str(tmp_path), rows=10_000)
    out = str(tmp_path / "out")
    t1 = bench.io_anchor_once(spark, src, out)
    t2 = bench.io_anchor_once(spark, src, out)  # out-dir overwrite replays
    assert t1 > 0 and t2 > 0
    # the probe's source is deterministic: same bytes every round
    import os

    assert os.path.isdir(src)
