"""Driver-contract final-line guard (r12): the ONE JSON line must carry
``queries`` inline whenever it fits the driver's 2000-char tail window,
degrading (2 → 1 decimals → queries_file pointer) instead of the r10–r11
blanket drop, and must NEVER exceed the window."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _real_headline_and_batch():
    """Reconstruct the headline/batch dicts from the committed r12 record
    so the test pins TODAY's real line shape, not a toy."""
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    batch = {
        k: round(v, 2)
        for k, v in detail["queries"].items()
        if not k.startswith(("stream-", "rest-"))
    }
    headline = {
        "metric": "headline_suite_seconds",
        "value": detail["value"],
        "unit": "sec",
        "reps": detail["reps"],
        "sf": 0.1,
        "host_anchor_sec": detail["host_anchor_sec"],
        "anchor_nominal_sec": detail["anchor_nominal_sec"],
        "value_normalized": detail["value_normalized"],
        "io_anchor_sec": detail.get("io_anchor_sec", 1.0),
        "io_anchor_nominal_sec": detail.get("io_anchor_nominal_sec", 1.0),
        "value_normalized_io": detail.get("value_normalized_io", 0.0),
        # rates/recalls ride flat on the real line; carry them over too
        **{k: v for k, v in detail.items() if "rows_per_sec" in k},
        **{k: v for k, v in detail.items() if k.startswith("ann_recall")},
    }
    return headline, batch


def test_current_suite_keeps_queries_inline():
    headline, batch = _real_headline_and_batch()
    line = bench.render_headline_line(headline, batch)
    assert len(line) < bench.DRIVER_TAIL_BUDGET
    parsed = json.loads(line)
    assert "queries" in parsed and "queries_file" not in parsed
    # every non-streaming bench entry is present (contract: entries may be
    # added, never removed) and 2-decimal precision survived the cascade
    assert set(parsed["queries"]) == set(batch)
    # precision may degrade to 1 decimal as future rounds add entries —
    # inline presence is the contract, exactness is best-effort
    assert abs(parsed["queries"]["sim-ivf"] - batch["sim-ivf"]) < 0.051
    assert parsed["metric"] == "headline_suite_seconds"
    assert parsed["unit"] == "sec"


def test_cascade_degrades_instead_of_overflowing():
    # size-controlled synthetic dicts so the band edges are exact and
    # independent of the committed record: stub headline ~19 chars, each
    # "q-NNN":1.23 entry is 14 chars at 2 decimals / 13 at 1 decimal
    headline = {"metric": "x"}

    def rendered_len(n: int, decimals: int) -> int:
        h = dict(headline)
        h["queries"] = {f"q-{i:03d}": round(1.23456, decimals) for i in range(n)}
        return len(json.dumps(h, separators=(",", ":")))

    # smallest n where the 2-decimal rendering no longer fits...
    n = next(
        n for n in range(1, 1000) if rendered_len(n, 2) >= bench.DRIVER_TAIL_BUDGET
    )
    # ...while the 1-decimal rendering still does
    assert rendered_len(n, 1) < bench.DRIVER_TAIL_BUDGET
    wide = {f"q-{i:03d}": 1.23456 for i in range(n)}
    line = bench.render_headline_line(headline, wide)
    parsed = json.loads(line)
    assert len(line) < bench.DRIVER_TAIL_BUDGET
    assert "queries" in parsed and parsed["queries"]["q-000"] == 1.2
    # absurdly wide: fall back to the pointer, still under budget
    huge = {f"q-{i:04d}": 1.2 for i in range(400)}
    line = bench.render_headline_line(headline, huge)
    parsed = json.loads(line)
    assert len(line) < bench.DRIVER_TAIL_BUDGET
    assert parsed.get("queries_file") == "BENCH_DETAIL.json"
    assert "queries" not in parsed


def test_budget_sits_inside_the_measured_tail_window():
    # the driver's recorded tail fields measure exactly 2000 chars; the
    # final line + newline must fit entirely inside that window
    assert bench.DRIVER_TAIL_BUDGET + 1 <= 2000
