"""Driver-contract smoke: entry() yields rows; queries()/oracle_sql() align."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3


def test_every_oracle_has_a_query():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    # rows-only exceptions are the documented hash-free ops
    assert set(q) - set(o) == {
        "DEDUP-CANDIDATES",
        "SIM-ANN",
        "EMB-NEARDUP",
    }
    # the driver records a bounded registry prefix (50 rows in round 1):
    # every operator must fit
    assert len(q) <= 50, f"registry has {len(q)} entries; driver cap is 50"


def test_operator_ids_cover_survey_families():
    keys = set(entrymod.queries())
    for prefix in ("S-", "P-", "J-", "A-", "F-", "E-"):
        assert any(k.startswith(prefix) for k in keys), f"missing family {prefix}"
