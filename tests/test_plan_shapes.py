"""Plan-shape regression pins for the headline queries.

A query whose RESULTS stay correct can still quietly regress its PLAN —
an extra Exchange from a lost broadcast hint, a Python stage from an
accidental UDF, a scan that stops pruning. These tests pin upper bounds
on Exchange counts (and forbid row-at-a-time Python anywhere) so plan
regressions fail CI instead of surfacing as a 100 TB incident.

Bounds are UPPER bounds, not exact pins: AQE and stats-based broadcast
decisions may legitimately remove exchanges, never add them. Counted on
the pre-execution physical plan at sf0.001 (plan shapes here don't
depend on scale factor; broadcast-threshold decisions are identical for
all local SFs).
"""

from __future__ import annotations

import re

import pytest

from feasibility_etl_spark.driver_queries import ALL_QUERIES
from feasibility_etl_spark.flagship import flagship

SF = "/root/testdata/sf0.001"

#: name -> max allowed Exchange nodes in the physical plan
MAX_EXCHANGES = {
    "FLAGSHIP": 2,        # one agg + one join shuffle; dims broadcast
    "VIEW-IDIOMATIC": 0,  # 1 fact scan, all dims broadcast
    "J-ATTACH": 1,
    "J-ASOF": 2,          # union + carry-forward window, no interval explosion
    "J-RANGE": 1,         # bucketed equi-join, no nested loop
    "A-WORKLOG": 1,
    "DEDUP-EXACT": 1,     # fingerprint groupBy only
    "DEDUP-MINHASH": 3,   # sig agg + banded self-join + verify
    "TEXT-QUALITY": 0,    # pure projections
    "TEXT-CHUNK": 0,
    "TEXT-BM25": 1,       # single-row stats agg; scoring is a broadcast
    "SKETCH-HLL": 2,      # build agg + merge agg
    "SKETCH-THETA": 2,    # per-key sketch agg + sketch-side pairing
    "DEDUP-FUZZY": 1,     # bucketed (token, band) equi-join, no cartesian
}

#: operator-level zero-shuffle guarantees (no bench-input repartition)
ZERO_SHUFFLE_OPS = ["TEXT-QUALITY", "TEXT-CHUNK"]


def _plan(spark, name: str) -> str:
    fn = flagship if name == "FLAGSHIP" else ALL_QUERIES[name]
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(MAX_EXCHANGES))
def test_exchange_budget(spark, name):
    plan = _plan(spark, name)
    n = len(re.findall(r"\bExchange\b", plan))
    assert n <= MAX_EXCHANGES[name], f"{name}: {n} exchanges > {MAX_EXCHANGES[name]}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_repetition_operator_is_zero_shuffle(spark):
    # the OPERATOR itself (not the bench entry, which spreads a one-row-
    # group input first) must plan with no Exchange at all
    from feasibility_etl_spark.operators.text import repetition_signals
    from feasibility_etl_spark.sources.catalog import load

    df = repetition_signals(load(spark, SF, "documents"), top_ns=(2,), dup_ns=(2,))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
