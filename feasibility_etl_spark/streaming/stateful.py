"""Custom stateful streaming operators (applyInPandasWithState).

Where built-in windows don't fit — running per-key totals that never reset,
custom eviction rules — the engine drops to Spark's arbitrary-state API:
state lives per key in the state store, arrives/leaves as Arrow batches, and
watermark-driven timeouts bound it. This is the engine's only stateful
Python tier, mirroring the Pandas-UDF-only policy of the batch side.

Scale shape: state is partitioned by key across executors; each micro-batch
touches only keys present in the batch (plus timed-out keys). The state
schema is a tiny fixed struct, so state-store size is O(distinct keys).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_RUNNING_TOTALS_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_totals(
    df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Never-resetting per-key running (count, sum) over a stream.

    Unlike a windowed aggregation, totals accumulate for the key's lifetime
    — the state is the pair (n, total), updated per micro-batch and emitted
    in update mode. Batch frames can't host this operator (state needs a
    stream); use a plain groupBy there.
    """

    def update(
        key: tuple, batches: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=_RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
