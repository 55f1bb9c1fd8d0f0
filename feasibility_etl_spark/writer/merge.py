"""SCD1 upsert — MERGE INTO semantics as a set-oriented batch operator.

The reference's write path is overwrite-shaped (etl.js:311-370 re-derives
the whole star per run); real warehouses also need the incremental form:
apply a change batch (upserts + deletes) to the current table version,
latest change wins, no history kept (history is the SCD2 tier,
writer/scd2.py). On table formats with native MERGE (Delta/Iceberg) this
maps 1:1 to ``MERGE INTO``; on plain parquet the result is the next table
version the caller writes — same rewrite posture as write_denormalized.

Scale shape: the change batch collapses to one row per key with a window
partitioned by key (change-batch-sized shuffle, not table-sized); the
untouched-rows anti-joins broadcast when the change batch is small — the
common case — so the full table is ONE map-side pass. Nothing collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    order_cols: Sequence[str] | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Next table version after applying ``changes`` to ``current``.

    - multiple changes per key collapse to the latest (``order_cols``
      descending; pass columns that make the order total, e.g.
      ``["ts", "event_id"]``) — earlier changes for the key are ignored,
      including earlier deletes overridden by a later upsert;
    - a change whose ``delete_col`` is true removes the key;
    - remaining changes overwrite matched keys / insert unmatched ones;
    - current rows with no change survive untouched.

    ``changes`` must carry ``current``'s columns (plus ``delete_col`` and
    any extra ``order_cols``, both stripped from the output).
    """
    ch = changes
    if order_cols:
        w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
        ch = ch.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    if delete_col:
        deletes = ch.where(F.col(delete_col)).select(key)
        ch = ch.where(~F.col(delete_col))
    else:
        deletes = None
    keep = current.join(ch.select(key), key, "left_anti")
    if deletes is not None:
        keep = keep.join(deletes, key, "left_anti")
    return keep.unionByName(ch.select(current.columns))
