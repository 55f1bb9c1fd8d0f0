"""Custom stateful operator: state accumulates across micro-batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from feasibility_etl_spark.streaming.stateful import running_totals


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        import json

        (src_dir / name).write_text("\n".join(json.dumps(r) for r in rows))

    write_batch("b1.json", [{"key": "a", "value": 1.0}, {"key": "a", "value": 2.0},
                            {"key": "b", "value": 10.0}])

    stream = spark.readStream.schema("key string, value double").json(str(src_dir))
    out = running_totals(stream, "key", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.key: (r.n_events, r.total) for r in spark.table("running_totals").collect()}
        assert first == {"a": (2, 3.0), "b": (1, 10.0)}

        # second micro-batch: state must carry over, not reset
        write_batch("b2.json", [{"key": "a", "value": 4.0}, {"key": "c", "value": 7.0}])
        q.processAllAvailable()
        rows = spark.table("running_totals").collect()
        latest: dict[str, tuple] = {}
        for r in rows:  # memory sink appends updates; last write wins
            latest[r.key] = (r.n_events, r.total)
        assert latest["a"] == (3, 7.0)
        assert latest["b"] == (1, 10.0)
        assert latest["c"] == (1, 7.0)
    finally:
        q.stop()
