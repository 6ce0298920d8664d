"""Sessionization: batch form vs hand-computed expectations, and the
stateful streaming form (applyInPandasWithState) closing sessions on
event-time timeout."""

from datetime import datetime

from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.streaming.queues import stream_queue
from cloud_optimized_data_pipelines_spark.streaming.sessionize import (
    sessionize,
    sessionize_batch,
)

SCHEMA = "event_id long, user_id long, value double, ts timestamp_ntz"


def ev(eid, uid, val, ts):
    return (eid, uid, val, datetime.fromisoformat(ts))


def test_sessionize_batch(spark):
    rows = [
        ev(1, 1, 1.0, "2024-01-01 10:00:00"),
        ev(2, 1, 2.0, "2024-01-01 10:00:10"),  # same session (gap 10 < 30)
        ev(3, 1, 3.0, "2024-01-01 10:01:00"),  # new session (gap 50 >= 30)
        ev(4, 2, 4.0, "2024-01-01 10:00:05"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r.user_id, r.session_start): r
        for r in sessionize_batch(df, gap_seconds=30).collect()
    }
    assert len(out) == 3
    s1 = out[(1, datetime(2024, 1, 1, 10, 0, 0))]
    assert s1.n_events == 2 and s1.total_value == 3.0
    assert s1.session_end == datetime(2024, 1, 1, 10, 0, 10)
    s2 = out[(1, datetime(2024, 1, 1, 10, 1, 0))]
    assert s2.n_events == 1 and s2.total_value == 3.0
    s3 = out[(2, datetime(2024, 1, 1, 10, 0, 5))]
    assert s3.n_events == 1 and s3.total_value == 4.0


def test_sessionize_streaming_closes_on_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    batch1 = spark.createDataFrame(
        [ev(1, 1, 1.0, "2024-01-01 10:00:00"), ev(2, 1, 2.0, "2024-01-01 10:00:10")],
        SCHEMA,
    )
    batch2 = spark.createDataFrame([ev(3, 2, 9.0, "2024-01-01 10:05:00")], SCHEMA)
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = stream_queue(spark, src, spark.read.parquet(src).schema, 1)
    sessions = sessionize(stream, gap_seconds=30)
    out = str(tmp_path / "out")
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120_000)
    got = spark.read.parquet(out).collect()
    # user 1's session must close once the watermark (driven by the
    # 10:05 event) passes 10:00:10 + 30 s; user 2's stays open
    closed = [r for r in got if r.user_id == 1]
    assert len(closed) == 1
    s = closed[0]
    assert s.n_events == 2 and s.total_value == 3.0
    assert s.session_start == datetime(2024, 1, 1, 10, 0, 0)
    assert s.session_end == datetime(2024, 1, 1, 10, 0, 10)
