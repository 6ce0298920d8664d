"""sessionization + gap stats + DLQ routing (streaming-shape)

Split out of the single-file registry in round 11 (VERDICT r10 task
9); registration order is preserved by the import order in
``cloud_optimized_data_pipelines_spark.queries`` and pinned by
``tests/test_registry_order.py``.  Code is unchanged — only moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.functions.ids import item_id  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import text as T  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import vectors as V  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import dedup as D  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import similarity as S  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.operators.transfer import plan_transfer  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.sources import cmr as cmr_src  # noqa: F401
from cloud_optimized_data_pipelines_spark.sources import inventory as inv_src  # noqa: F401,E501

from cloud_optimized_data_pipelines_spark.queries import (  # noqa: F401
    load_tables,
    query,
)

_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,6)) AS value,
         epoch_us(ts) AS us
  FROM events
),
b AS (
  SELECT *, CASE WHEN us - lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w >= 3600000000::BIGINT
            THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM b
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(value) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sess
"""


@query("sessionize_batch_events", _SESSIONIZE)
def sessionize_q(spark, sf_dir):
    """Sessionization (batch form of the applyInPandasWithState streaming
    operator in streaming/sessionize.py): 1-hour-gap user sessions."""
    from cloud_optimized_data_pipelines_spark.streaming.sessionize import (
        sessionize_batch,
    )

    t = load_tables(spark, sf_dir)
    events = t["events"].withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    out = sessionize_batch(events, gap_seconds=3600)
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value")
        .cast("decimal(38,6)")
        .cast("double")
        .alias("total_value"),
    )


_GAP_STATS_SPARK = """
WITH g AS (
  SELECT user_id,
         unix_micros(CAST(ts AS TIMESTAMP_LTZ))
           - LAG(unix_micros(CAST(ts AS TIMESTAMP_LTZ)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, COUNT(gap_us) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       percentile(gap_us, 0.5) AS p50_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""

_GAP_STATS_DUCK = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       quantile_cont(gap_us, 0.5) AS p50_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@query("events_gap_stats", _GAP_STATS_DUCK)
def events_gap_stats(spark, sf_dir):
    """Inter-event gap distribution per user: lag over event-time order
    + exact median — the cadence profile behind sessionization gap
    tuning.  One shuffle (partitionBy user); with the session pinned to
    UTC, unix_micros(NTZ→LTZ cast) == DuckDB epoch_us exactly."""
    load_tables(spark, sf_dir)
    return spark.sql(_GAP_STATS_SPARK)


_DLQ_ROUTE = """
WITH r AS (
  SELECT event_id, event_type,
    (event_type <> 'error' AND substr(md5(CAST(event_id AS VARCHAR) || ':1'), 1, 1) > '3') AS s1,
    (event_type <> 'error' AND substr(md5(CAST(event_id AS VARCHAR) || ':2'), 1, 1) > '3') AS s2,
    (event_type <> 'error' AND substr(md5(CAST(event_id AS VARCHAR) || ':3'), 1, 1) > '3') AS s3
  FROM events
)
SELECT event_id, event_type,
       CAST(COALESCE(CASE WHEN s1 THEN 1 WHEN s2 THEN 2 WHEN s3 THEN 3 END, 3) AS BIGINT) AS attempts,
       CASE WHEN s1 OR s2 OR s3 THEN 'delivered' ELSE 'dlq' END AS status
FROM r
"""


@query("streaming_dlq_routing", _DLQ_ROUTE)
def streaming_dlq_routing_q(spark, sf_dir):
    """SURVEY 2.8 T3-T5 as an oracle-checkable batch query
    (streaming/queues.py::retry_route_batch): deterministic
    transient-failure model (md5 of id:attempt), permanent poison rows
    (event_type='error') park in the DLQ after max_attempts receives,
    flaky rows retry until first success.  The streaming path
    (run_stage quarantine) shares the same attempts/DLQ semantics,
    pytest-verified; this gives the family a driver-visible row."""
    from cloud_optimized_data_pipelines_spark.streaming.queues import (
        retry_route_batch,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type")
    return retry_route_batch(
        ev, "event_id", F.col("event_type") == "error", max_attempts=3
    )




_WATERMARK_REPLAY = """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
         event_id // 500
           + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 4
           AS b
  FROM events
),
bm AS (SELECT b, MAX(us) AS bmax FROM e GROUP BY b),
wm AS (
  SELECT b,
         MAX(bmax) OVER (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - 172800000000 AS wm_prev
  FROM bm
),
j AS (
  SELECT (e.us // 3600000000) * 3600000000 AS window_us, e.event_type,
         (wm.wm_prev IS NOT NULL AND
          (e.us // 3600000000) * 3600000000 + 3600000000 <= wm.wm_prev)
           AS late
  FROM e JOIN wm USING (b)
)
SELECT window_us, event_type,
       CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS accepted,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS dropped
FROM j GROUP BY window_us, event_type
"""


@query("streaming_watermark_replay", _WATERMARK_REPLAY)
def streaming_watermark_replay_q(spark, sf_dir):
    """SURVEY 2.8 watermark semantics as an oracle-checkable batch
    query (streaming/queues.py::watermark_replay — the dlq_routing
    precedent).  Arrival order is a deterministic straggler model:
    micro-batch = event_id div 500 plus an md5-derived lateness of
    0-3 batches, so ~half the late rows land beyond the 2-day
    watermark delay and get dropped by the WINDOW-FINALIZATION rule
    (window end <= the watermark in effect during their batch, which
    lags TWO batches behind — batch k-1's event-time stats commit at
    batch k+1; the empirical Spark 4 rule, discriminated and pinned
    by the equivalence test — and a late row whose window is still
    open IS aggregated).  The REAL withWatermark stream path is proven
    equivalent on finalized windows in tests/test_streaming.py."""
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        hash_bucket,
    )
    from cloud_optimized_data_pipelines_spark.streaming.queues import (
        watermark_replay,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn(
        "arrival_batch",
        F.expr("event_id div 500") + hash_bucket("event_id", 4),
    )
    return watermark_replay(
        ev, "arrival_batch", "ts", "event_type",
        delay_seconds=172800, window_seconds=3600,
    ).select("window_us", "event_type", "accepted", "dropped")
