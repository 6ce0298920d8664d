"""events: streaming-shape batch queries (SURVEY section 2.8)

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

# --- events: streaming-shape batch queries (SURVEY section 2.8) ------------

_HOURLY = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("events_hourly_window", _HOURLY)
def events_hourly(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("total_value"),
        )
    )


_EVENT_DEDUP = """
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1
"""


@query("events_dedup_first_per_key", _EVENT_DEDUP)
def events_dedup(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


_JSON_PROPS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@query("events_json_extract", _JSON_PROPS)
def events_json(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("total_k"),
            F.count("*").alias("n"),
        )
    )


_ASOF = """
SELECT v.event_id, v.user_id, v.ts,
       MAX(c.ts) AS last_click_ts
FROM events v
LEFT JOIN events c
  ON c.user_id = v.user_id AND c.event_type = 'click' AND c.ts <= v.ts
WHERE v.event_type = 'purchase'
GROUP BY v.event_id, v.user_id, v.ts
"""


@query("asof_join_last_click", _ASOF)
def asof_join(spark, sf_dir):
    """As-of join (engine extension): for each purchase, the most recent
    click by the same user — union+window formulation (one shuffle,
    linear state; see operators/relational.asof_join). The oracle uses
    the equivalent range-join+max SQL."""
    from cloud_optimized_data_pipelines_spark.operators.relational import asof_join

    t = load_tables(spark, sf_dir)
    purchases = t["events"].filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t["events"].filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
        right_values=["ts"], suffix="_click",
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("ts_click").alias("last_click_ts")
    )


