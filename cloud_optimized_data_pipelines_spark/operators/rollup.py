"""Hypertable-style continuous aggregate: materialized time-bucket
rollups plus an exact late-tail merge.

The 100 TB pattern: a dashboard that aggregates an append-only event
stream cannot re-scan history per query (the reference re-derives its
dashboard series from raw granules each run — see
/root/reference/README.md pipeline diagram; at Spark scale that is a
full-table scan per refresh).  Instead we keep a *mergeable partial
state* per (time bucket, dims) — count / decimal sum / min / max — that
is:

- **exact** under re-aggregation (counts and decimal sums are
  associative+commutative; min/max idempotent), so merging a
  materialized rollup with a freshly-aggregated raw tail equals a
  direct aggregation over all raw rows, bit-for-bit;
- **incremental**: only the tail since the materialization watermark is
  scanned (pushed-down timestamp predicate → partition/row-group
  pruning on the raw table);
- **derived-late**: avg is NOT stored — it is re-derived as sum/count
  after the merge (storing avg would make the state non-mergeable).

Scale design: the rollup table is ~|buckets × dims| rows regardless of
raw volume, so the merge aggregation is tiny; the only big-data touch
is the tail scan, bounded by the re-materialization cadence.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Partial-state columns a rollup carries.  `sum_value` stays DECIMAL so
# re-aggregation is order-independent (double sums are not).
_STATE_COLS = ("n", "sum_value", "min_value", "max_value")


def hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    val_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Partial (mergeable) aggregate state per (time bucket, dims)."""
    return events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"), *dims
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col(val_col).cast("decimal(18,6)")).alias("sum_value"),
        F.min(val_col).alias("min_value"),
        F.max(val_col).alias("max_value"),
    )


def merge_rollups(*partials: DataFrame) -> DataFrame:
    """Re-aggregate any number of partial rollups into final form.

    Exactness: SUM over DECIMAL partial sums and SUM over counts are
    order-independent; MIN/MAX fold idempotently.  A bucket split
    across partials (e.g. the materialization cutoff landing mid-hour)
    merges to the same state as if aggregated once.
    """
    dims = [c for c in partials[0].columns if c not in _STATE_COLS and c != "bucket"]
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    total = F.sum("sum_value").cast("decimal(38,6)")
    n = F.sum("n").cast("long")
    return unioned.groupBy("bucket", *dims).agg(
        n.alias("n_events"),
        total.alias("total_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        (total.cast("double") / n).alias("avg_value"),
    )


def materialize_rollup(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    cutoff: Column | str,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    val_col: str = "value",
) -> DataFrame:
    """Write the rollup of rows strictly before ``cutoff`` to ``path``,
    partitioned by bucket date (query-side partition pruning), and
    return the written frame re-read."""
    cut = F.lit(cutoff) if isinstance(cutoff, str) else cutoff
    rolled = hourly_rollup(
        events.filter(F.col(ts_col) < cut), ts_col, dims, val_col
    ).withColumn("bucket_date", F.to_date("bucket"))
    rolled.write.mode("overwrite").partitionBy("bucket_date").parquet(path)
    return spark.read.parquet(path).drop("bucket_date")


def continuous_aggregate(
    events: DataFrame,
    cutoff: Column | str,
    materialized: DataFrame | None = None,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    val_col: str = "value",
) -> DataFrame:
    """Final per-bucket aggregate = materialized rollup (history)
    merged with a fresh rollup of the raw tail (``ts >= cutoff``).

    When ``materialized`` is None the history partial is computed
    in-flight (used by the oracle-checked query entry so the whole
    computation is one deterministic plan) — with the cutoff side as an
    extra GROUPING flag, so one raw scan produces both partials (two
    filtered branches would scan events twice)."""
    cut = F.lit(cutoff) if isinstance(cutoff, str) else cutoff
    if materialized is None:
        both = hourly_rollup(
            events.withColumn("__tail", F.col(ts_col) >= cut),
            ts_col,
            (*dims, "__tail"),
            val_col,
        )
        return merge_rollups(both.drop("__tail"))
    tail = hourly_rollup(events.filter(F.col(ts_col) >= cut), ts_col, dims, val_col)
    return merge_rollups(materialized, tail)


def append_stream_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    val_col: str = "value",
):
    """Continuous ingestion into the rollup: each micro-batch appends
    its OWN partial states (several partial rows per bucket are fine —
    mergeable state makes append-only correct, no update-in-place, no
    read-modify-write race).  Exactly-once via the stream checkpoint;
    ``compact_rollup`` folds the accumulated partials back to one row
    per (bucket, dims) when the table grows.

    Returns the started StreamingQuery (caller awaits termination).
    """

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        (
            hourly_rollup(batch_df, ts_col, dims, val_col)
            .withColumn("bucket_date", F.to_date("bucket"))
            .write.mode("append")
            .partitionBy("bucket_date")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_merged(spark: SparkSession, path: str) -> DataFrame:
    """Query-time view over the (possibly multi-partial) rollup table."""
    return merge_rollups(spark.read.parquet(path).drop("bucket_date"))


def compact_rollup(spark: SparkSession, path: str) -> tuple[int, int]:
    """Fold accumulated per-batch partials to one partial row per
    (bucket, dims): re-aggregate partial state (NOT the final form — 
    compaction must stay mergeable) and atomically swap the table.
    Returns (rows_before, rows_after)."""
    import os
    import shutil

    df = spark.read.parquet(path)
    before = df.count()
    dims = [
        c for c in df.columns if c not in _STATE_COLS and c not in ("bucket", "bucket_date")
    ]
    folded = (
        df.groupBy("bucket", *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast("decimal(18,6)").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("bucket_date", F.to_date("bucket"))
    )
    tmp = path.rstrip("/") + "._compacting"
    folded.write.mode("overwrite").partitionBy("bucket_date").parquet(tmp)
    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    return before, spark.read.parquet(path).count()


def cascade_rollup(partials: DataFrame, bucket: str = "day") -> DataFrame:
    """Derive a coarser-grain partial rollup FROM a finer one — daily
    from hourly, monthly from daily — by re-truncating the bucket and
    re-aggregating partial state.  No raw scan: the input is already
    |buckets × dims|-sized, so a whole grain hierarchy costs a few
    sketch-table aggregations.  Output stays partial (mergeable), so
    cascades compose: hour → day → month."""
    dims = [
        c for c in partials.columns if c not in _STATE_COLS and c != "bucket"
    ]
    return partials.groupBy(
        F.date_trunc(bucket, F.col("bucket")).alias("bucket"), *dims
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").cast("decimal(18,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
