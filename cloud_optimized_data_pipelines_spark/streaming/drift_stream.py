"""Streaming drift monitor — PSI over micro-batch category partials.

The streaming half of ``operators/drift.py``: each micro-batch appends
its OWN (window, category, count) partial aggregate (the
``streaming/partials.py`` mergeable-state pattern — append-only, so
checkpoint replay re-appends deterministically instead of corrupting a
read-modify-write), and the monitor query merges partials and feeds
them through the SAME smoothing/log arithmetic as the batch
``psi_by_window`` (``drift.psi_from_counts``).  Counts are associative
BIGINTs, so however the micro-batches sliced the stream, the merged
PSI is bit-identical to a batch run over the union — tested in
``tests/test_streaming.py``.

Scale shape: the partial table grows by (windows x categories) rows
per micro-batch — metadata-sized — and the monitor never rescans raw
events; a periodic fold compaction (groupBy window/cat, overwrite)
bounds it, same as the sketch partial tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.streaming.partials import (
    append_stream_partials,
)


def append_category_partials(
    stream_df: DataFrame,
    path: str,
    checkpoint_path: str,
    category_col: str,
    window_expr: Column,
):
    """Start an availableNow stream appending per-micro-batch
    (window, cat, cnt) counts — mergeable by construction."""

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy(
            window_expr.alias("w"), F.col(category_col).alias("cat")
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))

    return append_stream_partials(stream_df, path, checkpoint_path, partial)


def psi_from_partials(
    spark, path: str, label_before: str, label_after: str
) -> DataFrame:
    """Merge the appended partials and compute the PSI decomposition
    between two window labels — identical output to the batch
    ``psi_by_window`` over the same events (see module docstring)."""
    from cloud_optimized_data_pipelines_spark.operators.drift import (
        psi_from_counts,
    )

    merged = (
        spark.read.parquet(path)
        .filter(F.col("w").isin([label_before, label_after]))
        .groupBy("cat")
        .agg(
            F.sum(
                F.when(F.col("w") == label_before, F.col("cnt")).otherwise(0)
            )
            .cast("long")
            .alias("cnt_before"),
            F.sum(
                F.when(F.col("w") == label_after, F.col("cnt")).otherwise(0)
            )
            .cast("long")
            .alias("cnt_after"),
        )
    )
    return psi_from_counts(merged)
