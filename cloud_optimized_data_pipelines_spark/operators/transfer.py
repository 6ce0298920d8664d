"""Data-transfer operator (SURVEY K3, F6, F7, J2).

The reference copies each ``upload``-flagged object to
``{target_bucket}/{collection}/{basename}``, skipping targets that
already exist (a per-record ``head_object``), then rewrites
``s3_filename`` (``lambdas/data-transfer/handler.py:18-63``).

Spark-first shape:
- the upload gate is a filter (F6);
- the existence check is a **left-anti join** against a target
  inventory DataFrame (F7/J2) — at 100 TB, one listing scan beats a
  billion per-key HEAD requests by orders of magnitude, and Catalyst
  can broadcast the inventory when small;
- the URL rewrite is a column expression;
- the physical byte copy is an executor-side ``foreachPartition``
  (side effect, off the query plan), idempotent by construction.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.urls import (
    s3_url,
    target_key,
    url_bucket,
    url_key,
)


def plan_transfer(
    events: DataFrame,
    target_inventory: DataFrame,
    target_bucket: str,
) -> DataFrame:
    """Pure (side-effect-free) transfer plan.

    Returns the full event stream with:
    - ``s3_filename`` rewritten to the target URL for uploaded rows
      (data-transfer/handler.py:61), unchanged otherwise;
    - ``needs_copy`` True for rows whose target object does not already
      exist in ``target_inventory(bucket, key)`` (handler.py:44-47).
    """
    upload_flag = F.coalesce(F.col("upload"), F.lit(False))
    tkey = target_key(F.col("collection"), F.col("s3_filename"))

    with_target = events.withColumn("_target_key", F.when(upload_flag, tkey))
    existing = target_inventory.filter(F.col("bucket") == target_bucket).select(
        F.col("key").alias("_target_key"), F.lit(True).alias("_exists")
    )
    # left join + null-check rather than anti-join so non-upload rows ride
    # along untouched; Catalyst broadcasts `existing` when it is small and
    # AQE converts to broadcast at runtime otherwise.
    joined = with_target.join(existing, "_target_key", "left")
    return (
        joined.withColumn(
            "needs_copy", upload_flag & F.col("_exists").isNull()
        )
        .withColumn(
            "source_url", F.col("s3_filename")
        )
        .withColumn(
            "s3_filename",
            F.when(upload_flag, s3_url(F.lit(target_bucket), F.col("_target_key"))).otherwise(
                F.col("s3_filename")
            ),
        )
        .drop("_target_key", "_exists")
    )


def execute_copies(
    planned: DataFrame,
    copy_fn: Callable[[str, str, str, str], None],
) -> None:
    """Run the physical copies: ``copy_fn(src_bucket, src_key, dst_bucket,
    dst_key)`` per needs_copy row, executor-side, partition-batched.

    ``copy_fn`` wraps boto3 in prod (cross-account assume-role per
    handler.py:49-59) and a local filesystem copy in tests.
    """
    rows = planned.filter(F.col("needs_copy")).select(
        url_bucket("source_url").alias("sb"),
        url_key("source_url").alias("sk"),
        url_bucket("s3_filename").alias("db"),
        url_key("s3_filename").alias("dk"),
    )

    def _run(part: Iterable) -> None:
        for r in part:
            copy_fn(r.sb, r.sk, r.db, r.dk)

    rows.foreachPartition(_run)
