"""Bucketed table layout — the pre-shuffle answer to repeated joins.

The reference re-lists and re-joins the same inventories on every run
(`lambdas/data-transfer/handler.py:44-47` existence checks against the
same target bucket; `lambdas/build-stac` re-resolving the same
collections).  At 100 TB the equivalent Spark anti-/equi-joins shuffle
the fact every time.  Bucketing is Spark's native fix: write the table
hash-partitioned (and optionally sorted) by the join key ONCE, and
every later equi-join / groupBy on that key reads co-located buckets —
no Exchange in the plan at all.

Local caveat this module embraces: bucketing only kicks in for tables
read through the catalog (``spark.table``), not bare parquet paths, and
both sides must agree on bucket count for a shuffle-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> str:
    """Materialize ``df`` as a bucketed (optionally sorted) table.

    ``num_buckets`` is the long-lived layout decision: pick it so one
    bucket of the LARGEST co-bucketed table fits an executor task
    (e.g. 100 TB fact / 8192 buckets ≈ 12 GB... too big; 65536 ≈ 1.5 GB
    per bucket).  All tables that will join on ``bucket_cols`` must use
    the SAME count — Spark only elides the shuffle when the partitioning
    matches on both sides.
    """
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return table_name


def co_bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket counts the physical plan is scan→sort→SMJ with
    NO Exchange on either side (verified in tests/test_bucketing.py) —
    at scale this removes the dominant cost of every repeated join.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
