"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the no2-monthly metadata pipeline (SURVEY section 7.3)
    end-to-end — inventory scan -> anchored regex -> enrich ->
    extract_dates(month) -> item id -> STAC item struct + JSON."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.plans.pipeline import (
        PipelineSpec,
        compile_pipeline,
    )

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    inventory = orders.select(
        F.lit("veda-staging").alias("bucket"),
        F.concat(
            F.lit("no2-monthly/OMI_trno2_0.10x0.10_"),
            F.date_format("o_orderdate", "yyyyMM"),
            F.lit("_Col3_V4.tif"),
        ).alias("key"),
        F.col("o_orderkey").alias("size"),
        F.col("o_orderdate").alias("last_modified"),
    ).distinct()
    spec = PipelineSpec(
        collection="no2-monthly",
        discovery="s3",
        prefix="no2-monthly/",
        filename_regex=r"^.*\.tif$",
        datetime_range="month",
    )
    items = compile_pipeline(spec, inventory=inventory)
    return items.select(
        "s3_filename",
        F.col("item.id").alias("item_id"),
        "start_datetime",
        "end_datetime",
        "item_json",
        "needs_spill",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 (plus
    the training-data extensions).  See
    cloud_optimized_data_pipelines_spark/queries.py."""
    from cloud_optimized_data_pipelines_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types).

    Entries registered as callables (oracles whose construction does
    real work, e.g. the COG reference conversions) are resolved here —
    once — so importing the query registry stays cheap."""
    from cloud_optimized_data_pipelines_spark.queries import ORACLE

    for k, v in list(ORACLE.items()):
        if callable(v):
            ORACLE[k] = v()
    return dict(ORACLE)
