"""S3-prefix discovery as an inventory scan (SURVEY S1/S2, F1).

The reference lists a bucket/prefix server-side and regex-filters keys
(``lambdas/s3-discovery/handler.py:16-39``), then wraps each key into an
event record with defaulting + dynamic passthrough
(``handler.py:42-65``).

Spark-first shape: discovery is a *scan over an inventory DataFrame*
(S3 Inventory parquet, a ``binaryFile`` metadata listing, or a local
directory walk for tests).  Prefix restriction becomes partition
pruning / a pushed ``startswith`` predicate; the anchored-regex filter
is an ``rlike`` that Catalyst keeps right on top of the scan.  At 100 TB
the listing itself is data — hence a DataFrame, never a driver loop.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.urls import s3_url
from cloud_optimized_data_pipelines_spark.schemas import INVENTORY_SCHEMA


def anchored_rlike(c: Column, pattern: str | Column) -> Column:
    """``re.match`` semantics (anchored at start) via rlike.

    ``re.match`` anchors at the start only; Java ``rlike`` is a search,
    so we prefix ``^`` unless already anchored (s3-discovery/handler.py:30-34).
    """
    if isinstance(pattern, str):
        anchored = pattern if pattern.startswith("^") else "^" + pattern
        return c.rlike(anchored)
    return c.rlike(
        F.when(pattern.startswith("^"), pattern).otherwise(F.concat(F.lit("^"), pattern))
    )


def local_inventory(spark: SparkSession, root: str, bucket: str = "local") -> DataFrame:
    """Inventory DataFrame from a local directory tree (test stand-in for
    an S3 Inventory manifest; prod reads the inventory parquet directly)."""
    rows = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            rows.append(
                (
                    bucket,
                    os.path.relpath(p, root),
                    st.st_size,
                    datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(
                        tzinfo=None
                    ),
                )
            )
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)


def discover(
    inventory: DataFrame,
    prefix: str | None = None,
    filename_regex: str | None = None,
) -> DataFrame:
    """S1: prefix + anchored-regex restriction of an inventory scan.

    Both predicates sit directly on the scan so Catalyst pushes the
    ``startswith`` into the source (PushedFilters: StringStartsWith) and
    partition-prunes a prefix-partitioned inventory table.
    """
    df = inventory
    if prefix:
        df = df.filter(F.col("key").startswith(prefix))
    if filename_regex:
        df = df.filter(anchored_rlike(F.col("key"), filename_regex))
    return df


def enrich(
    discovered: DataFrame,
    collection: str | None = None,
    prefix: str | None = None,
    upload: bool | None = None,
    cogify: bool = False,
    dry_run: bool = False,
    event_extras: dict[str, str] | None = None,
    filename_regex: str | None = None,
    id_regex: str | None = None,
    datetime_range: str | None = None,
) -> DataFrame:
    """S2: key -> pipeline event record with the reference's defaulting.

    - ``s3_filename = f"s3://{bucket}/{key}"``       (handler.py:58)
    - ``collection`` defaults to ``prefix.rstrip('/')`` (handler.py:52)
    - ``upload`` defaults to False                    (handler.py:59)
    - unknown input keys pass through in ``extra``    (handler.py:54 `**event`)
    """
    default_collection = (prefix or "").rstrip("/")
    extras = event_extras or {}
    extra_col = (
        F.create_map(*[F.lit(x) for kv in extras.items() for x in kv])
        if extras
        else F.lit(None).cast("map<string,string>")
    )
    return discovered.select(
        F.lit(collection or default_collection).alias("collection"),
        s3_url(F.col("bucket"), F.col("key")).alias("s3_filename"),
        F.lit(None).cast("string").alias("granule_id"),
        F.lit(filename_regex).cast("string").alias("filename_regex"),
        F.lit(id_regex).cast("string").alias("id_regex"),
        F.lit(datetime_range).cast("string").alias("datetime_range"),
        F.lit(None).cast("timestamp").alias("start_datetime"),
        F.lit(None).cast("timestamp").alias("end_datetime"),
        F.lit(None).cast("timestamp").alias("single_datetime"),
        F.lit(None).cast("map<string,string>").alias("properties"),
        F.lit(None).cast("string").alias("asset_name"),
        F.lit(None).cast("array<string>").alias("asset_roles"),
        F.lit(None).cast("string").alias("asset_media_type"),
        F.lit(False if upload is None else upload).alias("upload"),
        F.lit(cogify).alias("cogify"),
        F.lit(dry_run).alias("dry_run"),
        extra_col.alias("extra"),
    )
