"""CMR catalog discovery (SURVEY S3/S4, F2-F5).

The reference queries NASA CMR granule search with server-side temporal
/ bbox / collection predicates and flattens each granule's ``links``
list into per-file records (``lambdas/cmr-query/handler.py:8-56``).

Spark-first shape: the catalog is a granules DataFrame (fetched once by
a narrow connector, or any pre-materialized granule table); predicate
"pushdown to CMR" is expressed as plain filters that a DataSourceV2
connector *may* push — against a local granule table Catalyst pushes
them into the parquet scan instead, which is the same optimization.
Link flattening is ``explode`` + filters, fully JVM-side.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.schemas import GRANULE_SCHEMA
from cloud_optimized_data_pipelines_spark.sources.inventory import anchored_rlike

# rel type the reference keeps in non-stac mode (cmr-query/handler.py:33)
DATA_REL = "http://esipfed.org/ns/fedsearch/1.1/data#"

# the reference's temporal/bbox defaults (cmr-query/handler.py:15,25)
DEFAULT_TEMPORAL = ("1000-01-01T00:00:00Z", "3000-01-01T23:59:59Z")
DEFAULT_BBOX = (-180.0, -90.0, 180.0, 90.0)

# Pluggable fetch — tests inject a fake; prod wires a paginated REST
# client (cmr-query/handler.py:19 `get_all()`). Kept OUT of executors:
# one catalog fetch produces a DataFrame the cluster then fans out on.
GranuleFetcher = Callable[..., "list[tuple]"]


def granules_from_fetcher(
    spark: SparkSession, fetcher: GranuleFetcher, **query
) -> DataFrame:
    return spark.createDataFrame(fetcher(**query), GRANULE_SCHEMA)


def query_granules(
    granules: DataFrame,
    collection: str,
    version: str | None = None,
    temporal: tuple[str, str] | None = None,
    bounding_box: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """S3/F4/F5: the CMR search predicates as source-pushable filters."""
    t0, t1 = temporal or DEFAULT_TEMPORAL
    w, s, e, n = bounding_box or DEFAULT_BBOX
    df = granules.filter(F.col("collection") == collection)
    if version is not None:
        df = df.filter(F.col("version") == version)
    df = df.filter(
        F.col("time_start").between(
            F.to_timestamp(F.lit(t0), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.to_timestamp(F.lit(t1), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        )
    )
    # bbox intersection test on [W,S,E,N] arrays (cmr-query/handler.py:25)
    df = df.filter(
        (F.element_at("bbox", 1) <= e)
        & (F.element_at("bbox", 3) >= w)
        & (F.element_at("bbox", 2) <= n)
        & (F.element_at("bbox", 4) >= s)
    )
    return df


def explode_links(
    granules: DataFrame,
    mode: str = "data",
    include: str | None = None,
) -> DataFrame:
    """S4/F2/F3: granule links -> per-file records.

    mode='stac'  keeps https ``*stac.json`` hrefs (cmr-query/handler.py:34-36);
    otherwise keeps the fedsearch data# rel (handler.py:32-33).
    ``include`` is the reference's extra anchored-regex filter (handler.py:47-53).
    """
    link = F.explode("links").alias("link")
    df = granules.select("collection", "granule_id", link).select(
        "collection", "granule_id", F.col("link.rel").alias("rel"), F.col("link.href").alias("href")
    )
    if mode == "stac":
        df = df.filter(
            F.col("href").startswith("https") & F.col("href").endswith("stac.json")
        )
    else:
        df = df.filter(F.col("rel") == DATA_REL)
    if include:
        df = df.filter(anchored_rlike(F.col("href"), include))
    return df.select(
        "collection",
        F.col("href").alias("s3_filename"),
        "granule_id",
        F.concat_ws("-", "granule_id", "collection").alias("id"),
    )
