"""STAC item assembly (SURVEY section 2.7 C1-C12, K2; build-stac lambda).

The reference parses each event with pydantic, derives dates + item id,
probes the raster for proj/band metadata via ``rio_stac``, and emits an
item dict — or an S3 side-file when the serialized item exceeds the
Step Functions 256 KiB state cap (``lambdas/build-stac/handler.py:20-55``,
``utils/stac.py:73-129``).

Spark-first shape: everything except the raster probe is pure column
algebra over the event DataFrame — date extraction (C1), id derivation
(C4), ISO formatting (C5), property-map assembly, JSON serialization
(C10), spill flag (K2).  The raster probe is quarantined in
``operators/multimodal.py`` as a pandas-UDF stage and joined back on
item id, so the metadata plan never leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates
from cloud_optimized_data_pipelines_spark.functions.ids import item_id_per_row
from cloud_optimized_data_pipelines_spark.functions.json_utils import spill_required

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
DEFAULT_ASSET_NAME = "cog_default"
DEFAULT_ASSET_ROLES = ["data", "layer"]
DEFAULT_MEDIA_TYPE = "image/tiff; application=geotiff; profile=cloud-optimized"


def iso(ts: Column) -> Column:
    """C5: ``strftime('%Y-%m-%dT%H:%M:%SZ')`` (utils/stac.py:97-98)."""
    return F.date_format(ts, ISO_FMT)


def derive_datetimes(events: DataFrame) -> DataFrame:
    """C1: fill start/end/single from the filename unless the event
    carries explicit datetimes (RegexEvent fields override extraction —
    events.py:40-42; CMR events take granule times via the enrichment
    join, SURVEY J3)."""
    has_explicit = (
        F.col("start_datetime").isNotNull()
        | F.col("end_datetime").isNotNull()
        | F.col("single_datetime").isNotNull()
    )
    d = extract_dates(F.col("s3_filename"), F.col("datetime_range"))
    return (
        events.withColumn("_d", F.when(~has_explicit, d))
        .withColumn(
            "start_datetime", F.coalesce("start_datetime", "_d.start_datetime")
        )
        .withColumn("end_datetime", F.coalesce("end_datetime", "_d.end_datetime"))
        .withColumn(
            "single_datetime", F.coalesce("single_datetime", "_d.single_datetime")
        )
        .withColumn(
            "date_error", F.when(~has_explicit, F.col("_d.error"))
        )
        .drop("_d")
    )


def enrich_from_granules(events: DataFrame, granules: DataFrame) -> DataFrame:
    """J3: CMR metadata enrichment join (utils/stac.py:118).

    The reference fetches each granule's JSON by concept id, one HTTP
    call per item, limited to 1 result (W3).  Here: a broadcast left
    join on granule_id that fills start/end datetimes from the granule's
    temporal range for CMR-routed events (F10: granule_id non-null).
    """
    g = granules.select(
        F.col("granule_id").alias("_gid"),
        F.col("time_start").alias("_g_start"),
        F.col("time_end").alias("_g_end"),
    )
    joined = events.join(
        F.broadcast(g), events["granule_id"] == F.col("_gid"), "left"
    )
    return (
        joined.withColumn(
            "start_datetime", F.coalesce("start_datetime", "_g_start")
        )
        .withColumn("end_datetime", F.coalesce("end_datetime", "_g_end"))
        .drop("_gid", "_g_start", "_g_end")
    )


def build_items(events: DataFrame, spill_limit: int = 256 * 1024) -> DataFrame:
    """Assemble the STAC-item struct + serialized JSON + spill flag.

    Output columns: item STRUCT, item_json STRING, needs_spill BOOLEAN,
    date_error STRING (non-null = the reference would have raised).
    """
    dated = derive_datetimes(events)
    item = F.struct(
        item_id_per_row(F.col("s3_filename"), F.col("id_regex")).alias("id"),
        F.col("collection").alias("collection"),
        F.map_filter(
            F.map_concat(
                F.coalesce(
                    F.col("properties"), F.expr("cast(map() as map<string,string>)")
                ),
                F.map_from_arrays(
                    F.array(
                        F.lit("start_datetime"),
                        F.lit("end_datetime"),
                        F.lit("datetime"),
                    ),
                    F.array(
                        iso(F.col("start_datetime")),
                        iso(F.col("end_datetime")),
                        iso(F.col("single_datetime")),
                    ),
                ),
            ),
            lambda _, v: v.isNotNull(),
        ).alias("properties"),
        F.map_from_arrays(
            F.array(F.coalesce(F.col("asset_name"), F.lit(DEFAULT_ASSET_NAME))),
            F.array(
                F.struct(
                    F.col("s3_filename").alias("href"),
                    F.coalesce(
                        F.col("asset_roles"),
                        F.array(*[F.lit(r) for r in DEFAULT_ASSET_ROLES]),
                    ).alias("roles"),
                    F.coalesce(
                        F.col("asset_media_type"), F.lit(DEFAULT_MEDIA_TYPE)
                    ).alias("media_type"),
                )
            ),
        ).alias("assets"),
    )
    out = dated.withColumn("item", item).withColumn(
        "item_json", F.to_json(F.col("item"))
    )
    return out.withColumn(
        "needs_spill", spill_required(F.col("item_json"), spill_limit)
    )
