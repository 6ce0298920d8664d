"""Engine schemas — Spark StructTypes for the reference's record shapes.

Derived from the reference's pydantic event models
(``lambdas/build-stac/utils/events.py:13-47``), the discovery record
constructor (``lambdas/s3-discovery/handler.py:53-61``), the CMR granule
shape (``lambdas/cmr-query/handler.py:29-46``), and the STAC collection
format (``OPERATING.md:15-60``).  See SURVEY.md section 1.1.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The unit row of the pipeline: one file/asset event.
# RegexEvent/CmrEvent fields (events.py:13-47) + routing flags spread in
# by discovery (s3-discovery/handler.py:50-61) + a MAP catch-all for the
# reference's `**event` dynamic passthrough (SURVEY section 1.3 regime 2).
EVENT_SCHEMA = StructType(
    [
        StructField("collection", StringType(), False),
        StructField("s3_filename", StringType(), False),
        StructField("granule_id", StringType(), True),  # non-null => CMR-routed
        StructField("filename_regex", StringType(), True),
        StructField("id_regex", StringType(), True),
        StructField("datetime_range", StringType(), True),  # 'month'|'year'|NULL
        StructField("start_datetime", TimestampType(), True),
        StructField("end_datetime", TimestampType(), True),
        StructField("single_datetime", TimestampType(), True),
        StructField("properties", MapType(StringType(), StringType()), True),
        StructField("asset_name", StringType(), True),
        StructField("asset_roles", ArrayType(StringType()), True),
        StructField("asset_media_type", StringType(), True),
        StructField("upload", BooleanType(), True),
        StructField("cogify", BooleanType(), True),
        StructField("dry_run", BooleanType(), True),
        StructField("extra", MapType(StringType(), StringType()), True),
    ]
)

# S3 inventory listing row (s3-discovery/handler.py:16-39; FIXTURES.md #1).
INVENTORY_SCHEMA = StructType(
    [
        StructField("bucket", StringType(), False),
        StructField("key", StringType(), False),
        StructField("size", LongType(), True),
        StructField("last_modified", TimestampType(), True),
    ]
)

# CMR granule search result row (cmr-query/handler.py:29-46; FIXTURES.md #2).
GRANULE_SCHEMA = StructType(
    [
        StructField("granule_id", StringType(), False),
        StructField("collection", StringType(), False),
        StructField("version", StringType(), True),
        StructField("time_start", TimestampType(), True),
        StructField("time_end", TimestampType(), True),
        StructField("bbox", ArrayType(DoubleType()), True),  # [W, S, E, N]
        StructField(
            "links",
            ArrayType(
                StructType(
                    [
                        StructField("rel", StringType(), True),
                        StructField("href", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# STAC collection dimension row (OPERATING.md:15-60; FIXTURES.md #4).
COLLECTION_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("license", StringType(), True),
        StructField("bbox", ArrayType(DoubleType()), True),
        StructField("temporal_start", TimestampType(), True),
        StructField("temporal_end", TimestampType(), True),  # NULL = open interval
        StructField("is_periodic", BooleanType(), True),
        StructField("time_density", StringType(), True),
    ]
)

# Per-collection cogify conversion parameters (cogify/example.ini:5-24;
# FIXTURES.md #5). Broadcast-joined on `collection` (SURVEY J1).
COGIFY_CONFIG_SCHEMA = StructType(
    [
        StructField("collection", StringType(), False),
        StructField("variable_name", StringType(), True),
        StructField("group", StringType(), True),
        StructField("x_variable", StringType(), True),
        StructField("y_variable", StringType(), True),
        StructField("src_crs", StringType(), True),
        # parsed (xmin, xres, 0, ymax, 0, -yres) tuple — the reference
        # `eval()`s this string (cogify/handler.py:130); we parse it safely.
        StructField("affine_transformation", StringType(), True),
    ]
)

# STAC item output record (build-stac/utils/stac.py:32-48) — nested struct;
# raster-derived proj:*/raster:* properties land in `properties`.
STAC_ITEM_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("collection", StringType(), False),
        StructField("bbox", ArrayType(DoubleType()), True),
        StructField("geometry_wkt", StringType(), True),
        StructField("properties", MapType(StringType(), StringType()), True),
        StructField(
            "assets",
            MapType(
                StringType(),
                StructType(
                    [
                        StructField("href", StringType(), True),
                        StructField("roles", ArrayType(StringType()), True),
                        StructField("media_type", StringType(), True),
                    ]
                ),
            ),
            True,
        ),
    ]
)

# Multimodal payload row — image/audio/video as opaque binary + typed
# metadata (generalizes the reference's raster pattern, SURVEY section 7.7).
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video|raster
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)
