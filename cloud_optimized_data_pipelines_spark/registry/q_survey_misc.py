"""remaining SURVEY items + sketches, rollups, samples, graph, drift, privacy, pipeline

Split out of the single-file registry in round 11 (VERDICT r10 task
9); registration order is preserved by the import order in
``cloud_optimized_data_pipelines_spark.queries`` and pinned by
``tests/test_registry_order.py``.  Code is unchanged — only moved.
"""

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
from cloud_optimized_data_pipelines_spark.registry.q_similarity import (  # noqa: F401,E501
    _DUCK_LTOKS,
    _LANG_CASE,
    _duck_lang_count,
)

# ---------------------------------------------------------------------------
# Remaining SURVEY section-2 line items as oracle-checked queries:
# S3 (CMR predicate pushdown shape), C7 (URL parse), A1 (array extent),
# J3 (granule enrichment join).
# ---------------------------------------------------------------------------

_CMR_PREDICATES = """
WITH g AS (
  SELECT 'G' || CAST(o_orderkey AS STRING) AS granule_id,
         'OMDOAO3e' AS collection, '003' AS version,
         o_orderdate AS time_start,
         o_orderdate + INTERVAL 1 DAY AS time_end,
         [CAST(CAST(o_orderkey % 360 AS INT) AS DOUBLE) - 180.0,
          CAST(CAST(o_orderkey % 170 AS INT) AS DOUBLE) - 85.0,
          CAST(CAST(o_orderkey % 360 AS INT) AS DOUBLE) - 170.0,
          CAST(CAST(o_orderkey % 170 AS INT) AS DOUBLE) - 75.0] AS bbox
  FROM orders
)
SELECT granule_id, time_start
FROM g
WHERE collection = 'OMDOAO3e' AND version = '003'
  AND time_start >= TIMESTAMP '1996-01-01 00:00:00'
  AND time_start <= TIMESTAMP '1999-01-01 00:00:00'
  AND bbox[1] <= 90.0 AND bbox[3] >= -90.0
  AND bbox[2] <= 45.0 AND bbox[4] >= -45.0
"""


@query("s3_cmr_predicates", _CMR_PREDICATES)
def cmr_predicates_q(spark, sf_dir):
    """S3/F4/F5: the CMR temporal + bbox + collection/version predicates
    via the engine's query_granules operator."""
    t = load_tables(spark, sf_dir)
    okey = F.col("o_orderkey")
    granules = t["orders"].select(
        F.concat(F.lit("G"), okey.cast("string")).alias("granule_id"),
        F.lit("OMDOAO3e").alias("collection"),
        F.lit("003").alias("version"),
        F.col("o_orderdate").alias("time_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("time_end"),
        F.array(
            (okey % 360).cast("int").cast("double") - 180.0,
            (okey % 170).cast("int").cast("double") - 85.0,
            (okey % 360).cast("int").cast("double") - 170.0,
            (okey % 170).cast("int").cast("double") - 75.0,
        ).alias("bbox"),
        F.lit(None).cast(
            "array<struct<rel:string,href:string>>"
        ).alias("links"),
    )
    hits = cmr_src.query_granules(
        granules,
        collection="OMDOAO3e",
        version="003",
        temporal=("1996-01-01T00:00:00Z", "1999-01-01T00:00:00Z"),
        bounding_box=(-90.0, -45.0, 90.0, 45.0),
    )
    return hits.select("granule_id", "time_start")


_URL_PARSE = """
SELECT p_partkey,
       regexp_extract(url, '^[a-z0-9]+://([^/]+)', 1) AS bucket,
       regexp_extract(url, '^[a-z0-9]+://[^/]+/(.*)$', 1) AS key,
       regexp_extract(url, '([^/]+)$', 1) AS filename
FROM (
  SELECT p_partkey,
         's3://bucket-' || CAST(CAST(p_partkey % 5 AS INT) AS STRING)
         || '/parts/deep/p_' || CAST(p_partkey AS STRING) || '.tif' AS url
  FROM part
) t
"""


@query("c7_url_parse", _URL_PARSE)
def url_parse_q(spark, sf_dir):
    """C7/C8: urlparse semantics via the engine's URL scalars (the oracle
    uses the equivalent regexes — DuckDB has no parse_url)."""
    from cloud_optimized_data_pipelines_spark.functions.ids import path_basename
    from cloud_optimized_data_pipelines_spark.functions.urls import url_bucket, url_key

    t = load_tables(spark, sf_dir)
    url = F.concat(
        F.lit("s3://bucket-"),
        (F.col("p_partkey") % 5).cast("int").cast("string"),
        F.lit("/parts/deep/p_"),
        F.col("p_partkey").cast("string"),
        F.lit(".tif"),
    )
    return t["part"].select(
        "p_partkey",
        url_bucket(url).alias("bucket"),
        url_key(url).alias("key"),
        path_basename(url).alias("filename"),
    )


_ARRAY_EXTENT = """
SELECT vec_id,
       list_min(embedding) AS dim_min,
       list_max(embedding) AS dim_max,
       CAST(len(embedding) AS BIGINT) AS n_dims
FROM embeddings
"""


@query("a1_array_extent", _ARRAY_EXTENT)
def array_extent_q(spark, sf_dir):
    """A1: min/max over array columns (the raster-extent analog,
    cogify/handler.py:96-101) — array_min/array_max, no UDF."""
    t = load_tables(spark, sf_dir)
    return t["embeddings"].select(
        "vec_id",
        F.array_min("embedding").alias("dim_min"),
        F.array_max("embedding").alias("dim_max"),
        F.size("embedding").cast("long").alias("n_dims"),
    )


_GRANULE_ENRICH = """
WITH ev AS (
  SELECT 'G' || CAST(o_orderkey AS STRING) AS granule_id, o_orderkey
  FROM orders WHERE o_orderkey % 3 = 0
), g AS (
  SELECT 'G' || CAST(o_orderkey AS STRING) AS granule_id,
         o_orderdate AS time_start,
         o_orderdate + INTERVAL 1 DAY AS time_end
  FROM orders WHERE o_orderkey % 6 = 0
)
SELECT ev.o_orderkey, g.time_start AS start_datetime, g.time_end AS end_datetime
FROM ev LEFT JOIN g ON g.granule_id = ev.granule_id
"""


@query("j3_granule_enrichment", _GRANULE_ENRICH)
def granule_enrichment_q(spark, sf_dir):
    """J3: CMR metadata enrichment as a broadcast left join filling item
    datetimes from granule temporal ranges (only half the events have a
    matching granule — the others stay NULL)."""
    from cloud_optimized_data_pipelines_spark.operators.build_stac import (
        enrich_from_granules,
    )

    t = load_tables(spark, sf_dir)
    okey = F.col("o_orderkey")
    events = (
        t["orders"]
        .filter(okey % 3 == 0)
        .select(
            F.concat(F.lit("G"), okey.cast("string")).alias("granule_id"),
            "o_orderkey",
            F.lit(None).cast("timestamp_ntz").alias("start_datetime"),
            F.lit(None).cast("timestamp_ntz").alias("end_datetime"),
        )
    )
    granules = (
        t["orders"]
        .filter(okey % 6 == 0)
        .select(
            F.concat(F.lit("G"), okey.cast("string")).alias("granule_id"),
            F.col("o_orderdate").alias("time_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("time_end"),
        )
    )
    out = enrich_from_granules(events, granules)
    return out.select("o_orderkey", "start_datetime", "end_datetime")


_ROLLUP_MERGE = """
SELECT
  date_trunc('hour', ts) AS bucket,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
    / COUNT(*) AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@query("rollup_hourly_merge", _ROLLUP_MERGE)
def rollup_hourly_merge_q(spark, sf_dir):
    """Hypertable-style continuous aggregate (operators/rollup.py): a
    materialized-history partial rollup merged with a fresh raw-tail
    rollup.  The oracle is the DIRECT aggregation over all raw rows —
    proving the mergeable-state path (count/decimal-sum/min/max partials,
    avg re-derived post-merge) is exact, including the cutoff landing
    mid-bucket so the same hour exists in both partials."""
    from cloud_optimized_data_pipelines_spark.operators.rollup import (
        continuous_aggregate,
    )

    t = load_tables(spark, sf_dir)
    out = continuous_aggregate(t["events"], "2024-01-25 13:30:00")
    return out.withColumn(
        "total_value", F.col("total_value").cast("double")
    )


_KMV_UNIQUES = """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
), s AS (
  SELECT event_type, list_sort(list(hv))[1:64] AS kmv
  FROM h GROUP BY event_type
), x AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uniques
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
)
SELECT s.event_type,
       CASE WHEN len(kmv) < 64 THEN CAST(len(kmv) AS DOUBLE)
            ELSE 63.0 * 4294967296.0 / CAST(kmv[64] AS DOUBLE) END AS est_uniques,
       x.exact_uniques
FROM s JOIN x USING (event_type)
"""


@query("sketch_kmv_uniques", _KMV_UNIQUES)
def sketch_kmv_uniques_q(spark, sf_dir):
    """KMV distinct sketch (operators/sketches.py): Spark builds DAILY
    partial sketches and merges them; the oracle builds the sketch in
    ONE pass.  They hash-match because k-smallest-of-distinct-union is
    exactly mergeable — the cross-engine proof that the rollup path
    loses nothing.  exact_uniques rides along for scale context."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    daily = SK.kmv_partial(
        ev.withColumn("day", F.to_date("ts")),
        "user_id",
        dims=("event_type", "day"),
        k=64,
    )
    merged = SK.kmv_merge(daily, dims=("event_type",), k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_uniques")
    )
    return merged.select(
        "event_type", SK.kmv_estimate("kmv", k=64).alias("est_uniques")
    ).join(F.broadcast(exact), "event_type")


_CMS_HEAVY = """
WITH ints AS (SELECT unnest(range(4)) AS i),
cells AS (
  SELECT i,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS bucket,
         COUNT(*) AS c
  FROM events, ints
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2
), top AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT 20
), probes AS (
  SELECT t.user_id, t.exact_n, ints.i,
         ('0x' || substr(md5(CAST(ints.i AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS bucket
  FROM top t, ints
)
SELECT p.user_id, p.exact_n, CAST(MIN(s.c) AS BIGINT) AS cms_estimate
FROM probes p JOIN cells s ON s.i = p.i AND s.bucket = p.bucket
GROUP BY p.user_id, p.exact_n
"""


@query("sketch_cms_heavy_hitters", _CMS_HEAVY)
def sketch_cms_heavy_q(spark, sf_dir):
    """Count-min sketch built AS a DataFrame (4×512 counter grid,
    portable md5 hash family) probed for the top-20 users.  Estimates —
    not just bounds — hash-match the oracle because both engines build
    the identical sketch.  cms_estimate ≥ exact_n always (collisions
    only ever add)."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    sketch = SK.cms_build(ev, "user_id", depth=4, width=512)
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    return SK.cms_probe(sketch, top, "user_id", depth=4, width=512)


_HLL_PORTABLE = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id IS NOT NULL
),
h AS (
  SELECT event_type, day,
         ('0x' || substr(md5(k), 1, 3))::BIGINT AS bucket,
         ('0x' || substr(md5(k), 4, 13))::BIGINT AS w
  FROM ev
),
daily AS (
  SELECT event_type, day, bucket,
         MAX(CASE WHEN w = 0 THEN 53
                  ELSE 53 - length(bin(w)) END) AS register
  FROM h GROUP BY event_type, day, bucket
),
merged AS (
  SELECT event_type, bucket, MAX(register) AS register
  FROM daily GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS present,
         list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list(struct_pack(b := bucket, r := register))),
               s -> 1.0 / power(2.0, s.r::DOUBLE))),
           (a, b) -> a + b) AS s_present
  FROM merged GROUP BY event_type
),
est AS (
  SELECT event_type, present,
         (4096.0 - present) + s_present AS s,
         CAST(4096 - present AS BIGINT) AS zeros
  FROM agg
),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
)
SELECT e.event_type,
       round(CASE WHEN 12098218.894406674 / e.s <= 10240.0 AND e.zeros > 0
                  THEN 4096.0 * ln(4096.0 / e.zeros::DOUBLE)
                  ELSE 12098218.894406674 / e.s END, 6) AS distinct_est,
       e.present AS buckets_used,
       e.zeros AS empty_buckets,
       x.n_exact
FROM est e JOIN ex x USING (event_type)
"""


@query("sketch_hll_portable", _HLL_PORTABLE)
def sketch_hll_portable_q(spark, sf_dir):
    """PORTABLE own-implementation HyperLogLog (operators/sketches.py::
    portable_hll_registers/portable_hll_estimate, r10): per-day
    register partials MERGED across days by GROUP BY + MAX — the
    sketch's defining mergeability, the production distinct-count
    rollup shape — with every step (md5 bucketing, 52-bit rank,
    power-of-two fold in bucket order, linear-counting correction)
    exactly replayed by the DuckDB oracle.  The DataSketches twin
    (sketch_hll_daily_uniques) keeps the opaque-binary production
    path; THIS query puts the HLL math itself under the value hash,
    with the exact distinct count joined alongside as the
    self-audit."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    daily = SK.portable_hll_registers(
        ev.withColumn("day", F.to_date("ts")),
        "user_id",
        dims=("event_type", "day"),
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("register").alias("register")
    )
    est = SK.portable_hll_estimate(merged, dims=("event_type",))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "distinct_est",
        "buckets_used",
        "empty_buckets",
        "n_exact",
    )


_HLL_SLIDING = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id IS NOT NULL
),
h AS (
  SELECT event_type, day,
         ('0x' || substr(md5(k), 1, 3))::BIGINT AS bucket,
         ('0x' || substr(md5(k), 4, 13))::BIGINT AS w
  FROM ev
),
daily AS (
  SELECT event_type, day, bucket,
         MAX(CASE WHEN w = 0 THEN 53
                  ELSE 53 - length(bin(w)) END) AS register
  FROM h GROUP BY event_type, day, bucket
),
fan AS (
  SELECT event_type, day + CAST(o.off AS INT) AS window_end,
         bucket, register
  FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
),
merged AS (
  SELECT event_type, window_end, bucket, MAX(register) AS register
  FROM fan GROUP BY event_type, window_end, bucket
),
agg AS (
  SELECT event_type, window_end,
         CAST(COUNT(*) AS BIGINT) AS present,
         list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list(struct_pack(b := bucket, r := register))),
               s -> 1.0 / power(2.0, s.r::DOUBLE))),
           (a, b) -> a + b) AS s_present
  FROM merged GROUP BY event_type, window_end
),
est AS (
  SELECT event_type, window_end, present,
         (4096.0 - present) + s_present AS s,
         CAST(4096 - present AS BIGINT) AS zeros
  FROM agg
)
SELECT event_type,
       window_end,
       round(CASE WHEN 12098218.894406674 / s <= 10240.0 AND zeros > 0
                  THEN 4096.0 * ln(4096.0 / zeros::DOUBLE)
                  ELSE 12098218.894406674 / s END, 6) AS distinct_est,
       present AS buckets_used,
       zeros AS empty_buckets
FROM est
"""


@query("sketch_hll_daily_uniques", _HLL_SLIDING)
def sketch_hll_daily_q(spark, sf_dir):
    """Sliding 7-day distinct-user rollup from DAILY portable-HLL
    register partials (operators/sketches.py::portable_hll_sliding,
    r12 — closes the VERDICT r11 rows-only gap by putting the daily
    rollup under the value hash): daily registers are computed ONCE,
    then each fans out to the 7 window-ends it contributes to and a
    GROUP BY + MAX merges — W-day uniques for every day from one scan
    of a register table bounded by dims x 2^p rows, instead of
    re-scanning W days of raw events per window (the production
    rollup shape at 100 TB).  Every step is md5 + integer arithmetic
    the DuckDB oracle replays exactly; the left-fold sum and 6-digit
    round follow sketch_hll_portable (the JVM-vs-libm ln ulp trap).
    The opaque DataSketches path (hll_sketch_agg / hll_union_agg)
    stays covered by operators/sketches.py::hll_partial +
    test_sketches.py accuracy gates."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    daily = SK.portable_hll_registers(
        ev.withColumn("day", F.to_date("ts")),
        "user_id",
        dims=("event_type", "day"),
    )
    sliding = SK.portable_hll_sliding(
        daily, "day", dims=("event_type",), window=7
    )
    est = SK.portable_hll_estimate(
        sliding, dims=("event_type", "window_end")
    )
    return est.select(
        "event_type",
        "window_end",
        "distinct_est",
        "buckets_used",
        "empty_buckets",
    )


_STRATIFIED = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 <
      CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 8000 ELSE 10000 END
"""


@query("sample_stratified_docs", _STRATIFIED)
def sample_stratified_docs_q(spark, sf_dir):
    """Training-mix rebalancing (operators/sampling.py): deterministic
    per-language downsampling — 30% of the English majority, 80% of zh,
    everything else kept.  Threshold-on-md5 construction: reproducible
    across engines AND nested (raising a rate only ever adds rows)."""
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        sample_stratified,
    )

    t = load_tables(spark, sf_dir)
    return sample_stratified(
        t["documents"], "doc_id", "lang", {"en": 0.3, "zh": 0.8}
    ).select("doc_id", "lang", "source")


_CHUNKS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
), st AS (
  SELECT doc_id, t,
         UNNEST(range(0,
                      GREATEST(CAST(ceil((len(t) - 64) / 48.0) AS BIGINT), 0) * 48 + 1,
                      48)) AS start
  FROM toks
)
SELECT doc_id,
       CAST(start // 48 AS BIGINT) AS chunk_idx,
       array_to_string(t[start + 1 : start + 64], ' ') AS chunk_text,
       CAST(LEAST(64, len(t) - start) AS BIGINT) AS n_tokens
FROM st
"""


@query("text_chunk_sliding", _CHUNKS)
def text_chunk_sliding_q(spark, sf_dir):
    """Sliding-window chunking (operators/packing.py): 64-token windows,
    stride 48 (16 overlap), as pure tokenize-once + explode-starts +
    slice — map-side only, no shuffle, no Python."""
    from cloud_optimized_data_pipelines_spark.operators.packing import (
        chunk_documents,
    )

    t = load_tables(spark, sf_dir)
    return chunk_documents(t["documents"], size=64, overlap=16)


_PACKS = """
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, n_tokens, shard,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_offset
FROM c
"""


@query("text_pack_sequences", _PACKS)
def text_pack_sequences_q(spark, sf_dir):
    """Sequence packing (operators/packing.py): concat-and-split into
    512-token budgets across 16 hash-sharded streams.  The global
    cumsum (single-partition window, the scale trap) is replaced by
    per-shard windows — bounded partitions, same training semantics."""
    from cloud_optimized_data_pipelines_spark.operators.packing import (
        pack_documents,
    )

    t = load_tables(spark, sf_dir)
    return pack_documents(t["documents"], budget=512, n_shards=16)


_HIST_PCT = """
WITH base AS (
  SELECT l_returnflag,
         CAST(l_extendedprice * 100 AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT l_returnflag,
         LEAST(511, GREATEST(0, (cents - 90000) * 512 // 10910001))
             AS bucket
  FROM base
),
parts AS (
  SELECT l_returnflag, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY l_returnflag, bucket
),
cum AS (
  SELECT l_returnflag, bucket, n,
         CAST(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket)
              AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY l_returnflag) AS BIGINT)
             AS n_rows,
         CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
             AS buckets_used
  FROM parts
)
SELECT l_returnflag,
       CAST(90000 + (MIN(CASE WHEN cum >= (n_rows * 50 + 99) // 100
                              THEN bucket END) * 2 + 1) * 10910001
            // 1024 AS BIGINT) AS p50_est,
       CAST(90000 + (MIN(CASE WHEN cum >= (n_rows * 95 + 99) // 100
                              THEN bucket END) * 2 + 1) * 10910001
            // 1024 AS BIGINT) AS p95_est,
       MIN(buckets_used) AS buckets_used,
       MIN(n_rows) AS n_rows
FROM cum GROUP BY l_returnflag
"""


@query("agg_approx_percentile", _HIST_PCT)
def agg_approx_percentile_q(spark, sf_dir):
    """Mergeable approximate percentiles as a PORTABLE fixed-bin
    histogram summary (operators/sketches.py::histogram_quantile_*,
    r12 — closes the VERDICT r11 rows-only gap): order-dependent
    GK/KLL/t-digest state can never hash-match across engines, but a
    fixed-domain integer histogram is deterministic, merges by
    GROUP BY + SUM (dims x 512 rows regardless of input — the 100 TB
    summary shape where an exact percentile is a full global sort),
    and carries a fixed +-span/1024 error bound.  Domain: lineitem
    extended price in integer cents over [900.00, 110000.00].  Every
    step is integer arithmetic replayed exactly by the oracle.
    Spark's native percentile_approx (GK) stays pytest-gated for
    accuracy in test_sketches.py."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "cents", F.expr("CAST(l_extendedprice * 100 AS BIGINT)")
    )
    parts = SK.histogram_quantile_partials(
        li, "cents", dims=("l_returnflag",),
        lo=90000, hi=11000000, buckets=512,
    )
    est = SK.histogram_quantile_estimate(
        parts, dims=("l_returnflag",),
        lo=90000, hi=11000000, buckets=512, percents=(50, 95),
    )
    return est.select(
        "l_returnflag", "p50_est", "p95_est", "buckets_used", "n_rows"
    )


_BPE_PAIRS = """
WITH words AS (
  SELECT UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
  FROM documents
), pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair
  FROM words, LATERAL (SELECT UNNEST(range(1, len(w))) AS i) t
  WHERE len(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 30
"""


@query("text_bpe_pair_counts", _BPE_PAIRS)
def text_bpe_pair_counts_q(spark, sf_dir):
    """The statistics step of BPE tokenizer training: corpus-wide
    counts of adjacent symbol pairs inside words (the pair with the
    max count becomes the next merge rule).  Pure columns: tokenize →
    explode words → explode substring pairs → one hash agg + top-k.
    A full training loop is this aggregation per merge iteration, with
    the chosen merge applied via regexp_replace — each iteration one
    scan + one shuffle of pair-sized rows, nothing driver-side except
    the argmax."""
    t = load_tables(spark, sf_dir)
    words = (
        t["documents"]
        .select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_PII_REDACT = f"""
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact bob@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.42.7' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' call 415-555-1234' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_IP_RE}', '<IP>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM seeded
"""


@query("text_pii_redact", _PII_REDACT)
def text_pii_redact_q(spark, sf_dir):
    """Corpus PII scrubbing: email/IP/phone redaction + per-doc counts,
    all regexp_replace/regexp_count columns (Java and RE2 agree on
    these character-class patterns — part of the oracle contract).  The
    synthetic corpus carries no PII, so deterministic markers are
    planted on id-modulo rows IN BOTH ENGINES, making the counts and
    the redacted-text md5 a real cross-engine check."""
    t = load_tables(spark, sf_dir)
    did = F.col("doc_id")
    seeded = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 7 == 0, F.lit(" contact bob@example.com")).otherwise(""),
            F.when(did % 11 == 0, F.lit(" from 10.0.42.7")).otherwise(""),
            F.when(did % 13 == 0, F.lit(" call 415-555-1234")).otherwise(""),
        ).alias("text"),
    )
    txt = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.regexp_count(txt, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(txt, F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.regexp_count(txt, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


_INCR_DEDUP = """
WITH corpus AS (
  SELECT md5(text) AS d FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1
), batch AS (
  SELECT doc_id, lang, md5(text) AS d FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 100000, lang, md5(text) FROM documents WHERE doc_id % 8 = 1
  UNION ALL
  SELECT doc_id + 200000, lang, md5(text) FROM documents WHERE doc_id % 16 = 4
), fresh AS (
  SELECT b.doc_id, b.lang, b.d FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.d = b.d)
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY d ORDER BY doc_id) AS rn
  FROM fresh
) t WHERE rn = 1
"""


@query("dedup_incremental", _INCR_DEDUP)
def dedup_incremental_q(spark, sf_dir):
    """Continual-ingest dedup (operators/dedup.py::incremental_dedup):
    a new batch is anti-joined against the distinct digest set of the
    historical corpus, then first-per-digest within the batch.  History
    is never re-deduped; only digests shuffle.

    The fixture is scale-proportional (modular split, nonzero at every
    sf) and exercises all three paths: re-ingested history dups
    (doc_id%8==1, shifted ids — dropped by the anti-join), in-batch
    dups (doc_id%16==4 shifted — dropped by first-per-digest), and
    genuinely new docs (doc_id%4==0 — survive)."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        incremental_dedup,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang", "text")
        .unionAll(
            docs.filter(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "lang", "text"
            )
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 16 == 4).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "lang", "text"
            )
        )
    )
    return incremental_dedup(batch, corpus, "text", "doc_id").select(
        "doc_id", "lang"
    )


def _bpe_unrolled_ctes(n_merges: int) -> str:
    """The BPE training loop unrolled as chained DuckDB CTEs (the
    PageRank / LSH-reachability fixpoint-oracle pattern): v0 is the
    distinct-word vocab with character symbol lists; each iteration i
    picks the corpus-weighted argmax adjacent pair (r{i}, ties broken
    count desc then pair lexicographic — Spark's exact order) and
    rewrites every word's symbols (v{i}).

    The rewrite uses a delimiter encoding that makes the Spark side's
    leftmost-first non-overlapping merge fold a plain string replace:
    each symbol is individually wrapped in U+001F
    ("\\x1fa\\x1f\\x1fb\\x1f..."), so replace(s, wrap(a)||wrap(b),
    wrap(a||b)) scans left to right without occurrences sharing
    characters — exactly the fold semantics (a merged symbol cannot
    re-trigger its own rule in-pass since a||b != a).  U+001F never
    occurs in the corpus (whitespace-tokenized text); v0 would simply
    split wrong and the row-count/hash gate would catch it."""
    d = "chr(31)"
    dd = f"{d} || {d}"
    ctes = [
        """v0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         list_transform(range(1, len(word) + 1),
                        i -> substr(word, CAST(i AS INT), 1)) AS syms
  FROM (
    SELECT UNNEST(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                              x -> x <> '')) AS word
    FROM documents
  ) GROUP BY word
)"""
    ]
    for it in range(1, n_merges + 1):
        ctes.append(
            f"""r{it} AS (
  SELECT a, b FROM (
    SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b, freq
    FROM v{it - 1},
         LATERAL (SELECT UNNEST(range(1, len(syms))) AS i) ix
  ) p GROUP BY a, b
  ORDER BY SUM(freq) DESC, a, b LIMIT 1
)"""
        )
        s = f"{d} || array_to_string(syms, {dd}) || {d}"
        s2 = (
            f"replace({s}, {d} || r{it}.a || {dd} || r{it}.b || {d}, "
            f"{d} || r{it}.a || r{it}.b || {d})"
        )
        ctes.append(
            f"""v{it} AS (
  SELECT word, freq,
         string_split(substr(x.s, 2, len(x.s) - 2), {dd}) AS syms
  FROM v{it - 1}, r{it}, LATERAL (SELECT {s2} AS s) x
)"""
        )
    return ",\n".join(ctes)


def _bpe_merges_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS rank, a AS \"left\", b AS \"right\","
        f" a || b AS merged FROM r{i + 1}"
        for i in range(8)
    )
    return f"WITH {_bpe_unrolled_ctes(8)}\n{rows}"


@query("text_bpe_merges", _bpe_merges_sql)
def text_bpe_merges_q(spark, sf_dir):
    """Full BPE tokenizer training (operators/bpe.py): 8 merge rules
    learned over the documents corpus.  Iterative algorithm (argmax
    collect per iteration, like IVF's Lloyd step), but DETERMINISTIC —
    ties break count desc then pair lexicographic — so the whole loop
    is oracle-backed by an unrolled-CTE DuckDB fixpoint
    (_bpe_unrolled_ctes): 8 chained argmax+rewrite stages whose merge
    rewrite replays the Spark fold as a delimiter-wrapped string
    replace.  Exact parity with a pure-Python reference BPE is also
    pytest-gated (test_bpe.py).  Iterations run on the distinct-WORD
    table, not the corpus — the reason this is tractable at 100 TB."""
    from cloud_optimized_data_pipelines_spark.operators.bpe import bpe_train

    t = load_tables(spark, sf_dir)
    rules, _vocab = bpe_train(t["documents"], n_merges=8)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(rules)],
        "rank int, left string, right string, merged string",
    )


_WINDOW_RANKS = """
SELECT c_custkey,
       c_mktsegment,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST() OVER w AS cdist,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       LEAD(c_custkey, 1) OVER w AS next_custkey,
       FIRST_VALUE(c_custkey) OVER w AS top_custkey
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@query("window_rank_functions", _WINDOW_RANKS)
def window_rank_functions_q(spark, sf_dir):
    """The full analytic-ranking surface in one pass: rank/dense_rank/
    percent_rank/cume_dist/ntile/lead/first_value share ONE window
    frame, so Catalyst plans a single sort per partition — adding
    functions to a shared frame is free at scale, re-sorting per
    function is not."""
    load_tables(spark, sf_dir)
    return spark.sql(_WINDOW_RANKS)


def _bpe_encode_stats_sql() -> str:
    """Oracle for text_bpe_encode_stats: the 8 unrolled training CTEs
    feed an UNROLLED ENCODER — per word, wrap the characters in the
    U+001F delimiter encoding and replay the 8 merge replaces in rule
    order (each rule row cross-joined in), then count symbols as
    delimiter-chars/2 (every symbol carries exactly two wrappers)."""
    d = "chr(31)"
    dd = f"{d} || {d}"
    enc = (
        f"{d} || array_to_string(list_transform(range(1, len(w) + 1), "
        f"i -> substr(w, CAST(i AS INT), 1)), {dd}) || {d}"
    )
    for i in range(1, 9):
        enc = (
            f"replace({enc}, {d} || r{i}.a || {dd} || r{i}.b || {d}, "
            f"{d} || r{i}.a || r{i}.b || {d})"
        )
    rjoins = ", ".join(f"r{i}" for i in range(1, 9))
    return f"""WITH {_bpe_unrolled_ctes(8)}
SELECT doc_id,
       CAST(len(regexp_replace(COALESCE(text, ''), '\\s+', '', 'g'))
            AS BIGINT) AS n_chars,
       CAST(COALESCE(list_sum(list_transform(
         list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                     x -> x <> ''),
         w -> (len({enc}) - len(replace({enc}, {d}, ''))) // 2
       )), 0) AS BIGINT) AS n_bpe_tokens
FROM documents, {rjoins}
"""


@query("text_bpe_encode_stats", _bpe_encode_stats_sql)
def text_bpe_encode_stats_q(spark, sf_dir):
    """Train-then-apply: learn 8 merges, re-tokenize the corpus with
    the compiled single-expression encoder (operators/bpe.py::
    bpe_encode — map-only, no shuffle), report per-doc compression.
    Now oracle-backed end-to-end: the DuckDB side unrolls BOTH the
    training fixpoint and the encoder (see _bpe_encode_stats_sql);
    encoder parity with the trained vocab is also pytest-gated."""
    from cloud_optimized_data_pipelines_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    t = load_tables(spark, sf_dir)
    rules, _ = bpe_train(t["documents"], n_merges=8)
    enc = bpe_encode("text", rules)
    return t["documents"].select(
        "doc_id",
        F.length(F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", ""))
        .cast("long")
        .alias("n_chars"),
        F.size(enc).cast("long").alias("n_bpe_tokens"),
    )


_ROLLUP_CASCADE = """
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
    / COUNT(*) AS avg_value
FROM events
GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP), event_type
"""


@query("rollup_cascade_daily", _ROLLUP_CASCADE)
def rollup_cascade_daily_q(spark, sf_dir):
    """Grain cascade (operators/rollup.py::cascade_rollup): the DAILY
    aggregate is derived from HOURLY partials by re-truncation +
    partial re-aggregation — the raw table is scanned once for the
    hourly grain and never again.  Oracle = direct daily aggregation
    over raw rows, proving the cascade is exact."""
    from cloud_optimized_data_pipelines_spark.operators.rollup import (
        cascade_rollup,
        hourly_rollup,
        merge_rollups,
    )

    t = load_tables(spark, sf_dir)
    hourly = hourly_rollup(t["events"])
    out = merge_rollups(cascade_rollup(hourly, "day"))
    return out.withColumn(
        "total_value", F.col("total_value").cast("double")
    )


_FUNNEL = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(COUNT(t_view) AS BIGINT) AS stage_view,
  CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS stage_click,
  CAST(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS BIGINT) AS stage_purchase
FROM stages
"""


@query("events_funnel_conversion", _FUNNEL)
def events_funnel_q(spark, sf_dir):
    """Ordered funnel (view → click → purchase): first-touch timestamps
    per stage in ONE conditional aggregation pass, then ordering
    predicates — no per-stage self-joins (the naive 3-way join shuffles
    the fact three times; this shuffles user-sized rows once)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    first = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    ordered_click = F.col("t_click") > F.col("t_view")
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("stage_view"),
        F.count(F.when(ordered_click, 1)).alias("stage_click"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & ordered_click, 1)
        ).alias("stage_purchase"),
    )


_RETENTION = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         f.cohort_day,
         date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS TIMESTAMP)) AS day_offset
  FROM events e JOIN firsts f USING (user_id)
  WHERE e.user_id IS NOT NULL
)
SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
WHERE day_offset IN (0, 1, 7)
GROUP BY cohort_day, day_offset
"""


@query("events_retention_cohorts", _RETENTION)
def events_retention_q(spark, sf_dir):
    """Cohort retention (D0/D1/D7): cohort = first active day per user
    (one agg), activity joined back on the user key — both shuffles are
    user-sized, the fact is scanned twice but never self-joined on
    time.  Day arithmetic via datediff, identical in both engines."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_day", F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count("*").alias("active_users"))
    )


_MODERN_AGGS = """
WITH agg AS (
  SELECT event_type,
         CAST(count_if(value > 100) AS BIGINT) AS n_big,
         median(value) AS med_value
  FROM events WHERE user_id IS NOT NULL
  GROUP BY event_type
), best AS (
  SELECT event_type, user_id AS biggest_user FROM (
    SELECT event_type, user_id,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id DESC) AS rn
    FROM events WHERE user_id IS NOT NULL
  ) t WHERE rn = 1
)
SELECT agg.event_type, agg.n_big, agg.med_value, best.biggest_user
FROM agg JOIN best USING (event_type)
"""


@query("agg_modern_functions", _MODERN_AGGS)
def agg_modern_functions_q(spark, sf_dir):
    """Modern aggregate surface: count_if, exact median (==
    percentile_cont 0.5, bit-identical to DuckDB median on doubles),
    and deterministic max_by via a (value, event_id) struct key —
    struct comparison breaks value ties by the unique event id, which
    the oracle mirrors with a ROW_NUMBER window."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.median("value").alias("med_value"),
        F.max_by("user_id", F.struct("value", "event_id")).alias("biggest_user"),
    )


_TOKEN_MIX = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS rnk
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY rnk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         CASE WHEN source = 'src0' THEN 1000 ELSE 500 END AS budget
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens - n_tokens < budget
"""


@query("sample_token_budget_mix", _TOKEN_MIX)
def sample_token_budget_mix_q(spark, sf_dir):
    """Training-mixture construction (operators/sampling.py::
    token_budget_mix): per-source token budgets filled greedily over
    the deterministic md5-rank order — one window shuffle, exact
    BIGINT cumulative sums, no RNG.  src0 gets a 1000-token budget,
    every other source 500 (binding at sf0.01: each source holds ~1.4k
    tokens, so roughly a third of each survives — the filter is
    exercised, not vacuous)."""
    from cloud_optimized_data_pipelines_spark.functions.text import token_count
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        token_budget_mix,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    )
    out = token_budget_mix(
        docs, "doc_id", "n_tokens", "source",
        budgets={"src0": 1000}, default_budget=500,
    )
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


_CAP_PER_SOURCE = """
SELECT doc_id, source, CAST(rn AS BIGINT) AS rank_in_group
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) t WHERE rn <= 15
"""


@query("sample_cap_per_source", _CAP_PER_SOURCE)
def sample_cap_per_source_q(spark, sf_dir):
    """Per-domain contribution cap (operators/sampling.py::
    cap_per_group): at most 15 docs per source, selected by the
    deterministic md5 permutation — the C4/RefinedWeb rule that stops
    megasites from dominating a training mix.  Runs as the two-pass
    bucket cumsum (a cap is a unit-weight token budget), so a hot
    domain never serializes through one window task; the oracle states
    the same cap as the naive ROW_NUMBER form."""
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        cap_per_group,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "source")
    out = cap_per_group(docs, "doc_id", "source", max_per_group=15)
    return out.select("doc_id", "source", "rank_in_group")


# shared CTE chain: per-doc unigram log-prob (term-level round-to-9 —
# JVM Math.log vs libm ln differ by 1 ulp on a few percent of
# arguments; see operators/quality.py::unigram_logprob)
_UNIGRAM_CTES = """
words AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
vocab AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
scored AS (
  SELECT doc_id, word,
         round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 9) AS logp
  FROM words JOIN vocab USING (word) CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         list_reduce(
           list_transform(
             list_sort(list(struct_pack(w := word, l := logp))), s -> s.l),
           (a, b) -> a + b) AS sum_logp
  FROM scored GROUP BY doc_id
)
"""

_UNIGRAM_LP = f"""
WITH {_UNIGRAM_CTES.strip()}
SELECT doc_id, n_tokens, sum_logp / CAST(n_tokens AS DOUBLE) AS mean_logprob
FROM per_doc
"""


@query("text_unigram_logprob", _UNIGRAM_LP)
def text_unigram_logprob_q(spark, sf_dir):
    """CCNet-style LM quality proxy (operators/quality.py::
    unigram_logprob): mean log-prob under the corpus's own unigram
    distribution.  Engineered float determinism: log of exact integer
    ratios, summed by a left fold over the token-SORTED array on both
    engines (a plain SUM() would be shuffle-order-dependent and could
    differ in the last ulp)."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        unigram_logprob,
    )

    t = load_tables(spark, sf_dir)
    return unigram_logprob(t["documents"], "doc_id", "text")


_BIGRAM_BACKOFF = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
bi AS (
  SELECT doc_id, lang,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bgs
  FROM toks
),
train_bi AS (SELECT UNNEST(bgs) AS bg FROM bi WHERE lang = 'en'),
bcnt AS (SELECT bg, COUNT(*) AS bcnt FROM train_bi GROUP BY bg),
ctx AS (SELECT string_split(bg, ' ')[1] AS w1, COUNT(*) AS ccnt
        FROM train_bi GROUP BY 1),
train_w AS (SELECT UNNEST(tk) AS w2 FROM toks WHERE lang = 'en'),
uni AS (SELECT w2, COUNT(*) AS ucnt FROM train_w GROUP BY w2),
tot AS (SELECT SUM(ucnt) AS total FROM uni),
doc_bi AS (SELECT doc_id, UNNEST(bgs) AS bg FROM bi),
scored AS (
  SELECT doc_id, bg,
         CASE WHEN bcnt.bcnt IS NOT NULL
              THEN round(ln(CAST(bcnt.bcnt AS DOUBLE) / CAST(ctx.ccnt AS DOUBLE)), 9)
              ELSE round(ln(0.4 * (CAST(COALESCE(uni.ucnt, 1) AS DOUBLE)
                                   / CAST(tot.total AS DOUBLE))), 9)
         END AS logp
  FROM doc_bi
  LEFT JOIN bcnt USING (bg)
  LEFT JOIN ctx ON string_split(doc_bi.bg, ' ')[1] = ctx.w1
  LEFT JOIN uni ON string_split(doc_bi.bg, ' ')[-1] = uni.w2
  CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         list_reduce(
           list_transform(
             list_sort(list(struct_pack(b := bg, l := logp))), s -> s.l),
           (a, b) -> a + b) AS sum_logp
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       p.sum_logp / CAST(p.n_bigrams AS DOUBLE) AS mean_logprob
FROM (SELECT doc_id FROM documents) d LEFT JOIN per_doc p USING (doc_id)
"""


@query("text_bigram_backoff", _BIGRAM_BACKOFF)
def text_bigram_backoff_q(spark, sf_dir):
    """Held-out bigram LM with stupid backoff (operators/quality.py::
    bigram_logprob): the model is estimated on the English slice only,
    so scoring the full multilingual corpus genuinely exercises all
    three probability paths — seen bigram, unigram backoff, and the
    unseen-word floor (a same-corpus model would never back off).
    Same engineered float determinism as text_unigram_logprob."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        bigram_logprob,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    return bigram_logprob(
        docs, "doc_id", "text", train=docs.filter(F.col("lang") == "en")
    )


_DSIR_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
featarr AS (
  SELECT doc_id, lang,
         list_concat(tk,
           CASE WHEN len(tk) >= 2
                THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
                ELSE CAST([] AS VARCHAR[]) END) AS fs
  FROM toks
),
rawg AS (SELECT doc_id, UNNEST(fs) AS g FROM featarr),
rawf AS (SELECT doc_id,
                (('0x' || substr(md5(g), 1, 8))::BIGINT) % 10000 AS b
         FROM rawg),
rawdc AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS fc
          FROM rawf GROUP BY doc_id, b),
tgtg AS (SELECT UNNEST(fs) AS g FROM featarr WHERE lang = 'en'),
tgtf AS (SELECT (('0x' || substr(md5(g), 1, 8))::BIGINT) % 10000 AS b FROM tgtg),
tcnt AS (SELECT b, COUNT(*) AS tc FROM tgtf GROUP BY b),
rcnt AS (SELECT b, CAST(SUM(fc) AS BIGINT) AS rc FROM rawdc GROUP BY b),
tt AS (SELECT SUM(tc) AS tn FROM tcnt),
rt AS (SELECT SUM(rc) AS rn FROM rcnt),
scored AS (
  SELECT doc_id, b, fc,
         CAST(fc AS DOUBLE)
         * (round(ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE)
                     / CAST(tn + 10000 AS DOUBLE)), 9)
            - round(ln(CAST(COALESCE(rc, 0) + 1 AS DOUBLE)
                       / CAST(rn + 10000 AS DOUBLE)), 9)) AS lr
  FROM rawdc LEFT JOIN tcnt USING (b) LEFT JOIN rcnt USING (b)
  CROSS JOIN tt CROSS JOIN rt
),
per_doc AS (
  SELECT doc_id, CAST(SUM(fc) AS BIGINT) AS n_feats,
         CAST(CAST(SUM(CAST(round(lr * 1e9) AS BIGINT)) AS BIGINT)
              AS DOUBLE) / 1e9 AS log_weight
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
       p.log_weight
FROM (SELECT doc_id FROM documents) d LEFT JOIN per_doc p USING (doc_id)
"""


@query("sample_dsir_weights", _DSIR_WEIGHTS)
def sample_dsir_weights_q(spark, sf_dir):
    """DSIR importance weights (operators/sampling.py::
    dsir_importance, Xie et al. 2023): log-likelihood ratio of each
    document under hashed-ngram bag models of a target slice (the
    English documents) vs the raw corpus — the data-selection signal
    behind importance-resampled pretraining mixes.  The two feature
    models are bucket-bounded (10k rows) so both model joins broadcast
    regardless of corpus size."""
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        dsir_importance,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # impl='numpy': Arrow gram->bucket memo (bit-exact; the fold path's
    # per-occurrence md5 + (doc, b) groupBy shuffle dominated the
    # bench time)
    return dsir_importance(
        docs, "doc_id", "text", target_filter=F.col("lang") == "en",
        impl="numpy",
    )


_DSIR_SELECT = f"""
WITH dsir AS ({_DSIR_WEIGHTS}),
gk AS (
  SELECT doc_id, n_feats, log_weight,
         round(log_weight
               - round(ln(-round(ln(
                   (CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          % 4294967296) AS DOUBLE) + 0.5) / 4294967296.0
                 ), 9)), 9), 9) AS gumbel_key
  FROM dsir WHERE n_feats > 0
)
SELECT doc_id, n_feats, log_weight, gumbel_key
FROM gk ORDER BY gumbel_key DESC, doc_id LIMIT 100
"""


@query("sample_dsir_select", _DSIR_SELECT)
def sample_dsir_select_q(spark, sf_dir):
    """The selection half of DSIR (operators/sampling.py::
    gumbel_topk): sample 100 docs without replacement proportional to
    exp(log_weight) via deterministic Gumbel-top-k — md5-derived
    uniforms, term-rounded nested logs, TakeOrderedAndProject (k rows
    per partition cross the wire, no corpus sort)."""
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        dsir_importance,
        gumbel_topk,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    w = dsir_importance(
        docs, "doc_id", "text", target_filter=F.col("lang") == "en",
        impl="numpy",
    )
    return gumbel_topk(w.filter(F.col("n_feats") > 0), "doc_id", "log_weight", 100)


_CCNET_BUCKETS = f"""
WITH {_UNIGRAM_CTES.strip()},
lp AS (
  SELECT doc_id, sum_logp / CAST(n_tokens AS DOUBLE) AS mean_logprob
  FROM per_doc
),
cuts AS (
  SELECT quantile_cont(mean_logprob, {1.0 / 3!r}) AS c0,
         quantile_cont(mean_logprob, {2.0 / 3!r}) AS c1
  FROM lp
)
SELECT lp.doc_id, lp.mean_logprob,
       CASE WHEN lp.mean_logprob > c.c1 THEN 'head'
            WHEN lp.mean_logprob > c.c0 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lp CROSS JOIN cuts c
"""


@query("sample_ccnet_buckets", _CCNET_BUCKETS)
def sample_ccnet_buckets_q(spark, sf_dir):
    """CCNet head/middle/tail bucketing (operators/sampling.py::
    perplexity_buckets over quality.unigram_logprob): exact tercile
    cutoffs of the per-doc unigram log-prob, broadcast as a 1-row
    scalar, then a narrow label expression — no corpus-wide sort.
    Doubles are reproducible end-to-end: the log-prob fold is already
    bit-identical cross-engine, and Spark `percentile` interpolates
    identically to DuckDB `quantile_cont` (same fraction literal at
    Python-double precision)."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        unigram_logprob,
    )
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        perplexity_buckets,
    )

    t = load_tables(spark, sf_dir)
    scored = unigram_logprob(t["documents"], "doc_id", "text").select(
        "doc_id", "mean_logprob"
    )
    return perplexity_buckets(scored, "mean_logprob")


_FUZZY_PAIRS = """
WITH pref AS (
  SELECT doc_id, substr(text, 1, 40) AS p FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN length(p) >= 3
         THEN list_distinct(list_transform(range(1, length(p) - 1),
                            i -> substr(p, i, 3)))
         ELSE [p] END AS shingles
  FROM pref
),
idx0 AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
freq AS (SELECT shingle FROM idx0 GROUP BY shingle HAVING COUNT(*) <= 1000),
idx AS (SELECT idx0.* FROM idx0 JOIN freq USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc < b.doc
)
SELECT doc_a, doc_b,
       CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS distance
FROM cand
JOIN pref pa ON pa.doc_id = doc_a
JOIN pref pb ON pb.doc_id = doc_b
WHERE levenshtein(pa.p, pb.p) <= 10
"""


@query("dedup_fuzzy_prefix", _FUZZY_PAIRS)
def dedup_fuzzy_prefix_q(spark, sf_dir):
    """Bounded edit-distance join (operators/dedup.py::fuzzy_pairs):
    doc pairs whose 40-char prefixes are within levenshtein 10 —
    character-3-gram blocking (COMPLETE for these bounds: 40 - 3 + 1 -
    10*3 = 8 shared grams guaranteed, Gravano et al.) then exact
    engine-native levenshtein verification on candidates only.
    Integer distances are bit-identical across engines."""
    t = load_tables(spark, sf_dir)
    return D.fuzzy_pairs(
        t["documents"], "doc_id", "text", max_distance=10, prefix_len=40, q=3
    )


_QUANTILE_SAMPLE = """
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
),
samp AS (SELECT event_type, value FROM ranked WHERE rn <= 64),
est AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.5) AS est_median,
         CAST(COUNT(*) AS BIGINT) AS sample_n
  FROM samp GROUP BY event_type
),
ex AS (
  SELECT event_type, median(CAST(value AS DOUBLE)) AS exact_median
  FROM events GROUP BY event_type
)
SELECT est.event_type, est.sample_n, est.est_median, ex.exact_median
FROM est JOIN ex USING (event_type)
"""


@query("sketch_quantile_sample", _QUANTILE_SAMPLE)
def sketch_quantile_sample_q(spark, sf_dir):
    """Deterministic bottom-k quantile sample (operators/sketches.py::
    kmin_sample_*): the 64 smallest-md5-ranked rows per group are a
    uniform without-replacement sample that is mergeable (k smallest of
    the union) and engine-reproducible — no reservoir RNG.  Spark
    builds DAILY partials and MERGES them; the oracle samples in one
    pass — they hash-match because merge == one-pass, the same
    cross-engine proof as sketch_kmv_uniques.  exact_median rides along
    for error context."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    daily = SK.kmin_sample_partial(
        ev.withColumn("day", F.to_date("ts")),
        "event_id",
        "value",
        dims=("event_type", "day"),
        k=64,
    )
    merged = SK.kmin_sample_merge(daily, dims=("event_type",), k=64)
    est = merged.select(
        "event_type",
        F.size("sample").cast("long").alias("sample_n"),
        SK.kmin_sample_quantile("sample", 0.5).alias("est_median"),
    )
    exact = ev.groupBy("event_type").agg(
        F.median(F.col("value").cast("double")).alias("exact_median")
    )
    return est.join(exact, "event_type")


_FUZZY_GUARD_REPORT = """
WITH pref AS (
  SELECT doc_id, substr(text, 1, 40) AS p FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN length(p) >= 3
         THEN list_distinct(list_transform(range(1, length(p) - 1),
                            i -> substr(p, i, 3)))
         ELSE [p] END AS shingles
  FROM pref
),
idx AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
f AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS freq FROM idx GROUP BY shingle),
per_doc AS (
  SELECT i.doc, CAST(COUNT(*) AS BIGINT) AS grams,
         CAST(SUM(CASE WHEN f.freq > 50 THEN 1 ELSE 0 END) AS BIGINT) AS pruned
  FROM idx i JOIN f USING (shingle) GROUP BY i.doc
)
SELECT CAST(SUM(grams) AS BIGINT) AS total_grams,
       CAST(SUM(pruned) AS BIGINT) AS pruned_grams,
       CAST(SUM(pruned) AS DOUBLE) / CAST(SUM(grams) AS DOUBLE) AS pruned_frac,
       CAST(COUNT(*) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN pruned = grams THEN 1 ELSE 0 END) AS BIGINT) AS docs_zero_grams
FROM per_doc
"""


@query("dedup_fuzzy_guard_report", _FUZZY_GUARD_REPORT)
def dedup_fuzzy_guard_report_q(spark, sf_dir):
    """The guard's alarm channel as a checkable one-row report
    (operators/dedup.py::guard_prune_stats over fuzzy_prefix_index):
    how many q-gram postings a freq-50 guard would drop and how many
    docs lose EVERY gram.  Threshold 50 is deliberately below the
    corpus's common-gram frequencies so the report is exercised, not
    vacuous — a pipeline alarms when pruned_frac nears 1.0 instead of
    reading an empty fuzzy join as clean."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        fuzzy_prefix_index,
        guard_prune_stats,
    )

    t = load_tables(spark, sf_dir)
    idx = fuzzy_prefix_index(t["documents"], "doc_id", "text", 40, 3)
    return guard_prune_stats(idx, 50)


_TOKEN_SHIFT = """
WITH words AS (
  SELECT CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS sl,
         UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
counts AS (
  SELECT word,
         CAST(SUM(CASE WHEN sl = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(SUM(CASE WHEN sl = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM words GROUP BY word
),
scal AS (
  SELECT SUM(cnt_a) AS total_a, SUM(cnt_b) AS total_b,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM counts
)
SELECT word, cnt_a, cnt_b,
       CAST(cnt_a + 1 AS DOUBLE) / CAST(total_a + vocab AS DOUBLE) AS p_a,
       CAST(cnt_b + 1 AS DOUBLE) / CAST(total_b + vocab AS DOUBLE) AS p_b,
       (CAST(cnt_a + 1 AS DOUBLE) / CAST(total_a + vocab AS DOUBLE))
       * (round(ln(CAST(cnt_a + 1 AS DOUBLE) / CAST(total_a + vocab AS DOUBLE)), 9)
          - round(ln(CAST(cnt_b + 1 AS DOUBLE) / CAST(total_b + vocab AS DOUBLE)), 9)) AS kl_term
FROM counts CROSS JOIN scal
"""


@query("text_distribution_shift", _TOKEN_SHIFT)
def text_distribution_shift_q(spark, sf_dir):
    """Corpus drift monitor (operators/drift.py::token_distribution_shift):
    per-token KL(P_src0 || P_rest) contributions with Laplace-smoothed
    probabilities over the union vocab — exact integer counts, single
    divisions, 9-decimal-rounded logs (the cross-engine ln discipline),
    no order-dependent sums (the total is the per-row decomposition's
    sum, foldable in word order when exactness matters)."""
    from cloud_optimized_data_pipelines_spark.operators.drift import (
        token_distribution_shift,
    )

    t = load_tables(spark, sf_dir)
    out = token_distribution_shift(
        t["documents"],
        "text",
        F.when(F.col("source") == "src0", "a").otherwise("b"),
        "a",
        "b",
    )
    return out


# shared CTE chain: guarded positional-shingle span detection (n=8,
# max_shingle_freq=1000) — interpolated into BOTH the spans and the
# cut oracles so the definitions cannot drift apart
_SUBSTR_CTES = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
idx0 AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(tk, i, i + 7), ' ') AS shingle
  FROM toks, UNNEST(range(1, len(tk) - 6)) AS t(i)
),
freq AS (SELECT shingle FROM idx0 GROUP BY shingle HAVING COUNT(*) <= 1000),
idx AS (SELECT idx0.* FROM idx0 JOIN freq USING (shingle)),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
runs AS (
  SELECT *, pos_a - ROW_NUMBER() OVER (
      PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
  FROM m
),
spans AS (
  SELECT doc_a, doc_b,
         MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
         CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diag, grp
)
"""

_SUBSTR_SPANS = f"""
WITH {_SUBSTR_CTES.strip()}
SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans
"""


@query("dedup_substring_spans", _SUBSTR_SPANS)
def dedup_substring_spans_q(spark, sf_dir):
    """ExactSubstr span dedup (operators/dedup.py::duplicate_spans):
    maximal cross-document duplicated word-8-gram runs with positions —
    the cut-the-span operator (Lee et al. 2021), detected with the
    diagonal-run trick (one window + one aggregate, no sequential
    scan).  The shingle self-join runs with the default skew guard
    (max_shingle_freq=1000) and the oracle applies the identical
    HAVING COUNT(*) <= 1000 pruning."""
    t = load_tables(spark, sf_dir)
    return D.duplicate_spans(t["documents"], "doc_id", "text", n=8)


_SUBSTR_CUT = f"""
WITH {_SUBSTR_CTES.strip()},
ivs AS (
  SELECT doc_b AS doc,
         list(struct_pack(s := start_b, e := start_b + span_tokens)) AS ivs
  FROM spans GROUP BY doc_b
),
sel AS (
  SELECT t.doc_id, t.tk, COALESCE(v.ivs, []) AS ivs
  FROM toks t LEFT JOIN ivs v ON v.doc = t.doc_id
),
cutx AS (
  SELECT doc_id, tk,
         list_filter(tk, (x, i) ->
           len(list_filter(ivs, iv -> i >= iv.s AND i < iv.e)) = 0) AS kept
  FROM sel
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens_before,
       CAST(len(kept) AS BIGINT) AS n_tokens_after,
       COALESCE(array_to_string(kept, ' '), '') AS text_dedup
FROM cutx
"""


@query("dedup_substring_cut", _SUBSTR_CUT)
def dedup_substring_cut_q(spark, sf_dir):
    """The CUT step of ExactSubstr dedup (operators/dedup.py::
    cut_duplicate_spans over duplicate_spans): every duplicated
    word-8-gram run is excised from the higher-id document of its pair;
    first occurrences survive.  The oracle rebuilds the cut text
    independently (index-aware list_filter over the same guarded span
    table), so the hash covers the full detect→cut pipeline including
    the rebuilt text bytes."""
    t = load_tables(spark, sf_dir)
    spans = D.duplicate_spans(t["documents"], "doc_id", "text", n=8)
    out = D.cut_duplicate_spans(t["documents"], "doc_id", "text", spans)
    return out.select(
        "doc_id", "n_tokens_before", "n_tokens_after", "text_dedup"
    )


_LINE_DEDUP = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS pos, array_to_string(t[(i*10+1):(i*10+10)], ' ') AS line
  FROM toks, UNNEST(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)
  WHERE len(t) > 0
),
over_freq AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) > 1
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line, (o.line IS NOT NULL) AS rm
  FROM lines l LEFT JOIN over_freq o USING (line)
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT rm), '')
           AS text_dedup
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_lines, 0) AS n_lines,
       COALESCE(p.n_removed, 0) AS n_removed,
       md5(COALESCE(p.text_dedup, '')) AS kept_md5
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@query("dedup_lines", _LINE_DEDUP)
def dedup_lines_q(spark, sf_dir):
    """Corpus-frequency line dedup (operators/dedup.py::line_dedup —
    the RefinedWeb/Dolma boilerplate-removal recipe): any 10-token
    "line" occurring in more than one distinct document is excised
    everywhere; kept lines are re-joined in position order and the md5
    covers the rebuilt bytes.  One global line-frequency table decides
    every removal — no doc-pair reasoning, which is what makes this the
    cheapest cross-document dedup at corpus scale."""
    t = load_tables(spark, sf_dir)
    out = D.line_dedup(
        t["documents"], "doc_id", "text", max_doc_freq=1, line_tokens=10
    )
    return out.select(
        "doc_id", "n_lines", "n_removed", F.md5("text_dedup").alias("kept_md5")
    )


_DUCK_SHINGLES5 = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(tk) >= 5
         THEN list_distinct(list_transform(range(1, len(tk) - 3),
                            i -> array_to_string(list_slice(tk, i, i + 4), ' ')))
         ELSE [array_to_string(tk, ' ')] END AS shingles
  FROM toks
)
"""

_DECONTAMINATE = f"""
WITH {_DUCK_SHINGLES5},
split AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
),
test_sh AS (
  SELECT DISTINCT UNNEST(shingles) AS shingle
  FROM sh JOIN split USING (doc_id) WHERE bucket >= 95
),
train AS (
  SELECT sh.doc_id FROM sh JOIN split USING (doc_id) WHERE bucket < 90
),
hits AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM (SELECT sh.doc_id, UNNEST(shingles) AS shingle
        FROM sh JOIN split USING (doc_id) WHERE bucket < 90) t
  JOIN test_sh USING (shingle)
  GROUP BY t.doc_id
)
SELECT train.doc_id,
       COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM train LEFT JOIN hits USING (doc_id)
"""


@query("text_decontaminate", _DECONTAMINATE)
def text_decontaminate_q(spark, sf_dir):
    """Eval-set decontamination (operators/decontaminate.py): train
    docs (md5 bucket < 90) are flagged when they share any word 5-gram
    with the held-out test split (bucket >= 95) — the GPT-3/Pile
    contamination control.  The test-side shingle set is broadcast; the
    train side pays one scan + a doc-keyed count.  Same deterministic
    split rule as text_train_val_split."""
    from cloud_optimized_data_pipelines_spark.operators.decontaminate import (
        contamination_flags,
    )
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        hash_bucket,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn("bucket", hash_bucket("doc_id"))
    train = docs.filter(F.col("bucket") < 90).select("doc_id", "text")
    test = docs.filter(F.col("bucket") >= 95).select("doc_id", "text")
    out = contamination_flags(train, test, "doc_id", "text", n=5)
    return out.select("doc_id", "n_hits", "contaminated")


_GOPHER = """
WITH words AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
per_word AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM words GROUP BY doc_id, word
),
stats AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_unique_words,
         CAST(MAX(cnt) AS BIGINT) AS top_cnt,
         CAST(SUM(length(word) * cnt) AS BIGINT) AS char_sum
  FROM per_word GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_words, 0) AS n_words,
       COALESCE(s.n_unique_words, 0) AS n_unique_words,
       CASE WHEN COALESCE(s.n_words, 0) > 0
            THEN CAST(s.char_sum AS DOUBLE) / CAST(s.n_words AS DOUBLE)
            ELSE 0.0 END AS mean_word_len,
       CASE WHEN COALESCE(s.n_words, 0) > 0
            THEN CAST(s.top_cnt AS DOUBLE) / CAST(s.n_words AS DOUBLE)
            ELSE 0.0 END AS top_word_frac,
       COALESCE(s.n_words, 0) >= 50 AND COALESCE(s.n_words, 0) <= 100000
         AND (CASE WHEN COALESCE(s.n_words, 0) > 0
                   THEN CAST(s.char_sum AS DOUBLE) / CAST(s.n_words AS DOUBLE)
                   ELSE 0.0 END) >= 3.0
         AND (CASE WHEN COALESCE(s.n_words, 0) > 0
                   THEN CAST(s.char_sum AS DOUBLE) / CAST(s.n_words AS DOUBLE)
                   ELSE 0.0 END) <= 10.0
         AND (CASE WHEN COALESCE(s.n_words, 0) > 0
                   THEN CAST(s.top_cnt AS DOUBLE) / CAST(s.n_words AS DOUBLE)
                   ELSE 0.0 END) < 0.2 AS keep
FROM documents d LEFT JOIN stats s USING (doc_id)
"""


def _corpus_preprocess_oracle() -> str:
    """Composed-pipeline oracle: the lang-ID, exact-dedup, gopher, and
    per-source-cap oracle fragments chained exactly as
    plans/corpus.py::corpus_preprocess composes the operators."""
    counts = ", ".join(
        f"{_duck_lang_count(lang)} AS c_{lang}" for lang in T.LANG_ORDER
    )
    best = ", ".join(f"c_{lang}" for lang in T.LANG_ORDER)
    return f"""
WITH t1 AS (SELECT doc_id, {_DUCK_LTOKS} AS ltoks FROM documents),
t2 AS (SELECT doc_id, {counts} FROM t1),
t3 AS (SELECT doc_id, {best}, greatest({best}) AS best FROM t2),
langf AS (SELECT doc_id, ({_LANG_CASE}) = 'en' AS lang_ok FROM t3),
canon AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
  FROM documents
),
words AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
per_word AS (SELECT doc_id, word, COUNT(*) AS cnt FROM words GROUP BY doc_id, word),
stats AS (
  SELECT doc_id, SUM(cnt) AS n_words, MAX(cnt) AS top_cnt,
         SUM(length(word) * cnt) AS char_sum
  FROM per_word GROUP BY doc_id
),
q AS (
  SELECT d.doc_id,
         COALESCE(s.n_words, 0) >= 50 AND COALESCE(s.n_words, 0) <= 100000
           AND (CASE WHEN COALESCE(s.n_words, 0) > 0
                     THEN CAST(s.char_sum AS DOUBLE) / s.n_words ELSE 0.0 END)
               BETWEEN 3.0 AND 10.0
           AND (CASE WHEN COALESCE(s.n_words, 0) > 0
                     THEN CAST(s.top_cnt AS DOUBLE) / s.n_words ELSE 1.0 END)
               < 0.2 AS quality_ok
  FROM documents d LEFT JOIN stats s USING (doc_id)
),
flags AS (
  SELECT d.doc_id, d.source, l.lang_ok, c.is_canonical, q.quality_ok,
         (l.lang_ok AND c.is_canonical AND q.quality_ok) AS eligible
  FROM documents d
  JOIN langf l USING (doc_id)
  JOIN canon c USING (doc_id)
  JOIN q USING (doc_id)
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM flags WHERE eligible
)
SELECT f.doc_id, f.source, f.lang_ok, f.is_canonical, f.quality_ok,
       f.eligible, COALESCE(r.rn <= 15, FALSE) AS selected
FROM flags f LEFT JOIN ranked r USING (doc_id)
"""


@query("pipeline_corpus_preprocess", _corpus_preprocess_oracle)
def pipeline_corpus_preprocess_q(spark, sf_dir):
    """The composed training-data preprocessing pipeline
    (plans/corpus.py::corpus_preprocess — CCNet/C4/RefinedWeb recipe):
    language ID -> exact dedup -> Gopher quality gate -> per-source
    cap, as ONE lazy plan with survivorship flags per stage (no silent
    drops; every rejection auditable).  The oracle chains the four
    stages' individual oracle fragments identically — the cross-engine
    proof that operator COMPOSITION preserves each operator's
    semantics."""
    from cloud_optimized_data_pipelines_spark.plans.corpus import (
        corpus_preprocess,
    )

    t = load_tables(spark, sf_dir)
    return corpus_preprocess(t["documents"])


def _pagerank_oracle() -> str:
    """Unrolled-CTE oracle for the integer-scaled PageRank: the fixed
    5 iterations are generated as plain chained CTEs (aggregates are
    not allowed in recursive terms), every contribution is BIGINT
    floor division, and each iteration's SUM is cast back to BIGINT
    (DuckDB widens SUM(BIGINT) to HUGEINT — the round-4 hasher
    lesson)."""
    head = """
WITH e AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  UNION
  SELECT 't:' || event_type, 'u:' || CAST(user_id AS VARCHAR)
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, 6):
        steps.append(f""",
r{i} AS (
  SELECT n.node,
         CAST(150000000 + COALESCE(SUM((17 * p.r) // (20 * d.deg)), 0)
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN r{i - 1} p ON p.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)""")
    return head + "".join(steps) + "\nSELECT node, r AS rank FROM r5"


@query("graph_pagerank_events", _pagerank_oracle)
def graph_pagerank_q(spark, sf_dir):
    """Integer-scaled PageRank (operators/graph.py::pagerank) over the
    symmetrized user <-> event-type bipartite graph — the
    Common-Crawl-style link-quality prior, made cross-engine
    hash-checkable by running the whole recurrence in BIGINT
    micro-units (integer sums are associative; float PageRank is
    reduction-order-dependent and un-oracle-able).  5 iterations,
    damping 17/20; the oracle unrolls them as chained CTEs."""
    from cloud_optimized_data_pipelines_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    fwd = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iters=5)


def _pagerank_dangling_oracle() -> str:
    """Unrolled-CTE oracle for the teleport-corrected PageRank on the
    DIRECTED user->event-type graph (event-type nodes are sinks): per
    iteration a 1-row dangling-mass CTE (rank sum over nodes with no
    out-edges) feeds an equal integer share into every node's base —
    all BIGINT, so the parallel/serial sums still agree bit-exactly."""
    head = """
WITH e AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
                  't:' || event_type AS dst
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, 5):
        steps.append(f""",
d{i} AS (
  SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) AS dm
  FROM r{i - 1} p LEFT JOIN deg d ON d.src = p.node
  WHERE d.src IS NULL
),
r{i} AS (
  SELECT n0.node,
         CAST(150000000 + (17 * dd.dm) // (20 * nn.n)
              + COALESCE(SUM((17 * p.r) // (20 * dg.deg)), 0)
              AS BIGINT) AS r
  FROM nodes n0
  CROSS JOIN d{i} dd CROSS JOIN nn
  LEFT JOIN e ON e.dst = n0.node
  LEFT JOIN r{i - 1} p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n0.node, dd.dm, nn.n
)""")
    return head + "".join(steps) + "\nSELECT node, r AS rank FROM r4"


@query("graph_pagerank_dangling", _pagerank_dangling_oracle)
def graph_pagerank_dangling_q(spark, sf_dir):
    """Teleport-corrected integer PageRank (operators/graph.py::
    pagerank(dangling='redistribute')) on the DIRECTED user ->
    event-type graph, where every event-type node is a sink: each
    iteration aggregates the rank mass sitting on sinks (one 1-row
    BIGINT sum) and hands every node an equal integer share — the
    textbook dangling-mass correction, kept associative so the
    unrolled-CTE oracle hash-matches.  4 iterations, damping 17/20."""
    from cloud_optimized_data_pipelines_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    fwd = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    )
    return pagerank(fwd, iters=4, dangling="redistribute")


_PSI = """
WITH labeled AS (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'before'
              ELSE 'after' END AS w,
         event_type AS cat
  FROM events
),
counts AS (
  SELECT cat,
         CAST(SUM(CASE WHEN w = 'before' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_before,
         CAST(SUM(CASE WHEN w = 'after' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_after
  FROM labeled GROUP BY cat
),
scalars AS (
  SELECT CAST(SUM(cnt_before) AS BIGINT) AS tot_b,
         CAST(SUM(cnt_after) AS BIGINT) AS tot_a,
         CAST(COUNT(*) AS BIGINT) AS ncat
  FROM counts
)
SELECT cat, cnt_before, cnt_after,
       CAST(cnt_before + 1 AS DOUBLE) / (tot_b + ncat) AS p_before,
       CAST(cnt_after + 1 AS DOUBLE) / (tot_a + ncat) AS p_after,
       (CAST(cnt_after + 1 AS DOUBLE) / (tot_a + ncat)
        - CAST(cnt_before + 1 AS DOUBLE) / (tot_b + ncat))
       * (round(ln(CAST(cnt_after + 1 AS DOUBLE) / (tot_a + ncat)), 9)
          - round(ln(CAST(cnt_before + 1 AS DOUBLE) / (tot_b + ncat)), 9))
       AS psi_term
FROM counts CROSS JOIN scalars
"""


@query("events_drift_psi", _PSI)
def events_drift_psi_q(spark, sf_dir):
    """Population Stability Index drift monitor (operators/drift.py::
    psi_by_window): the event-type distribution of the stream's second
    half vs its first — per-category PSI decomposition with Laplace
    smoothing over the union category set and term-rounded logs (the
    cross-engine ln discipline).  One partial-aggregated category count
    + a 1-row scalar broadcast; output is category-set-sized, so the
    monitor costs one scan at any stream size."""
    from cloud_optimized_data_pipelines_spark.operators.drift import (
        psi_by_window,
    )

    t = load_tables(spark, sf_dir)
    split = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "before"
    ).otherwise("after")
    return psi_by_window(t["events"], "event_type", split)


_K_ANON = """
WITH counts AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM documents GROUP BY source, lang
)
SELECT d.doc_id, d.source, d.lang, c.group_size,
       c.group_size >= 25 AS k_anonymous
FROM documents d JOIN counts c
  ON d.source IS NOT DISTINCT FROM c.source
 AND d.lang IS NOT DISTINCT FROM c.lang
"""


@query("privacy_k_anonymous", _K_ANON)
def privacy_k_anonymous_q(spark, sf_dir):
    """k-anonymity flags (operators/privacy.py::k_anonymous_flags,
    Sweeney 2002): rows whose (source, lang) quasi-identifier
    combination occurs fewer than k times are flagged before a data
    release.  One map-side-combined count + a key join reusing the same
    shuffle partitioning; k=25 is binding at sf0.01 (several
    source x lang cells fall under it), so both flag values are
    exercised."""
    from cloud_optimized_data_pipelines_spark.operators.privacy import (
        k_anonymous_flags,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "source", "lang")
    return k_anonymous_flags(docs, ["source", "lang"], k=25)


@query("text_gopher_quality", _GOPHER)
def text_gopher_quality_q(spark, sf_dir):
    """MassiveText/Gopher word-level quality rules (operators/
    quality.py): word-count bounds, mean-word-length bounds, and the
    top-word repetition fraction, combined into a keep flag.  One
    explode + two partial-aggregated doc-keyed shuffles — no joins
    against the corpus, no Python."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        gopher_quality_flags,
    )

    t = load_tables(spark, sf_dir)
    out = gopher_quality_flags(t["documents"], "doc_id", "text")
    return out.select(
        "doc_id", "n_words", "n_unique_words", "mean_word_len",
        "top_word_frac", "keep",
    )


_CLASSIFIER = """
WITH toks AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> ''), t -> lower(t)) AS lt
  FROM documents
),
w AS (
  SELECT doc_id,
         CAST(len(lt) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(lt) > 0 THEN list_reduce(
                list_transform(lt, t ->
                  ('0x' || substr(md5(t), 1, 8))::BIGINT % 2001 - 1000),
                (a, b) -> a + b)
              ELSE 0 END AS BIGINT) AS margin
  FROM toks
)
SELECT doc_id, n_tokens, margin,
       CASE WHEN n_tokens > 0
            THEN margin::DOUBLE / (n_tokens::DOUBLE * 1000.0)
            ELSE 0.0 END AS score,
       (CASE WHEN n_tokens > 0
             THEN margin::DOUBLE / (n_tokens::DOUBLE * 1000.0)
             ELSE 0.0 END >= 0.0) AS keep
FROM w
"""


@query("text_classifier_score", _CLASSIFIER)
def text_classifier_score_q(spark, sf_dir):
    """fastText-style linear quality-classifier inference
    (operators/quality.py::classifier_score, hashed-weight form): the
    whole model application is ONE codegen'd expression over the
    let-bound token array — no explode, no shuffle, no Python — which
    is the execution shape for scoring 100 TB of documents.  Integer
    weight sums keep the result exact; the only float is the final
    scaled division."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        classifier_score,
    )

    t = load_tables(spark, sf_dir)
    out = classifier_score(t["documents"], "doc_id", "text", threshold=0.0)
    return out.select("doc_id", "n_tokens", "margin", "score", "keep")


def _clf_train_oracle(iters: int = 6, lr: float = 128.0, d: int = 64) -> str:
    """Unroll the full GD training loop of train_quality_classifier
    into a CTE chain (the BPE/PageRank/Lloyd treatment): w0 = zeros,
    then per iteration margin-fold -> rounded sigmoid -> per-bucket
    rounded gradient -> weight update.  Every float reduction the
    engines could order differently is rounded at the same point on
    both sides; the margin fold runs in token order over the same
    literal weights."""
    bucket = f"(('0x' || substr(md5(lower(t)), 1, 8))::BIGINT % {d})"
    parts = [f"""
WITH base AS (
  SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS n,
         CASE WHEN len(tk) > 0
                   AND 16 * len(list_filter(tk, t -> lower(t) IN ('the', 'a')))
                       >= len(tk)
              THEN 1.0 ELSE 0.0 END AS y
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
    FROM documents
  ) raw
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM base),
w0 AS (SELECT unnest(range(0, {d})) AS b, CAST(0.0 AS DOUBLE) AS w)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
w{i - 1}l AS (SELECT list(w ORDER BY b) AS wl FROM w{i - 1}),
m{i} AS (
  SELECT doc_id, y, tk, n,
         CASE WHEN n > 0 THEN
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(tk, t -> wl[{bucket} + 1])),
             (x, z) -> x + z) / n
         ELSE 0.0 END AS margin
  FROM base CROSS JOIN w{i - 1}l
),
o{i} AS (
  SELECT round(1.0 / (1.0 + exp(-margin)), 7) AS p, y, n, unnest(tk) AS t
  FROM m{i}
),
g{i} AS (
  SELECT {bucket} AS b,
         round(SUM((p - y) / n) / (SELECT c FROM nn), 6) AS g
  FROM o{i} GROUP BY 1
),
w{i} AS (
  SELECT prev.b, prev.w - {lr!r} * COALESCE(g{i}.g, 0.0) AS w
  FROM w{i - 1} prev LEFT JOIN g{i} ON prev.b = g{i}.b
)""")
    parts.append(f""",
w{iters}l AS (SELECT list(w ORDER BY b) AS wl FROM w{iters}),
mf AS (
  SELECT doc_id, y,
         CASE WHEN n > 0 THEN
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(tk, t -> wl[{bucket} + 1])),
             (x, z) -> x + z) / n
         ELSE 0.0 END AS margin
  FROM base CROSS JOIN w{iters}l
)
SELECT doc_id,
       CAST(y AS BIGINT) AS label,
       round(margin, 6) AS margin,
       round(1.0 / (1.0 + exp(-margin)), 7) AS prob,
       round(1.0 / (1.0 + exp(-margin)), 7) >= 0.5 AS pred
FROM mf
""")
    return "".join(parts)


@query("text_classifier_train", _clf_train_oracle())
def text_classifier_train_q(spark, sf_dir):
    """TRAIN the quality classifier, not just apply one (operators/
    quality.py::train_quality_classifier): distill a stopword-ratio
    quality rule (label = tf('the','a') >= 1/16 — the Gopher
    stop-word-signal shape) into a 64-bucket hashed logistic model by
    6 full-batch GD steps.  Each step is one distributed pass (margin
    = codegen'd token-order fold with plan-literal weights; gradient =
    token explode -> 64-group map-side-combined sum); driver traffic
    is 64 doubles per step.  Rounded sigmoids + rounded gradients make
    the whole loop reduction-order independent, so the oracle unrolls
    all 6 iterations into CTEs and hash-matches.  Training accuracy
    beats the majority baseline (0.75 vs 0.52 at sf0.01; pytest-
    gated)."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        train_quality_classifier,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    tk = T.tokens("text")
    stop = F.size(F.filter(tk, lambda x: F.lower(x).isin("the", "a")))
    labeled = docs.withColumn(
        "label",
        ((F.size(tk) > 0) & (stop * 16 >= F.size(tk))).cast("int"),
    )
    scored, _w = train_quality_classifier(
        labeled, "doc_id", "text", "label", iters=6, lr=128.0
    )
    return scored.select(
        "doc_id",
        F.col("label").cast("long").alias("label"),
        "margin",
        "prob",
        "pred",
    )


_C4_CLEAN = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
chunk AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[(i*10+1):(i*10+10)], ' ')
         || CASE WHEN (doc_id + i) % 4 <> 0 THEN '.' ELSE '' END AS line,
         len(t[(i*10+1):(i*10+10)]) AS n_words
  FROM toks, UNNEST(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)
  WHERE len(t) > 0
),
flagged AS (
  SELECT doc_id, pos, line,
         (regexp_matches(line, '[.!?"]$') AND n_words >= 5) AS kept
  FROM chunk
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT)
           + CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS n_lines,
         CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE kept), '')
           AS text_clean
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_lines, 0) AS n_lines,
       COALESCE(p.n_kept, 0) AS n_kept,
       (COALESCE(p.n_kept, 0) >= 3 AND d.doc_id % 17 <> 0) AS keep,
       md5(COALESCE(p.text_clean, '')) AS clean_md5
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@query("text_c4_clean", _C4_CLEAN)
def text_c4_clean_q(spark, sf_dir):
    """C4 page cleaning (operators/quality.py::c4_line_filter): the
    Raffel et al. 2020 line rules — terminal punctuation, >= 5 words
    per line, >= 3 surviving lines, blocklist phrases — as pure
    per-document array expressions (no explode, no shuffle; the filter
    rides the scan like classifier_score).  The word-soup corpus has
    no line structure, so a line-structured text is built
    DETERMINISTICALLY IN BOTH ENGINES: 10-token chunks, chunk i of doc
    d terminated with '.' iff (d + i) % 4 != 0, and docs with
    doc_id % 17 == 0 get a trailing 'lorem ipsum.' line that trips the
    blocklist — every rule is exercised, and the kept-text md5 covers
    the rebuilt bytes."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        _fixed_token_lines,
    )
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        c4_line_filter,
    )

    t = load_tables(spark, sf_dir)
    did = F.col("doc_id")
    chunks = _fixed_token_lines(F.col("text"), 10)
    lines = F.transform(
        chunks,
        lambda c, i: F.concat(
            c, F.when((did + i) % 4 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    seeded = t["documents"].select(
        "doc_id",
        F.concat(
            F.array_join(lines, "\n"),
            F.when(did % 17 == 0, F.lit("\nlorem ipsum.")).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = c4_line_filter(seeded, "doc_id", "text")
    return out.select(
        "doc_id", "n_lines", "n_kept", "keep",
        F.md5("text_clean").alias("clean_md5"),
    )


_CORPUS_PREP = """
WITH toks AS (
  SELECT doc_id, source, text,
         list_transform(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> ''), t -> lower(t)) AS lt
  FROM documents
),
cls AS (
  SELECT doc_id, source, text,
         CAST(len(lt) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(lt) > 0 THEN list_reduce(
                list_transform(lt, t ->
                  ('0x' || substr(md5(t), 1, 8))::BIGINT % 2001 - 1000),
                (a, b) -> a + b)
              ELSE 0 END AS BIGINT) AS margin
  FROM toks
),
scored AS (
  SELECT doc_id, source, text, n_tokens,
         CASE WHEN n_tokens > 0
              THEN margin::DOUBLE / (n_tokens::DOUBLE * 1000.0)
              ELSE 0.0 END AS score
  FROM cls
),
quality AS (
  SELECT * FROM scored WHERE n_tokens >= 10 AND score >= -0.05
),
sole AS (
  SELECT doc_id, source, n_tokens, score,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id) AS rn
  FROM quality
),
surv AS (SELECT doc_id, source, n_tokens, score FROM sole WHERE rn = 1),
sampled AS (
  SELECT * FROM surv
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 8
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_md5
FROM sampled GROUP BY source
"""


@query("pipeline_corpus_prep", _CORPUS_PREP)
def pipeline_corpus_prep_q(spark, sf_dir):
    """END-TO-END corpus preparation — the composition a real
    training-data run executes, as ONE lazy plan: quality gate
    (classifier score + length floor, both scan-side expressions) ->
    exact dedup (lowest-id survivor per content hash, one digest-keyed
    shuffle) -> 80% deterministic sample (md5 threshold, narrow
    filter) -> per-source corpus stats.  Catalyst fuses the two
    filters into the scan and the whole pipeline runs in two shuffle
    stages (dedup window + final agg); the oracle rebuilds every stage
    in SQL, so the hash proves the full composition, not just the
    pieces."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        exact_dedup_by_hash,
    )
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        classifier_score,
    )
    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        hash_bucket,
    )

    t = load_tables(spark, sf_dir)
    scored = classifier_score(
        t["documents"].select("doc_id", "source", "text"), "doc_id", "text"
    )
    quality = scored.filter(
        (F.col("n_tokens") >= 10) & (F.col("score") >= -0.05)
    )
    survivors = exact_dedup_by_hash(quality, "text", "doc_id")
    sampled = survivors.filter(hash_bucket("doc_id", 10) < 8)
    return sampled.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id"))),
                    lambda x: x["doc_id"].cast("string"),
                ),
            )
        ).alias("ids_md5"),
    )


_NGRAM_REPETITION = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, nn.n AS n,
         array_to_string(list_slice(tk, t.i, t.i + nn.n - 1), ' ') AS gram
  FROM toks, (VALUES (2), (3), (5)) AS nn(n),
       UNNEST(range(1, len(tk) - nn.n + 2)) AS t(i)
),
c AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY doc_id, n, gram),
r AS (SELECT doc_id, n, cnt * length(gram) AS chars,
             ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                ORDER BY cnt DESC, gram DESC) AS rn
      FROM c),
top2 AS (SELECT doc_id, chars FROM r WHERE n = 2 AND rn = 1),
top3 AS (SELECT doc_id, chars FROM r WHERE n = 3 AND rn = 1),
dup5 AS (SELECT doc_id,
                SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS chars
         FROM c WHERE n = 5 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(CAST(t2.chars AS DOUBLE) / length(d.text), 0.0) AS top2_char_frac,
       COALESCE(CAST(t3.chars AS DOUBLE) / length(d.text), 0.0) AS top3_char_frac,
       COALESCE(CAST(d5.chars AS DOUBLE) / length(d.text), 0.0) AS dup5_char_frac,
       (COALESCE(CAST(t2.chars AS DOUBLE) / length(d.text), 0.0) <= 0.20
        AND COALESCE(CAST(t3.chars AS DOUBLE) / length(d.text), 0.0) <= 0.18
        AND COALESCE(CAST(d5.chars AS DOUBLE) / length(d.text), 0.0) <= 0.15) AS keep
FROM documents d
LEFT JOIN top2 t2 USING (doc_id)
LEFT JOIN top3 t3 USING (doc_id)
LEFT JOIN dup5 d5 USING (doc_id)
"""


_WORDPIECE_CHARS = "abcdefghijklmno"
from cloud_optimized_data_pipelines_spark.operators.wordpiece import (
    UNK_HASH32 as _WORDPIECE_UNK_HASH,
)

_WORDPIECE_STATS = f"""
WITH RECURSIVE
chars AS (SELECT UNNEST([{", ".join(repr(c) for c in _WORDPIECE_CHARS)}]) AS c),
topw AS (
  SELECT w FROM (
    SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents) g
  GROUP BY w ORDER BY COUNT(*) DESC, w LIMIT 10
),
vocab AS (
  SELECT c AS piece, c AS match_txt, 1 AS plen, TRUE AS is_raw FROM chars
  UNION ALL
  SELECT '##' || c, c, 1, FALSE FROM chars
  UNION ALL
  SELECT w, w, length(w)::INT, TRUE FROM topw
),
docs_words AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
words AS (SELECT DISTINCT w FROM docs_words),
pos AS (SELECT UNNEST(range(0, 32)) AS p),
matches AS (
  SELECT wo.w, po.p,
         max_by(v.piece, v.plen) AS piece,
         MAX(v.plen) AS plen
  FROM words wo
  JOIN pos po ON po.p < length(wo.w)
  JOIN vocab v
    ON v.is_raw = (po.p = 0)
   AND substr(wo.w, po.p + 1, v.plen) = v.match_txt
  WHERE length(wo.w) <= 32
  GROUP BY wo.w, po.p
),
walk AS (
  SELECT w, CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS n_pieces,
         FALSE AS failed, CAST(0 AS BIGINT) AS hsum
  FROM words WHERE length(w) <= 32
  UNION ALL
  SELECT k.w,
         CASE WHEN m.piece IS NULL THEN length(k.w) ELSE k.p + m.plen END,
         k.n_pieces + 1,
         m.piece IS NULL,
         k.hsum + CASE WHEN m.piece IS NULL THEN 0
                       ELSE ('0x' || substr(md5(m.piece), 1, 8))::BIGINT END
  FROM walk k LEFT JOIN matches m ON m.w = k.w AND m.p = k.p
  WHERE k.p < length(k.w) AND NOT k.failed
),
word_res AS (
  SELECT w,
         CASE WHEN failed THEN 1 ELSE n_pieces END AS n_pieces,
         CASE WHEN failed THEN 1 ELSE 0 END AS n_unk,
         CASE WHEN failed THEN CAST({_WORDPIECE_UNK_HASH} AS BIGINT)
              ELSE hsum END AS hsum
  FROM walk WHERE p >= length(w)
  UNION ALL
  SELECT w, 1, 1, CAST({_WORDPIECE_UNK_HASH} AS BIGINT)
  FROM words WHERE length(w) > 32
),
agg AS (
  SELECT dw.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(r.n_pieces) AS BIGINT) AS n_pieces,
         CAST(SUM(r.n_unk) AS BIGINT) AS n_unk,
         CAST(MAX(r.n_pieces) AS BIGINT) AS max_word_pieces,
         CAST(SUM(r.hsum) AS BIGINT) AS piece_hash_sum
  FROM docs_words dw JOIN word_res r USING (w)
  GROUP BY dw.doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_words, 0) AS n_words,
       COALESCE(a.n_pieces, 0) AS n_pieces,
       COALESCE(a.n_unk, 0) AS n_unk,
       COALESCE(a.max_word_pieces, 0) AS max_word_pieces,
       COALESCE(a.piece_hash_sum, 0) AS piece_hash_sum
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("text_wordpiece_tokens", _WORDPIECE_STATS)
def text_wordpiece_tokens_q(spark, sf_dir):
    """WordPiece subword tokenization (operators/wordpiece.py — BERT's
    greedy longest-match-first with whole-word [UNK] fallback and the
    max-chars guard, r10): token budgets and packing lengths need a
    REAL subword tokenizer, not the whitespace proxy.  The vocabulary
    is corpus-derived and deterministic (a..o single chars in raw and
    ## continuation form + the 10 most frequent words, count desc /
    word asc — exact integer tie-break), so words with characters past
    'o' that miss the whole-word table exercise the [UNK] path.  The
    engine walks words in one Arrow pass (vocab + word memo in the
    closure, BPE-bound driver traffic: 10 collected rows — a top-10
    table on a 31-word synthetic vocabulary leaves two thirds of all
    words to the multi-piece char walk, so longest-match, continuation
    and [UNK] paths all execute under the driver hash); the oracle
    replays the SAME maximal munch as a recursive CTE over
    (word, position) states joined to the longest match per state —
    the per-doc 32-bit piece-hash sum pins piece IDENTITY cross-engine,
    not just counts."""
    from cloud_optimized_data_pipelines_spark.operators.wordpiece import (
        wordpiece_stats,
        wordpiece_vocab_from_corpus,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    vocab = wordpiece_vocab_from_corpus(
        docs, "text", top_k=10, base_chars=_WORDPIECE_CHARS
    )
    return wordpiece_stats(docs, "doc_id", "text", vocab)


@query("text_ngram_repetition", _NGRAM_REPETITION)
def text_ngram_repetition_q(spark, sf_dir):
    """Gopher repetition coverage (operators/quality.py::
    ngram_repetition): top-2/top-3-gram and duplicate-5-gram character
    fractions with the table-A1 thresholds.  All counts/lengths are
    exact integers; the fractions are single final divisions, and the
    top-gram tie-break (largest gram among max counts) makes
    max(struct(cnt, gram)) deterministic cross-engine."""
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        ngram_repetition,
    )

    t = load_tables(spark, sf_dir)
    out = ngram_repetition(t["documents"], "doc_id", "text")
    return out.select(
        "doc_id", "top2_char_frac", "top3_char_frac", "dup5_char_frac", "keep"
    )


def _bm25_oracle(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """Oracle mirroring operators/ranking.py::bm25_scores with the SAME
    float-determinism discipline: integer aggregates into a fixed
    expression tree (constants embedded at Python-double precision via
    repr), avgdl as SUM/COUNT not AVG, per-term columns added in
    sorted-term order."""
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    score_terms = " + ".join(
        f"COALESCE(SUM(CASE WHEN term = '{t}' THEN sc END), 0.0)"
        for t in sorted(set(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
words AS (SELECT doc_id, UNNEST(tk) AS term FROM toks),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM words WHERE term IN ({tlist}) GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
s AS (
  SELECT t.doc_id, t.term,
         round(ln((CAST(st.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                  / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 9)
         * (CAST(t.tf AS DOUBLE) * {k1 + 1.0!r})
         / (CAST(t.tf AS DOUBLE)
            + {k1!r} * ({1.0 - b!r} + {b!r} * CAST(d.dl AS DOUBLE) / st.avgdl)) AS sc
  FROM tf t
  JOIN dfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats st
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits, {score_terms} AS score
FROM s GROUP BY doc_id
"""


_BM25_TERMS = ["spark", "table", "query", "window"]


@query("text_bm25_scores", _bm25_oracle(_BM25_TERMS))
def text_bm25_scores_q(spark, sf_dir):
    """Okapi BM25 relevance of every document against a fixed 4-term
    query (operators/ranking.py::bm25_scores) — the lexical-retrieval
    baseline next to embedding similarity.  Bit-identical doubles by
    construction: integer tf/df/N/dl aggregates, avgdl = SUM/COUNT,
    fixed-order per-term addition."""
    from cloud_optimized_data_pipelines_spark.operators.ranking import (
        bm25_scores,
    )

    t = load_tables(spark, sf_dir)
    return bm25_scores(t["documents"], "doc_id", "text", _BM25_TERMS)


_BLOOM_GATED = """
WITH inc AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS digest FROM documents
  WHERE doc_id % 2 = 1 OR doc_id % 4 = 0
),
hist AS (
  SELECT DISTINCT md5(COALESCE(text, '')) AS digest FROM documents
  WHERE doc_id % 2 = 0
),
surv AS (
  SELECT digest, CAST(MIN(doc_id) AS BIGINT) AS doc_id
  FROM inc GROUP BY digest
)
SELECT doc_id, digest FROM surv
WHERE digest NOT IN (SELECT digest FROM hist)
"""


@query("dedup_bloom_gated", _BLOOM_GATED)
def dedup_bloom_gated_q(spark, sf_dir):
    """Bloom-gated incremental exact dedup, batch form (the plan
    ``streaming/dedup_stream.py::process_dedup_batch`` runs per
    micro-batch, reference parity: the SQS-driven re-crawl loop in
    `/root/reference/lambdas/cmr-query/handler.py` re-discovers already
    -ingested granules every run): history = even doc_ids' digests,
    incoming = odd doc_ids plus every multiple of 4 (so half the
    incoming rows ARE duplicates and must be rejected).  The filter —
    auto-sized from the history count (~1% FPR, power-of-two m) — is
    probed first; digests it has definitely never seen (no false
    negatives) skip the history anti-join entirely, so at crawl scale
    the common all-new batch never touches the big digest table.  The
    oracle is the PLAIN anti-join: the gate is a pure pre-filter, so
    any divergence is a correctness bug, not tolerance."""
    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_contains,
        bloom_partial,
    )
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        _auto_bloom_size,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    digest = F.md5(F.coalesce(F.col("text"), F.lit("")))
    hist = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(digest.alias("digest"))
        .distinct()
    )
    m, k = _auto_bloom_size(hist.count())
    incoming = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0)
    ).select("doc_id", digest.alias("digest"))
    surv = incoming.groupBy("digest").agg(
        F.min("doc_id").cast("long").alias("doc_id")
    )
    bloom = bloom_partial(hist, "digest", m_bits=m, k_hashes=k)
    flagged = bloom_contains(bloom, surv, "digest", m_bits=m, k_hashes=k)
    fresh = flagged.filter(~F.col("maybe_present")).drop("maybe_present")
    checked = (
        flagged.filter(F.col("maybe_present"))
        .drop("maybe_present")
        .join(hist, "digest", "left_anti")
    )
    return fresh.unionByName(checked).select("doc_id", "digest")





# ---------------------------------------------------------------------------
# crawl-to-corpus composition: WARC -> WET -> gate -> dedup (r11)
# (moved verbatim from the r11 round-file in r12 — VERDICT r11 task 9)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# crawl-ingest composition: WARC -> WET text -> quality gate -> dedup
# ---------------------------------------------------------------------------


def _crawl_ingest_oracle() -> str:
    """Oracle for pipeline_crawl_ingest: every stage replays in SQL —
    record/word formulas rebuild each response body (vocab CASE +
    string_agg), the quality gate is the token-count arithmetic
    (W = 30 + 10*(src%4) >= 35), the duplicate rule (i%3==2 copies
    i-1) collapses to the src key, and the survivor md5 re-derives
    the concatenated unique bodies in min-id order.  Non-circular:
    the engine's bodies come out of gzip members + WARC records +
    HTTP envelopes parsed on executors, and its dedup runs on the
    actual strings."""
    from cloud_optimized_data_pipelines_spark.sources.warc import (
        PROBE_VOCAB,
    )

    vocab_case = (
        "CASE (13*s.src + 7*j.j + s.v) % 16 "
        + " ".join(f"WHEN {k} THEN '{w}'" for k, w in enumerate(PROBE_VOCAB))
        + " END"
    )
    return f"""
WITH var AS (SELECT unnest(range(0, 8)) AS v),
resp AS (
  SELECT v.v, i.i FROM var v, (SELECT unnest(range(0, 8)) AS i) i
  WHERE i.i < 6 + v.v % 3
),
eff AS (
  SELECT v, i, CASE WHEN i % 3 = 2 THEN i - 1 ELSE i END AS src
  FROM resp
),
kept AS (
  SELECT v, i, src, 30 + 10*(src % 4) AS tokens
  FROM eff WHERE 30 + 10*(src % 4) >= 35
),
surv0 AS (
  SELECT v, src, MIN(i) AS i0 FROM kept GROUP BY v, src
),
-- dedup is GLOBAL across crawl files (the engine's exact_dedup sees
-- every body): two (v, src) pairs carry the SAME body iff their
-- start key (13*src + v) mod 16 and word count agree (same mod-16
-- progression, step 7).  Keep the global min-rid owner per class.
keyed AS (
  SELECT v, src, i0, v*100 + i0 + 1 AS rid,
         (13*src + v) % 16 AS k, 30 + 10*(src % 4) AS w
  FROM surv0
),
surv AS (
  SELECT q.v, q.src, q.i0 FROM keyed q
  WHERE q.rid = (SELECT MIN(q2.rid) FROM keyed q2
                 WHERE q2.k = q.k AND q2.w = q.w)
),
words AS (
  SELECT s.v, s.src, j.j, {vocab_case} AS w
  FROM surv s
  JOIN (SELECT unnest(range(0, 60)) AS j) j
    ON j.j < 30 + 10*(s.src % 4)
),
bodies AS (
  SELECT v, src, string_agg(w, ' ' ORDER BY j) AS body
  FROM words GROUP BY v, src
),
per_v AS (
  SELECT r.v,
         CAST(COUNT(*) AS BIGINT) AS n_responses
  FROM resp r GROUP BY r.v
),
kept_v AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(tokens) AS BIGINT) AS tok_sum
  FROM kept GROUP BY v
),
surv_v AS (
  SELECT b.v, CAST(COUNT(*) AS BIGINT) AS n_unique,
         md5(string_agg(b.body, chr(10) ORDER BY b.src)) AS surv_md5
  FROM bodies b GROUP BY b.v
)
SELECT d.doc_id,
       d.doc_id % 8 AS variant,
       p.n_responses, k.n_kept, k.tok_sum, s.n_unique, s.surv_md5
FROM documents d
JOIN per_v p ON p.v = d.doc_id % 8
JOIN kept_v k ON k.v = d.doc_id % 8
JOIN surv_v s ON s.v = d.doc_id % 8
"""


@query("pipeline_crawl_ingest", _crawl_ingest_oracle)
def pipeline_crawl_ingest_q(spark, sf_dir):
    """The crawl-to-corpus COMPOSITION the new codecs exist for, as
    one lazy plan: .warc.gz probe files (gzip members + ISO 28500
    records + HTTP envelopes, ~1/3 exact-duplicate responses) ->
    warc_records explode -> http_text_bodies (WET step) -> token-count
    quality gate (engine tokens()) -> exact_dedup_by_hash (lowest-id
    survivor per body, ONE md5-keyed shuffle — measured 5x faster than
    the groupBy+semi-join form at the 400k-record ladder rung, and the
    shape that holds at 100 TB: 16-byte digests shuffle once, the
    corpus is never re-scanned for the join probe side) -> per-file
    survivorship aggregates, with the survivor md5 pinning the exact
    text the pipeline carried end to end."""
    from cloud_optimized_data_pipelines_spark.functions import text as TT
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        exact_dedup_by_hash,
    )
    from cloud_optimized_data_pipelines_spark.sources.warc import (
        http_text_bodies,
        warc_records,
        warc_text_probe_table,
    )

    t = load_tables(spark, sf_dir)
    probe = warc_text_probe_table(spark, 8).cache()
    recs = warc_records(probe, "file_id", "blob")
    resp = recs.filter(F.col("warc_type") == "response")
    bodies = http_text_bodies(resp).withColumn(
        "tokens", TT.token_count("body")
    )
    kept = bodies.filter(F.col("tokens") >= 35).withColumn(
        "rid", F.col("file_id") * 100 + F.col("record_index")
    )
    surv = exact_dedup_by_hash(
        kept.select("file_id", "rid", "body"), "body", "rid"
    )
    n_resp = resp.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_responses")
    )
    kept_agg = kept.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("tokens").cast("bigint").alias("tok_sum"),
    )
    surv_agg = surv.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_unique"),
        F.expr(
            "md5(array_join(transform(array_sort(collect_list("
            "struct(rid, body))), x -> x.body), '\n'))"
        ).alias("surv_md5"),
    )
    probe_full = (
        n_resp.join(kept_agg, "file_id")
        .join(surv_agg, "file_id")
        .withColumnRenamed("file_id", "variant")
    )
    docs = t["documents"].select(
        "doc_id", (F.col("doc_id") % 8).alias("variant")
    )
    return docs.join(F.broadcast(probe_full), "variant").select(
        "doc_id",
        "variant",
        "n_responses",
        "n_kept",
        "tok_sum",
        "n_unique",
        "surv_md5",
    )
