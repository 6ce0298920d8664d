"""The engine's query surface — every SURVEY section-2 operator (plus the
training-data extensions) as a named (spark, sf_dir) -> DataFrame query
with a matching DuckDB oracle SQL string.

Conventions that make the oracle hash-match exact:
- Money aggregates run in DECIMAL (exact, order-independent) internally,
  and only the FINAL emitted value is cast to DOUBLE on BOTH sides, so
  both engines produce identical IEEE bits regardless of how each
  serializes declared decimal scale.  This conversion is bit-identical
  while the unscaled decimal fits in 2^53 (true through sf1 at
  DECIMAL(38,6); for larger scale probes compare the decimal's
  canonical string instead).  Doubles appear mid-expression only where
  the computation is an identical IEEE expression per row (ratios,
  cosine left-folds).
- Every computed column is aliased identically in Spark and SQL.
- Where Spark produces INT (size, year), the result is cast to BIGINT
  to match DuckDB's len()/date_part types — and DuckDB integer sums are
  cast down from HUGEINT to BIGINT.
- Content hashing is md5 (bit-identical across engines).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates
from cloud_optimized_data_pipelines_spark.functions.ids import item_id
from cloud_optimized_data_pipelines_spark.functions import text as T
from cloud_optimized_data_pipelines_spark.functions import vectors as V
from cloud_optimized_data_pipelines_spark.operators import dedup as D
from cloud_optimized_data_pipelines_spark.operators import similarity as S
from cloud_optimized_data_pipelines_spark.operators.transfer import plan_transfer
from cloud_optimized_data_pipelines_spark.sources import cmr as cmr_src
from cloud_optimized_data_pipelines_spark.sources import inventory as inv_src

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# parquet TIMESTAMP(NANOS) columns (no native Spark type): read as long
# via legacy.parquet.nanosAsLong, floor-divided to microseconds below —
# exactly DuckDB's ns->us truncation, keeping oracle values identical.
_NANO_TS_COLUMNS = {"events": ["ts"]}


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # memoized per (session, sf_dir): the driver harness calls every
    # query separately and footer re-reads cost ~1s per call otherwise
    cache_key = (id(spark), sf_dir)
    if cache_key in _TABLE_CACHE:
        return _TABLE_CACHE[cache_key]
    # runtime-settable; applied here too so driver-provided sessions
    # (not built by session.get_spark) read the testdata identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import os

    dfs = {}
    parallelism = spark.sparkContext.defaultParallelism
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        df = spark.read.parquet(path)
        for c in _NANO_TS_COLUMNS.get(t, []):
            if dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(
                    c,
                    F.timestamp_micros(F.expr(f"{c} div 1000")).cast(
                        "timestamp_ntz"
                    ),
                )
        # single-row-group test files scan as ONE partition regardless of
        # maxPartitionBytes, serializing all downstream CPU work; spread
        # fact-sized tables across the cluster.  At production scale
        # (many input splits) the condition never triggers.
        try:
            fsize = os.path.getsize(path)
        except OSError:
            fsize = 0
        if fsize > 512 * 1024 and df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
        df.createOrReplaceTempView(t)
        dfs[t] = df
    _TABLE_CACHE[cache_key] = dfs
    return dfs


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return reg




# ---------------------------------------------------------------------------
# Family registry modules (r11 split — VERDICT r10 task 9).  IMPORT
# ORDER IS REGISTRATION ORDER: each module registers its queries via
# the @query decorator at import; tests/test_registry_order.py pins the
# resulting dict order against the pre-split registry.
# Late-r11 amendment: six new never-green rows — text_warc_records
# (WARC.gz over the new RFC 1951/1952 codec), multimodal_flac_features
# (lossless FLAC, RFC 9639), text_zstd_shard (.jsonl.zst over the RFC
# 8878 decoder, CLI-conformance-checked), pipeline_crawl_ingest (the
# WARC -> WET -> quality gate -> global exact-dedup composition),
# text_compressed_corpus (5-codec magic-sniff ingest incl. the new
# LZ4-frame codec) and multimodal_webdataset_samples (ustar tar
# shards grouped into multimodal samples).  dedup_simhash_pairs,
# similarity_knn_join, text_c4_clean, dedup_ngram_containment,
# text_bigram_backoff and similarity_semantic_dedup yield their
# r7-sweep seats (each family keeps 2+ representatives).
# ---------------------------------------------------------------------------

from cloud_optimized_data_pipelines_spark.registry import (  # noqa: E402,F401
    q_relational,
    q_events_shape,
    q_refops,
    q_dedup,
    q_similarity,
    q_text,
    q_multimodal,
    q_sessionize,
    q_relational_extra,
    q_survey_misc,
    q_r11_additions,
)

# ---------------------------------------------------------------------------
# Registration order.  The driver's correctness harness grades the FIRST
# 50 registrations only.  Round-11 policy (VERDICT r10 task 3): 5 slots
# to the never-driver-green r11 queries (MPEG-1 Layer II bitstream
# probe, the compressed-domain audio near-dup, the scale-adaptive image
# near-dup, the 5k-vocabulary WordPiece, the SOF10 progressive
# arithmetic JPEG); 6 slots RE-PROVE every query whose implementation
# or serialization changed this round (the two %.9f->integer-scaled
# fixes, the DECIMAL moment sums, the MS-ADPCM header fix whose bytes
# and md5 pins changed, the rice odd-J second-extension policy behind
# the szip probe, and the arithmetic JPEG whose AC procedure gained
# band parameters); 13 sweep ALL remaining r4+r5 ledger rows (the
# VERDICT's staleness list verbatim); 7 anchors/core-pipeline keepers;
# and 16 sweep the stalest r7 band with family representatives first
# (privacy_k_anonymous / rollup_hourly_merge yielded their slots to the
# late-round MP4-container and MPEG-stream-walk queries).
# After CORRECTNESS_r11 nothing driver-graded is older than r7, and the
# r7 band shrinks from 41 rows to 22.  Everything demoted stays
# registered and locally oracle-checked at sf0.001/0.01/0.1
# (tools/check_oracle.py covers all entries; COVERAGE.md's ledger
# records each query's last driver-green round).
# ---------------------------------------------------------------------------

_GRADED_WINDOW = [
    # --- never driver-green (the eight r11 queries) ---
    "multimodal_mp2_features",            # MPEG-1 Layer II bitstream
    "multimodal_audio_compressed_near_dup",  # scf fp + adaptive bands
    "multimodal_image_near_dup_adaptive",  # band_geometry ladder
    "text_wordpiece_vocab5k",             # non-toy vocabulary
    "multimodal_jpeg_arith_progressive",  # T.81 Annex G SOF10
    "multimodal_mp4_container",           # ISO BMFF sample tables
    "multimodal_mpeg_stream_info",        # compressed-domain walk
    "multimodal_video_near_dup_adaptive",  # adaptive triple complete
    "text_warc_records",                  # WARC.gz ingest (RFC 1951)
    "multimodal_flac_features",           # lossless FLAC (RFC 9639)
    "text_zstd_shard",                    # .jsonl.zst (RFC 8878)
    "pipeline_crawl_ingest",              # WARC->WET->gate->dedup
    "text_compressed_corpus",             # 5-codec magic-sniff ingest
    "multimodal_webdataset_samples",      # tar-shard sample grouping
    # --- changed-implementation re-proves (r11 edits) ---
    "multimodal_extract_features",  # integer-scaled serialization
    "stac_item_raster",             # bbox integer-scaled
    "similarity_embedding_outliers",  # DECIMAL(38,0) moments
    "multimodal_wav_ms_adpcm",      # byte-rate header fix (new md5s)
    "k1_cogify_szip",               # rice odd-J SE policy
    "multimodal_jpeg_arithmetic",   # shared AC band refactor
    # --- staleness sweep: ALL remaining r4 + r5 ledger rows ---
    "j4_collection_join",
    "multimodal_payload_meta",
    "rollup_cascade_daily",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    "dedup_lsh_survivors",
    "dedup_substring_spans",
    "sample_cap_per_source",
    "multimodal_png_features",
    "multimodal_wav_features",
    "text_unigram_logprob",
    # --- ever-green anchors + core-pipeline keepers ---
    "c1_extract_dates",
    "streaming_dlq_routing",
    "s2_discovery_enrich",
    "s4_link_explode",
    "j1_config_join",
    "k2_spill_flag",
    "pipeline_corpus_preprocess",
    # --- staleness sweep: 16 of the 41 r7 rows (family reps first:
    # the cogify/rice chain, the core transfer plan, dedup/similarity/
    # text/graph representatives) ---
    "k1_cogify_real_bytes",
    "k1_cogify_stage",
    "k3_transfer_plan",
    "a3_collection_extent",
    "c4_item_id",
    "dedup_lines",
    "dedup_lsh_clusters",
    "similarity_bruteforce_topk",
    "text_gopher_quality",
    "graph_pagerank_events",
]


def _reorder_registry() -> None:
    missing = [n for n in _GRADED_WINDOW if n not in QUERIES]
    unoracled = [n for n in _GRADED_WINDOW if n not in ORACLE]
    if missing or unoracled:
        raise RuntimeError(
            f"graded window broken: missing={missing} unoracled={unoracled}"
        )
    rest = [n for n in QUERIES if n not in set(_GRADED_WINDOW)]
    order = _GRADED_WINDOW + rest
    for mapping in (QUERIES, ORACLE):
        ordered = {n: mapping[n] for n in order if n in mapping}
        mapping.clear()
        mapping.update(ordered)


_reorder_registry()
