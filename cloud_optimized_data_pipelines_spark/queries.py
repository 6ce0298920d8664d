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
# resulting dict order (window + source order) and the r12 snapshot.
# r12: the round-named q_r11_additions grab-bag was folded VERBATIM
# into its family modules (VERDICT r11 task 9) — WordPiece + crawl
# ingest into q_text, the composed crawl pipeline into q_survey_misc,
# the eight multimodal probes into q_multimodal; the order snapshot
# was re-baselined for this one-time move.
# ---------------------------------------------------------------------------

from cloud_optimized_data_pipelines_spark.registry import (  # noqa: E402,F401
    q_relational,
    q_events_shape,
    q_refops,
    q_dedup,
    q_similarity,
    q_text,
    q_multimodal,
    q_multimodal_image,
    q_multimodal_audio,
    q_multimodal_video,
    q_sessionize,
    q_relational_extra,
    q_survey_misc,
)

# ---------------------------------------------------------------------------
# Registration order.  The driver's correctness harness grades the FIRST
# 50 registrations only.  Round-13 policy (VERDICT r12 task 1): 46
# slots sweep ALL remaining r8 ledger rows (the VERDICT's staleness
# list verbatim — after CORRECTNESS_r13 nothing driver-graded is older
# than r9); 2 slots to the never-driver-green r13 queries (the MP3
# pair-table 7-15 / mixed-block probe and the portable hash-graded
# approx-distinct twin); 2 slots RE-PROVE the queries whose fixture
# bytes changed this round (encode_mp3 now auto-selects the smallest
# covering pair table, so granules with an empty big_values region
# carry table_select 0 where they carried 1 — both MP3 r12 queries'
# streams shift).  No ever-green anchor slots this round: the
# staleness sweep leaves no room, and the bench anchors in bench.py
# cover drift detection independently.  Everything demoted stays
# registered and locally oracle-checked at sf0.001/0.01/0.1
# (tools/check_oracle.py covers all entries; COVERAGE.md's ledger
# records each query's last driver-green round).
# r14 NOTE: text_warc_charsets' fixture table gained a ninth case in
# r13 (undeclared UTF-8 cut mid-sequence -> tail repair) — its output
# changed (locally 3-SF green), so give it an r14 re-grade slot along
# with the r9-stale sweep.
# ---------------------------------------------------------------------------

_GRADED_WINDOW = [
    # --- staleness sweep: ALL 46 remaining r8 ledger rows ---
    "a1_array_extent",
    "agg_conditional_pivot",
    "agg_having_frequent_customers",
    "c7_url_parse",
    "dedup_bloom_gated",
    "dedup_cdc_chunks",
    "dedup_fuzzy_guard_report",
    "dedup_fuzzy_prefix",
    "dedup_simhash_wide_pairs",
    "dedup_soft_weights",
    "events_gap_stats",
    "j3_granule_enrichment",
    "join_range_ship_window",
    "multimodal_avi_frames",
    "multimodal_frame_sample",
    "multimodal_gif_composite",
    "multimodal_gif_interlaced",
    "multimodal_jpeg_12bit",
    "multimodal_jpeg_progressive",
    "multimodal_jpeg_subsampled",
    "multimodal_wav_g711",
    "pipeline_corpus_prep",
    "s3_cmr_predicates",
    "sample_stratified_docs",
    "sample_temperature_mix",
    "scalar_date_functions",
    "scalar_string_functions",
    "set_union_distinct",
    "similarity_ann_multiprobe",
    "similarity_decontaminate_multiprobe",
    "similarity_embedding_near_dup",
    "similarity_ivf_probe",
    "similarity_semantic_dedup_fast",
    "sketch_bloom_membership",
    "subquery_exists_big_orders",
    "subquery_scalar_above_avg",
    "text_bpe_encode_stats",
    "text_bpe_merges",
    "text_bpe_pair_counts",
    "text_chunk_sliding",
    "text_doc_top_tokens",
    "text_fingerprint",
    "text_pack_sequences",
    "text_pii_redact",
    "text_simhash",
    "text_token_top20",
    # --- never driver-green (the two r13 queries) ---
    "multimodal_mp3_big_tables",    # pair tables 7-15 + mixed blocks
    "agg_approx_distinct_portable",  # hash-graded HLL estimator math
    # --- changed-fixture re-proves (r13 encoder auto-table choice) ---
    "multimodal_mp3_features",
    "multimodal_mp3_near_dup",
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
