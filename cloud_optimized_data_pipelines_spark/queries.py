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
# 50 registrations only.  Round-12 policy (VERDICT r11 task 1): 4 slots
# to the never-driver-green r12 queries (MP3 Layer III, the WET charset
# chain, and the two former rows-only queries now carried by portable
# hash-graded forms — histogram percentiles and the sliding daily-HLL
# rollup); 6 slots RE-PROVE every query whose implementation changed
# this round (the FLAC STREAMINFO/frame-header fixes changed fixture
# bytes and md5 pins; the zstd default-engine flip and BatchFlusher
# output batching sit under the five crawl-ingest queries); 31 slots
# sweep ALL remaining r7 ledger rows (the VERDICT's staleness list
# verbatim — after CORRECTNESS_r12 nothing driver-graded is older than
# r8); 9 ever-green anchors / family keepers.  Everything demoted
# stays registered and locally oracle-checked at sf0.001/0.01/0.1
# (tools/check_oracle.py covers all entries; COVERAGE.md's ledger
# records each query's last driver-green round).
# ---------------------------------------------------------------------------

_GRADED_WINDOW = [
    # --- never driver-green (the four r12 queries) ---
    "multimodal_mp3_features",      # Layer III side info/reservoir/Huffman
    "text_warc_charsets",           # WET Content-Type charset chain
    "agg_approx_percentile",        # portable histogram quantiles (hash-graded)
    "sketch_hll_daily_uniques",     # sliding 7-day portable-HLL rollup
    # --- changed-implementation re-proves (r12 edits) ---
    "multimodal_flac_features",     # STREAMINFO min/max + frame-header rate
    "text_zstd_shard",              # default engine now auto->CLI
    "text_compressed_corpus",       # default engine + BatchFlusher
    "text_warc_records",            # BatchFlusher output batching
    "pipeline_crawl_ingest",        # rides warc/http sources
    "multimodal_webdataset_samples",  # pax length-prefix + BatchFlusher
    # --- staleness sweep: ALL 31 remaining r7 ledger rows ---
    "dedup_ngram_containment",
    "dedup_ngram_jaccard_guarded",
    "dedup_simhash_pairs",
    "dedup_source_overlap",
    "dedup_substring_cut",
    "events_drift_psi",
    "graph_pagerank_dangling",
    "multimodal_gif_frames",
    "multimodal_jpeg_features",
    "multimodal_png_palette",
    "multimodal_png_resize",
    "multimodal_wav_downsample",
    "privacy_k_anonymous",
    "rollup_hourly_merge",
    "sample_ccnet_buckets",
    "sample_token_budget_mix",
    "sessionize_batch_events",
    "similarity_decontaminate_blocked",
    "similarity_embedding_decontaminate",
    "similarity_knn_join",
    "similarity_semantic_dedup",
    "similarity_semantic_dedup_indexed",
    "sketch_cms_heavy_hitters",
    "sketch_kmv_uniques",
    "text_bigram_backoff",
    "text_bm25_scores",
    "text_c4_clean",
    "text_classifier_score",
    "text_decontaminate",
    "text_distribution_shift",
    "text_ngram_repetition",
    # --- ever-green anchors + family/coverage keepers ---
    "q1_pricing_summary",
    "q21_waiting_supplier",
    "c1_extract_dates",
    "s2_discovery_enrich",
    "k1_cogify_real_bytes",
    "k3_transfer_plan",
    "dedup_lsh_survivors",
    "similarity_ivf_topk",
    "multimodal_mp3_near_dup",  # yielded by pipeline_corpus_preprocess
    # (r11-green) for the new Layer III near-dup — fingerprints off
    # PARSED MP3 scalefactors through the reservoir machinery
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
