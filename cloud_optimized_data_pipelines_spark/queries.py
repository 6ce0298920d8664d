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
# r14: the 3,049-line q_survey_misc grab-bag was split VERBATIM into
# five theme modules (VERDICT r13 task 5) — refops-extra / sketches-
# graph / text-quality / sampling / dedup-extra (q_text_quality
# precedes q_sampling because the CCNet-bucket oracle shares
# _UNIGRAM_CTES); the order snapshot was re-baselined for this
# one-time move (the graded window is order-pinned independently).
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
    q_refops_extra,
    q_sketches_graph,
    q_text_quality,
    q_sampling,
    q_dedup_extra,
)

# ---------------------------------------------------------------------------
# Registration order.  The driver's correctness harness grades the FIRST
# 50 registrations only.  Round-14 policy (VERDICT r13 task 1):
# text_warc_charsets FIRST (its fixture gained a ninth case in r13 and
# two r14 changes touch it again — the tail-repair guards narrowed per
# r13 ADVICE and the cut-case text gained a non-ASCII prefix char — so
# its driver-green bytes are two rounds behind its actual bytes); then
# ALL 33 rows last driver-graded r9 (the VERDICT's staleness list
# verbatim); the remaining 16 slots fill from the r10 cohort in ledger
# order.  After CORRECTNESS_r14 nothing driver-graded is older than
# r10.  Everything demoted stays registered and locally oracle-checked
# at sf0.001/0.01/0.1 (tools/check_oracle.py covers all entries;
# COVERAGE.md's ledger records each query's last driver-green round).
# New r14 queries land mid-round by SWAPPING OUT trailing r10 fills
# (never the warc re-grade or the r9 sweep).
# ---------------------------------------------------------------------------

_GRADED_WINDOW = [
    # --- changed-fixture re-grade (r13 ninth case + r14 repair guards) ---
    "text_warc_charsets",
    # --- staleness sweep: ALL 33 remaining r9 ledger rows ---
    "agg_cube_orders",
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_wide_pairs_fast",
    "events_dedup_first_per_key",
    "events_funnel_conversion",
    "join_lateral_top2_orders",
    "multimodal_jpeg_lossless",
    "multimodal_wav_adpcm",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_lines_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q22_idle_customers",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "similarity_pq_refine",
    "similarity_quantized_topk",
    "similarity_random_projection",
    "similarity_truncated_rerank",
    "sort_limit_top20_orders",
    "window_rank_functions",
    "window_running_total",
    # --- r10-cohort fills (ledger order; trailing ones swap for new
    # r14 queries as they land) ---
    "agg_distinct_by_segment",
    "agg_grouping_sets_orders",
    "agg_modern_functions",
    "agg_percentiles",
    "agg_rollup_supplier",
    "asof_join_last_click",
    # --- new r14 queries (swapped for trailing r10 fills) ---
    "multimodal_mp3_lsf",  # LSF sample decode (VERDICT r13 task 3)
    "egress_shard_plan",  # corpus shard egress (new r14 family)
    "sample_doremi_weights",  # DoReMi mixture reweighting (new r14)
    "join_skew_salted",  # salted hot-key join == plain join (new r14)
    "text_unigram_viterbi",  # unigram-LM Viterbi tokenizer (new r14)
    "streaming_watermark_replay",  # watermark drop semantics (new r14)
    "multimodal_adts_stream_info",  # ADTS/AAC header walk (new r14)
    "pipeline_corpus_publish",  # curate -> pack composition (new r14)
    "events_ks_drift",  # integer-exact two-sample KS drift (new r14)
    "graph_label_propagation",  # deterministic sync LPA (new r14)
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
