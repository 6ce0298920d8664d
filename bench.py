"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full
computation, no driver collect bottleneck).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402

# Cross-round drift anchors (r13): re-timed once per ANCHOR_EVERY
# timed queries so every record carries its own host-noise trace —
# a scan-bound, a shuffle-hash-bound, and a vector-CPU-bound shape.
ANCHORS = (
    "q1_pricing_summary",
    "dedup_exact",
    "similarity_bruteforce_topk",
)
ANCHOR_EVERY = 10

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "q9_product_profit",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "window_topk_per_customer",
    "agg_rollup_supplier",
    # events / streaming-shape
    "events_hourly_window",
    "asof_join_last_click",
    "events_funnel_conversion",
    "events_retention_cohorts",
    # reference-pipeline operators
    "c1_extract_dates",
    "k3_transfer_plan",
    "s4_link_explode",
    # training-data extensions
    "rollup_hourly_merge",
    "sketch_kmv_uniques",
    "sample_stratified_docs",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_survivors",
    # NOTE r04: dedup_ngram_jaccard is now the UNGUARDED form (its
    # oracle applies no pruning); the skew-guarded production form is
    # benched separately as dedup_ngram_jaccard_guarded
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_guarded",
    "streaming_dlq_routing",
    "similarity_bruteforce_topk",
    "similarity_ann_topk",
    "text_quality",
    "text_gopher_quality",
    "sample_token_budget_mix",
    # r04 second batch: line-level dedup, semantic dedup, classifier
    # inference (the new graded families)
    "dedup_lines",
    "similarity_semantic_dedup",
    "text_classifier_score",
    "dedup_simhash_pairs",
    "text_c4_clean",
    # r04 third batch: duplicate-cluster graph labeling (iterative CC —
    # the timed call includes its convergence-loop actions), held-out
    # bigram LM, DSIR importance weights
    "dedup_duplicate_clusters",
    "text_bigram_backoff",
    # NOTE r10: sample_dsir_weights moved to ADDITIONS_R10 — the
    # driver records only the LAST ~2000 chars of bench stdout, so a
    # query this early in the dict never got a driver number; the r10
    # batch at the end of the output is inside the recorded tail.
]

# r06 additions (same separate-phase protocol as ADDITIONS below):
# baseline-JPEG real-bytes probe, teleport-corrected PageRank, and the
# sign-bucket-blocked embedding decontamination
ADDITIONS_R6 = [
    "multimodal_jpeg_features",
    "multimodal_png_palette",
    "graph_pagerank_dangling",
    "similarity_decontaminate_blocked",
    "dedup_cdc_chunks",
    "dedup_soft_weights",
    "sample_temperature_mix",
    "multimodal_gif_frames",
]

# r08 additions (same separate-phase protocol): the round-7 families
# that shipped without bench evidence (multiprobe-blocked embedding
# decontamination, 4:2:0/4:2:2 subsampled JPEG, GIF sub-rect
# compositing), the driver-side BPE merge loop, and the two round-8
# queries (bloom-gated incremental dedup, progressive SOF2 JPEG)
ADDITIONS_R8 = [
    "similarity_decontaminate_multiprobe",
    "multimodal_jpeg_subsampled",
    "multimodal_gif_composite",
    "text_bpe_merges",
    "dedup_bloom_gated",
    "multimodal_jpeg_progressive",
    # wide (2x60-bit) banded simhash — the past-the-BIGINT-cliff form
    "dedup_simhash_wide_pairs",
    # Arrow/numpy SemDeDup (matmul assignment + tiled Gram flags)
    "similarity_semantic_dedup_fast",
    # interlaced GIF + G.711 telephony WAV + AVI video real-bytes probes
    "multimodal_gif_interlaced",
    "multimodal_wav_g711",
    "multimodal_avi_frames",
    # szip-sourced cogify (CCSDS-121 extended-Rice HDF5 chunks)
    "k1_cogify_szip",
    # 12-bit extended-sequential JPEG (SOF1, uint16 samples)
    "multimodal_jpeg_12bit",
    # cluster-keyed train/val/test split (near-dups co-travel)
    "split_leakage_safe",
    # IMA/DVI ADPCM telephony/game-audio WAV (format tag 0x11)
    "multimodal_wav_adpcm",
    # int8 scalar-quantized retrieval + Matryoshka prefix rerank
    "similarity_quantized_topk",
    "similarity_truncated_rerank",
    # Arrow/hashlib wide-simhash fingerprints (bit-exact fast path)
    "dedup_simhash_wide_pairs_fast",
    # lossless SOF3 JPEG (Annex H, 8/16-bit, all seven predictors)
    "multimodal_jpeg_lossless",
]

# r09 additions (same separate-phase protocol): the round-9 flagships —
# the full netCDF->COG->STAC item chain with bbox/geometry/proj:*/
# raster:bands raster metadata, the learned-index family brought under
# DuckDB oracles via rounded Lloyd means (learned IVF, PQ, IVFADC),
# the JL sign projection, the GD-trained quality classifier, and
# perceptual-hash image dedup
ADDITIONS_R9 = [
    "stac_item_raster",
    "similarity_ivf_topk",
    # product quantization: compressed-domain ADC scan + exact re-rank
    "similarity_pq_topk",
    "similarity_pq_refine",
    # GD-trained hashed logistic quality classifier (6 passes)
    "text_classifier_train",
    # IVFADC (residual PQ inside IVF lists) + JL sign projection
    "similarity_ivfpq_topk",
    "similarity_random_projection",
    # per-modality near-dup over real codec bytes
    "multimodal_phash_pairs",
    "multimodal_audio_near_dup",
    "multimodal_video_near_dup",
    # Deequ-style one-pass constraint suite + FK anti-join + profiler
    "quality_constraint_report",
    "quality_column_profiles",
]

# r10 additions (same separate-phase protocol) — LAST batch so these
# land inside the driver's ~2000-char stdout tail: the DSIR pair
# (rebuilt this round: Arrow gram-memo features, fused bucket models,
# integer-scaled weight sum — VERDICT r9 task 4 wanted a driver number)
# plus this round's new graded queries.
ADDITIONS_R10 = [
    "sample_dsir_weights",
    "sample_dsir_select",
    # MS-ADPCM (WAVE tag 2) real-bytes decode — named stub closed in r10
    "multimodal_wav_ms_adpcm",
    # WordPiece subword tokenizer (BERT maximal munch) stats
    "text_wordpiece_tokens",
    # arithmetic-coded JPEG (T.81 Annex D QM-coder) real-bytes probe
    "multimodal_jpeg_arithmetic",
    # integer-exact embedding outlier screen + the upgraded (formerly
    # rows-only) generic feature-extraction plumbing
    "similarity_embedding_outliers",
    "multimodal_extract_features",
    # portable own-implementation HLL (oracle-replicable registers)
    "sketch_hll_portable",
]

# r11 additions (same separate-phase protocol; LAST batch so these
# land inside the driver's recorded tail — though the r11 compact
# final line now carries every median regardless): the five new
# graded queries plus the two whose serialization changed.
ADDITIONS_R11 = [
    # MPEG-1 Layer II bitstream probe + compressed-domain audio near-dup
    "multimodal_mp2_features",
    "multimodal_audio_compressed_near_dup",
    # scale-adaptive banded-Hamming image near-dup (band_geometry)
    "multimodal_image_near_dup_adaptive",
    # WordPiece at a 5k corpus vocabulary
    "text_wordpiece_vocab5k",
    # T.81 Annex G progressive arithmetic JPEG (SOF10)
    "multimodal_jpeg_arith_progressive",
    # ISO BMFF container round trip + compressed-domain stream walk
    "multimodal_mp4_container",
    "multimodal_mpeg_stream_info",
    # adaptive video near-dup (temporal wide aHash over real AVI bytes)
    "multimodal_video_near_dup_adaptive",
    # WARC.gz crawl ingest over the RFC 1951/1952 pure-python codec
    "text_warc_records",
    # lossless FLAC round trip (RFC 9639, self-checking via PCM MD5)
    "multimodal_flac_features",
    # .jsonl.zst shard: reference-coder frames, our RFC 8878 decode
    "text_zstd_shard",
    # crawl-to-corpus composition: WARC -> WET -> gate -> dedup
    "pipeline_crawl_ingest",
    # mixed-codec corpus front door (gz/zst/lz4/xz/bz2 magic sniff)
    "text_compressed_corpus",
    # WebDataset tar shards grouped into multimodal samples
    "multimodal_webdataset_samples",
    # (the serialization-fixed queries — extract_features, stac_item_
    # raster, embedding_outliers — already ride the R9/R10 batches)
]

ADDITIONS_R12 = [
    # MP3 Layer III compressed-domain walk (side info, bit reservoir,
    # region-switched Huffman, count1) over real frames
    "multimodal_mp3_features",
    # WARC -> WET charset resolution over mixed-charset crawl bodies
    "text_warc_charsets",
    # portable fixed-bin histogram percentiles (now hash-graded)
    "agg_approx_percentile",
    # sliding 7-day uniques from daily portable-HLL register partials
    "sketch_hll_daily_uniques",
    # banded-Hamming near-dup over parsed MP3 scalefactor fingerprints
    "multimodal_mp3_near_dup",
]

ADDITIONS_R13 = [
    # MP3 pair tables 7-15 at full alphabet + mixed short/long granules
    "multimodal_mp3_big_tables",
    # portable hash-graded HLL twin of the native approx-distinct
    "agg_approx_distinct_portable",
]

ADDITIONS_R14 = [
    # MPEG-2/2.5 (LSF) Layer III sample decode over real frames
    "multimodal_mp3_lsf",
    # size-budgeted corpus shard egress packing plan
    "egress_shard_plan",
    # DoReMi domain mixture reweighting (KL excess + tilt)
    "sample_doremi_weights",
    # salted hot-key join == plain join
    "join_skew_salted",
    # unigram-LM (SentencePiece) Viterbi segmentation
    "text_unigram_viterbi",
    # watermark drop semantics batch twin (T-family driver row)
    "streaming_watermark_replay",
    # ADTS/AAC compressed-domain header walk + tag-invariant fp
    "multimodal_adts_stream_info",
    # curate -> pack composition (gate, dedup, sample, egress plan)
    "pipeline_corpus_publish",
    # integer-exact two-sample KS drift between month halves
    "events_ks_drift",
    # deterministic synchronous label propagation communities
    "graph_label_propagation",
]

# r05 additions, warmed + timed in a SEPARATE phase AFTER the comparable
# set above so their side effects (the SemDeDup partitioned assignment
# write, PNG codec Python workers) cannot perturb the JVM/page-cache
# state the comparable measurements run under — keeps the
# round-over-round delta one subtraction.
ADDITIONS = [
    # persisted-assignment SemDeDup — the timed call includes the
    # partitioned assignment write + the indexed dedup join
    "similarity_semantic_dedup_indexed",
    # real-bytes multimodal probes (PNG + WAV codecs on executors)
    "multimodal_png_features",
    "multimodal_wav_features",
    # batch k-NN join (broadcast query batch, two-phase top-k)
    "similarity_knn_join",
    # integer-scaled PageRank (5 unrolled iterations)
    "graph_pagerank_events",
    # directional n-gram containment (doc-in-doc) on the shingle index
    "dedup_ngram_containment",
    # embedding-space eval-set decontamination (broadcast eval side)
    "similarity_embedding_decontaminate",
    # PSI drift between event-stream windows
    "events_drift_psi",
    # composed corpus-preprocessing pipeline (4 stages, one lazy plan)
    "pipeline_corpus_preprocess",
]


# Canonical timing order (batch concatenation == iteration order in
# main()).  The driver records only the LAST ~2000 chars of stdout and
# parses a JSON line only when it fits that tail entirely (r06-r10's
# verbose line never did), so the final printed line encodes EVERY
# median positionally over this order ("medians" + "order_sha1") —
# ~900 chars instead of the 3 KB named dict.  Recover names by zipping
# with QUERY_ORDER at the same commit (sha1 pins the match).
QUERY_ORDER: list[str] = []


def _freeze_order(batches) -> list[str]:
    QUERY_ORDER.clear()
    for b in batches:
        QUERY_ORDER.extend(b)
    return QUERY_ORDER


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    from cloud_optimized_data_pipelines_spark.queries import QUERIES, load_tables

    # warm the JVM + parquet footers once, outside the timings
    load_tables(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    # untimed warmup pass: whole-stage codegen compile + JIT are one-time
    # session costs, not per-query throughput — report steady state.
    # Phase 1 (comparable set), then phase 2/3 (additions) — see ADDITIONS.
    # r06 protocol change (judge ask): every query is timed THREE times
    # and the reported per-query number is the MEDIAN; the raw triples
    # ship under "runs" so cross-round deltas can be separated from
    # session-level machine drift (the r4-vs-r5 +15% uniform-drift
    # ambiguity cost a manual A/B to resolve).
    # r13 protocol change (judge ask — VERDICT r12 "What's wrong #1"):
    # the three cross-round ANCHORS are re-timed every ANCHOR_EVERY
    # timed queries, giving per-segment host-noise readings that make
    # one record interpretable WITHOUT a fresh-session A/B.  Each
    # segment's inflation factor is the median over anchors of
    # (segment reading / that anchor's quietest reading this run);
    # every query's median is reported raw AND divided by its
    # segment's factor ("normalized").
    def _noop(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    anchor_runs: dict[str, list[float]] = {a: [] for a in ANCHORS}

    def _run_anchors() -> None:
        for a in ANCHORS:
            t0 = time.perf_counter()
            _noop(a)
            anchor_runs[a].append(round(time.perf_counter() - t0, 3))

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    mins: dict[str, float] = {}
    seg_of: dict[str, int] = {}
    batches = (HEADLINE, ADDITIONS, ADDITIONS_R6, ADDITIONS_R8,
               ADDITIONS_R9, ADDITIONS_R10, ADDITIONS_R11, ADDITIONS_R12,
               ADDITIONS_R13, ADDITIONS_R14)
    _freeze_order(batches)
    for a in ANCHORS:  # anchor codegen/JIT warmup, outside all timings
        _noop(a)
    timed = 0
    for batch in batches:
        for name in batch:
            _noop(name)
        for name in batch:
            if timed % ANCHOR_EVERY == 0:
                _run_anchors()
            seg_of[name] = len(anchor_runs[ANCHORS[0]]) - 1
            trio = []
            for _ in range(3):
                t0 = time.perf_counter()
                _noop(name)
                trio.append(round(time.perf_counter() - t0, 3))
            runs[name] = trio
            timings[name] = sorted(trio)[1]
            mins[name] = min(trio)
            timed += 1
    _run_anchors()  # closing reading so the last segment is bracketed

    ref = {a: min(anchor_runs[a]) for a in ANCHORS}
    n_seg = len(anchor_runs[ANCHORS[0]])
    factors = [
        round(sorted(
            anchor_runs[a][s] / ref[a] for a in ANCHORS
        )[len(ANCHORS) // 2], 4)
        for s in range(n_seg)
    ]
    normalized = {
        name: round(t / factors[seg_of[name]], 3)
        for name, t in timings.items()
    }
    total = round(sum(timings.values()), 3)
    norm_total = round(sum(normalized.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        # r15 (VERDICT r14 item 3, addition-only): per-query min-of-3 —
        # a single host-noise burst inflates the median of 3 when it
        # hits 2 of the runs, but almost never all 3; the min is the
        # burst-robust reading.  Derivable from "runs", surfaced as a
        # first-class field so cross-round tooling needn't recompute.
        "mins": mins,
        "anchors": anchor_runs,
        "anchor_factors": factors,
        "query_segment": seg_of,
        "normalized": normalized,
        "norm_value": norm_total,
        "sf": sf_val,
    }
    # verbose record first (humans; the driver's tail truncates it) ...
    print(json.dumps(full))
    # ... full copy to a repo file the round-end commit picks up ...
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json"),
            "w",
        ) as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    # ... and a compact FINAL line that fits the driver's 2000-char
    # tail whole: every median positionally over QUERY_ORDER (sha1-
    # pinned), plus the named dict for the 12 slowest queries.
    order_sha1 = hashlib.sha1(
        ",".join(QUERY_ORDER).encode()
    ).hexdigest()[:12]
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:12]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "norm_value": norm_total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "order_sha1": order_sha1,
        "medians": [timings[n] for n in QUERY_ORDER],
        # r15 (VERDICT r14 item 3): positional min-of-3 per query, same
        # order as "medians" — the burst-robust reading (see "mins" in
        # the full record above).  Budget fallback below sparsifies it.
        "mins": [mins[n] for n in QUERY_ORDER],
        "anchors": anchor_runs,
        "anchor_factors": factors,
        "sf": sf_val,
    }
    line = json.dumps(compact, separators=(",", ":"))
    # budget order: trim slowest-query entries down to a floor of 6,
    # then sparsify the positional mins to just the burst-suspect
    # entries where median >> min (exactly the rows the min exists to
    # defend), then drop the raw anchor traces (factors alone still
    # carry the noise signal), then drop mins entirely, then — only if
    # still over — the remaining queries
    while len(line) > 1900 and len(compact["queries"]) > 6:
        compact["queries"].popitem()
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900 and "mins" in compact:
        compact.pop("mins")
        ratio = 1.2
        while True:
            sparse = {
                str(i): mins[n]
                for i, n in enumerate(QUERY_ORDER)
                if timings[n] > ratio * mins[n]
            }
            compact["mins_lo"] = sparse
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= 1900 or not sparse:
                break
            ratio *= 1.5
    if len(line) > 1900:
        compact.pop("anchors", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact.pop("mins_lo", None)
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1900 and compact["queries"]:
        compact["queries"].popitem()
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
