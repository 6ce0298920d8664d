"""Streaming corpus dedup against a persistent digest table.

The streaming half of ``operators/dedup.py::incremental_dedup``: a
document stream (crawl output, queue drain) is exact-deduplicated both
WITHIN each micro-batch and AGAINST everything previously admitted,
with only md5 digests persisted as state (16 bytes/doc at 100 TB —
the same digest-table economics as the batch operator).

Replay safety (foreachBatch + file sinks is at-least-once on retry):
both outputs are written ``partitionBy('batch_id')`` with DYNAMIC
partition overwrite, and the history anti-join EXCLUDES digests carrying
the current batch id.  A replayed batch therefore recomputes exactly
the survivor set it computed before the failure and overwrites its own
partition idempotently — the standard idempotent-sink recipe for
exactly-once semantics over append-only storage.

Determinism: within a batch the minimum ``id_col`` per digest survives;
across batches the earliest batch wins (later batches anti-join against
the accumulated digest table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_survivors(
    batch: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Min-id survivor per md5 digest within one batch (partial-agg
    groupBy, not a window — no per-digest sort)."""
    hashed = batch.withColumn("_h", F.md5(F.col(content_col)))
    keep = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["_h", id_col], "left_semi")


def stream_exact_dedup(
    stream_df: DataFrame,
    content_col: str,
    id_col: str,
    out_path: str,
    digest_path: str,
    checkpoint_path: str,
    bloom_path: str | None = None,
    bloom_m_bits: int | str = "auto",
    bloom_k_hashes: int = 4,
):
    """Start an availableNow stream that appends never-seen-before
    documents to ``out_path`` and their digests to ``digest_path``.

    Each micro-batch: in-batch min-id dedup -> left-anti join against
    the persisted digest table (excluding this batch's own id, for
    replay idempotence) -> dynamic-partition-overwrite both outputs
    under ``batch_id=N``.

    ``bloom_path`` enables the BLOOM GATE (the crawler use-case the
    sketch module cites): a fixed-size mergeable Bloom filter of every
    admitted digest (``operators/sketches.py::bloom_partial``) is
    probed BEFORE the anti-join — digests the filter has definitely
    never seen (no false negatives) skip the join entirely, so the
    common all-new-keys crawl batch never touches the big digest
    table; only the ``maybe_present`` remainder (true dups + the
    designed false-positive rate) anti-joins.  Results are identical
    to the ungated path by the no-false-negative property
    (property-tested); the filter is ~m_bits/63 BIGINT rows —
    broadcastable at any corpus size — and its per-batch partials are
    replay-safe because ``bit_or`` merge is idempotent.

    ``bloom_m_bits="auto"`` (default) sizes the filter from the
    persisted digest count each batch (~1% FPR), rebuilding it from
    the digest table when it would saturate or when the bloom table
    does not cover every digest batch — see
    :func:`process_dedup_batch` for the lifecycle invariants.
    """
    spark = stream_df.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            spark, batch, batch_id, content_col, id_col, out_path,
            digest_path, bloom_path=bloom_path, bloom_m_bits=bloom_m_bits,
            bloom_k_hashes=bloom_k_hashes,
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _auto_bloom_size(n_seen: int) -> tuple[int, int]:
    """(m_bits, k_hashes) targeting ~1% FPR at ``n_seen`` keys:
    m = next power of two >= -n*ln(0.01)/ln(2)^2 (~9.59 bits/key,
    floor 1 << 16), k = round(ln2 * m/n) clamped to [1, 8].  Power-of-
    two m keeps resizes rare (each rebuild at least doubles capacity);
    the k cap bounds the probe-explode fan-out."""
    import math

    n = max(1, int(n_seen))
    opt = -n * math.log(0.01) / (math.log(2) ** 2)
    m = 1 << max(16, math.ceil(math.log2(opt)))
    k = min(8, max(1, round(math.log(2) * m / n)))
    return m, k


def _bloom_table_state(
    spark, bloom_path: str, batch_id: int
) -> tuple[set, tuple[int, int] | None]:
    """(batch_ids covered, (m,k) if uniform else None) of the persisted
    bloom table, excluding the current batch's own partition.  Metadata
    sized: one row per (batch, size) pair."""
    if not os.path.exists(bloom_path):
        return set(), None
    raw = spark.read.parquet(bloom_path).filter(F.col("batch_id") != batch_id)
    if "m_bits" not in raw.columns or "k_hashes" not in raw.columns:
        # pre-versioned filter of unknown geometry: force a rebuild
        return {r.batch_id for r in raw.select("batch_id").distinct().collect()}, None
    meta = raw.select("batch_id", "m_bits", "k_hashes").distinct().collect()
    sizes = {(int(r.m_bits), int(r.k_hashes)) for r in meta}
    return (
        {r.batch_id for r in meta},
        sizes.pop() if len(sizes) == 1 else None,
    )


def process_dedup_batch(
    spark,
    batch: DataFrame,
    batch_id: int,
    content_col: str,
    id_col: str,
    out_path: str,
    digest_path: str,
    bloom_path: str | None = None,
    bloom_m_bits: int | str = "auto",
    bloom_k_hashes: int = 4,
) -> None:
    """One micro-batch of the streaming dedup (exposed for replay
    tests: calling it twice with the same batch_id must be a no-op).
    With ``bloom_path`` set, the history anti-join runs only on the
    digests the Bloom filter reports ``maybe_present`` (see
    :func:`stream_exact_dedup`).

    Filter lifecycle (the no-false-negative property only holds when
    the filter has seen EVERY admitted digest, so both hazards below
    trigger a rebuild from the digest table — the source of truth):

    * **Coverage**: if the digest history contains batch ids the bloom
      table does not (bloom_path introduced mid-stream, or bloom files
      lost while digests survived), the missing batches' partials are
      rebuilt from the digest table before gating.  Without this,
      duplicates of pre-bloom documents would probe "definitely new"
      and skip the anti-join — admitted twice.
    * **Sizing**: ``bloom_m_bits="auto"`` (default) sizes the filter
      from the persisted digest count (~9.59 bits/key for 1% FPR,
      power-of-two, floor 64 Ki).  A fixed 64 Ki-bit filter saturates
      (FPR -> 1) past ~10^4 digests, silently degrading the gate to a
      no-op; auto mode rebuilds at the next power of two instead, so
      the claimed digest-scan reduction holds at crawl scale.  Each
      partial records its (m_bits, k_hashes); any geometry mismatch —
      including pre-versioned tables with no size columns — rebuilds
      the whole filter (bit positions depend on m, so partials of
      different sizes must never be merged).

    Rebuilds are one scan of the 16-byte-per-doc digest table, written
    static-overwrite so no stale-geometry partition can survive; the
    sizing inputs exclude the current batch's own partitions, so a
    replayed batch recomputes the identical geometry and stays
    idempotent."""
    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_contains,
        bloom_merge,
        bloom_partial,
    )

    survivors = _batch_survivors(batch, content_col, id_col)
    bloom_mk: tuple[int, int] | None = None
    if os.path.exists(digest_path):
        seen_all = spark.read.parquet(digest_path).filter(
            # exclude own partition: on replay our digests are already
            # there and would wrongly anti-join away the whole batch
            F.col("batch_id") != batch_id
        )
        seen = seen_all.select("_h")
        if bloom_path is not None:
            if bloom_m_bits == "auto":
                bloom_mk = _auto_bloom_size(seen.count())
            else:
                bloom_mk = (int(bloom_m_bits), int(bloom_k_hashes))
            m, k = bloom_mk
            covered, stored_mk = _bloom_table_state(spark, bloom_path, batch_id)
            digest_batches = {
                r.batch_id
                for r in seen_all.select("batch_id").distinct().collect()
            }
            if stored_mk != bloom_mk or not digest_batches <= covered:
                # bootstrap/rebuild from the digest table: static
                # overwrite wipes any partial built at the old geometry
                bloom_partial(
                    seen_all, "_h", m_bits=m, k_hashes=k, dims=("batch_id",)
                ).withColumn("m_bits", F.lit(m)).withColumn(
                    "k_hashes", F.lit(k)
                ).write.mode("overwrite").partitionBy("batch_id").parquet(
                    bloom_path
                )
            bloom = bloom_merge(
                spark.read.parquet(bloom_path)
                .filter(F.col("batch_id") != batch_id)
                .select("word_idx", "bits")
            )
            flagged = bloom_contains(
                bloom, survivors, "_h", m_bits=m, k_hashes=k
            )
            # definitely-new keys can never match the compound anti-
            # join condition, so they survive without a history
            # comparison; no false negatives => identical to the plain
            # anti-join.  One join, probe chain planned once (the
            # union(fresh, checked) form duplicated it — r14).
            s = seen.select(F.col("_h").alias("_seen_h"))
            survivors = flagged.join(
                s,
                (flagged["_h"] == s["_seen_h"]) & F.col("maybe_present"),
                "left_anti",
            ).drop("maybe_present")
        else:
            survivors = survivors.join(seen, "_h", "left_anti")
    elif bloom_path is not None:
        # first batch ever: size for an empty history
        if bloom_m_bits == "auto":
            bloom_mk = _auto_bloom_size(0)
        else:
            bloom_mk = (int(bloom_m_bits), int(bloom_k_hashes))
    survivors = survivors.withColumn("batch_id", F.lit(batch_id))
    # per-writer option, NOT session conf: foreachBatch hands the batch
    # a cloned micro-batch session, so session-level conf set on the
    # outer session doesn't reach this writer — with static overwrite
    # the whole table would be wiped every batch
    survivors.drop("_h").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(out_path)
    survivors.select("_h", "batch_id").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(digest_path)
    if bloom_path is not None:
        m, k = bloom_mk
        bloom_partial(
            survivors.select("_h"), "_h", m_bits=m, k_hashes=k,
        ).withColumn("batch_id", F.lit(batch_id)).withColumn(
            "m_bits", F.lit(m)
        ).withColumn("k_hashes", F.lit(k)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "batch_id"
        ).parquet(bloom_path)
