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
    bloom_m_bits: int = 1 << 16,
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


def process_dedup_batch(
    spark,
    batch: DataFrame,
    batch_id: int,
    content_col: str,
    id_col: str,
    out_path: str,
    digest_path: str,
    bloom_path: str | None = None,
    bloom_m_bits: int = 1 << 16,
    bloom_k_hashes: int = 4,
) -> None:
    """One micro-batch of the streaming dedup (exposed for replay
    tests: calling it twice with the same batch_id must be a no-op).
    With ``bloom_path`` set, the history anti-join runs only on the
    digests the Bloom filter reports ``maybe_present`` (see
    :func:`stream_exact_dedup`)."""
    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_contains,
        bloom_merge,
        bloom_partial,
    )

    survivors = _batch_survivors(batch, content_col, id_col)
    if os.path.exists(digest_path):
        seen = spark.read.parquet(digest_path)
        # exclude own partition: on replay our digests are already
        # there and would wrongly anti-join away the whole batch
        seen = seen.filter(F.col("batch_id") != batch_id).select("_h")
        if bloom_path is not None and os.path.exists(bloom_path):
            bloom = bloom_merge(
                spark.read.parquet(bloom_path)
                .filter(F.col("batch_id") != batch_id)
                .select("word_idx", "bits")
            )
            flagged = bloom_contains(
                bloom, survivors, "_h",
                m_bits=bloom_m_bits, k_hashes=bloom_k_hashes,
            )
            # definitely-new keys skip the digest-table scan entirely;
            # no false negatives => the union equals the plain anti-join
            fresh = flagged.filter(~F.col("maybe_present")).drop(
                "maybe_present"
            )
            checked = (
                flagged.filter(F.col("maybe_present"))
                .drop("maybe_present")
                .join(seen, "_h", "left_anti")
            )
            survivors = fresh.unionByName(checked)
        else:
            survivors = survivors.join(seen, "_h", "left_anti")
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
        bloom_partial(
            survivors.select("_h"), "_h",
            m_bits=bloom_m_bits, k_hashes=bloom_k_hashes,
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "batch_id"
        ).parquet(bloom_path)
