"""Generic mergeable-partial streaming ingestion.

The pattern behind ``operators/rollup.append_stream_rollup``, factored
for ANY mergeable state (rollup rows, KMV arrays, HLL binaries, CMS
grids): each micro-batch computes its OWN partial aggregate and
APPENDS it.  Append-only is what makes this exactly-once-friendly —
no read-modify-write of existing state, so checkpoint replay after a
failure re-appends deterministically instead of corrupting a partial
update.  The query-time merge (sketch union / partial re-aggregation)
collapses however many per-batch rows accumulated; a periodic fold
compaction bounds the table size.

This is the streaming half of the 100 TB pre-aggregation story: raw
events never need a second scan — every consumer (dashboard, distinct
counter, heavy-hitter monitor) reads sketch-sized partials.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def append_stream_partials(
    stream_df: DataFrame,
    path: str,
    checkpoint_path: str,
    partial_fn: Callable[[DataFrame], DataFrame],
):
    """Start an availableNow stream that appends ``partial_fn(batch)``
    per micro-batch.  ``partial_fn`` must produce mergeable state (its
    output for the union of two batches must be derivable from its
    outputs for each batch) — rollup.hourly_rollup, sketches.kmv_partial
    and sketches.hll_partial all qualify."""

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        partial_fn(batch_df).write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
