"""Small-files compaction — table maintenance for long-running pipelines.

Streaming/queue stages (streaming/queues.py) and per-batch appends leave
many small parquet files; at 100 TB the file count, not the byte count,
becomes the scan bottleneck (one task + one footer read per file).
Compaction rewrites a table into files near a target size.

No Delta/Iceberg in this container, so this is plain-parquet, rewrite-
into-temp-then-swap; table formats would make the swap transactional —
the sizing logic is the part that transfers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> tuple[int, int]:
    """Rewrite ``path`` into ceil(total_bytes / target) files.

    Returns (files_before, files_after).  A no-op when the table already
    has fewer files than ``min_files_to_compact``.  The rewrite goes to
    a sibling temp dir first, then atomically (rename-level) swaps —
    readers racing the swap see the old or new table, never a partial
    one (per-directory; a real lakehouse format would version this).
    """
    before, total = table_file_stats(path)
    if before < min_files_to_compact:
        return before, before
    n_out = max(1, -(-total // target_file_bytes))
    tmp = path.rstrip("/") + "._compacting"
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after, _ = table_file_stats(path)
    return before, after
