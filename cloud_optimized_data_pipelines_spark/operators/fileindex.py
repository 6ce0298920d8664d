"""Secondary file-level index for plain parquet — manifest-style data
skipping without a table format.

Lakehouse formats keep per-file column stats in manifests so a reader
plans from a few KB of metadata instead of opening 100 TB worth of
footers (at ~1M files, even footer reads are a distributed job).  This
operator reproduces that: a one-job index build materializes per-file
min/max/null-count for chosen columns into a tiny parquet table, and a
pruned read consults the index (driver-side, it is small), then scans
ONLY the surviving files.

Composes with the clustered writers: ``sinks.write_range_clustered``
(1-D) and ``operators/zorder.write_zorder_clustered`` (multi-D) make
per-file ranges tight, which is what turns this index from "touches
every file" into "touches n^(1/d)".  Stats come from the rows
themselves (input_file_name + agg) so the build is one distributed
scan — no driver-side footer walking.

Staleness rule: the index stores the file listing it was built from; a
pruned read re-lists and falls back to the full scan if the table
gained files the index has not seen (correctness over speed).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_index(
    spark: SparkSession,
    table_path: str,
    columns: Sequence[str],
    index_path: str | None = None,
) -> DataFrame:
    """One distributed job: per-file min/max/null_count for ``columns``.

    Returns the index frame; when ``index_path`` is given it is also
    persisted (overwrite) so later sessions plan from it directly.
    """
    df = spark.read.parquet(table_path)
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    idx = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    if index_path is not None:
        idx.write.mode("overwrite").parquet(index_path)
        idx = spark.read.parquet(index_path)
    return idx


def _data_files(table_path: str) -> set[str]:
    out = set()
    for root, _dirs, files in os.walk(table_path):
        for f in files:
            if f.endswith(".parquet"):
                out.add("file://" + os.path.join(root, f))
    return out


def pruned_read(
    spark: SparkSession,
    table_path: str,
    index: DataFrame,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Read only files whose indexed [min,max] of ``column`` intersects
    [lo, hi], with the predicate re-applied (the index prunes files;
    parquet row-group stats + the filter handle the rest).

    The index is file-count-sized (tiny next to the data), so the
    candidate listing is a driver-side collect by design — the same
    shape as a manifest read in a table format.
    """
    current = _data_files(table_path)
    indexed_rows = index.select("file", f"min_{column}", f"max_{column}").collect()
    indexed = {r["file"] for r in indexed_rows}
    pred = (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
    if not indexed >= current:
        # index is stale (new files since build): correctness first
        return spark.read.parquet(table_path).filter(pred)
    keep = [
        r["file"]
        for r in indexed_rows
        if r["file"] in current
        and r[f"max_{column}"] >= lo
        and r[f"min_{column}"] <= hi
    ]
    if not keep:
        return spark.read.parquet(table_path).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)
