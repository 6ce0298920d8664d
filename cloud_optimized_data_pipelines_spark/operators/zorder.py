"""Z-order (Morton-curve) clustered parquet writes — multi-dimension
file skipping from plain footer statistics.

``sinks.write_range_clustered`` makes ONE column prunable: each file
covers a disjoint range of the lead column, but any non-lead predicate
still touches every file.  Z-ordering interleaves the bits of several
columns into one sort key, so files cover small hyper-rectangles of the
combined space and footer min/max stats prune on EVERY clustered
dimension (~n_files^(1/d) of files match a point predicate per dim,
instead of all of them).

This is the same layout trick lakehouse formats (Delta OPTIMIZE ZORDER
BY, Iceberg sort orders) apply; here it is expressed as a pure column
expression + ``repartitionByRange`` — no table format required, and the
code is all JVM-side (shift/and/or bit ops inside whole-stage codegen).

Scale notes: values are bucketed into 2^bits cells either equi-width
(one min/max pass — ``write_zorder_clustered``) or equi-population
(approxQuantile boundaries — ``write_zorder_quantile``, for skewed
columns where width cells would collapse onto the dense region).  The
write costs one range shuffle — identical to any clustered write.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already bucketed,
    non-negative) column round-robin: with d columns, bit i of column j
    lands at position i*d + j.  Pure bit ops — codegen-friendly."""
    d = len(cols)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def bucketize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map values in [lo, hi] to integer cells [0, 2^bits) equi-width.
    ``width_bucket`` is end-exclusive per bucket; clamp the max edge."""
    n = 1 << bits
    b = F.width_bucket(col.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n))
    return F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1)).cast("long")


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered along the
    Morton curve of ``cluster_cols`` (numeric).  One extra tiny job
    computes global per-column min/max for bucketing; the write itself
    is a single range shuffle sorted within partitions."""
    aggs = []
    for c in cluster_cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    bounds = df.agg(*aggs).first()
    cells = [
        bucketize(
            F.col(c),
            bounds[f"lo_{c}"],
            # +1 so the true max lands in the last cell, not past it
            bounds[f"hi_{c}"] + 1,
            bits,
        )
        for c in cluster_cols
    ]
    z = morton_code(cells, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_ranges(path: str, column: str) -> list[tuple[str, int, int]]:
    """Per-file (file, min, max) of ``column`` from parquet footers —
    what a stats-based scan planner sees.  DuckDB reads the metadata;
    nothing touches row data."""
    import duckdb

    return duckdb.connect().execute(
        f"""
        SELECT file_name,
               MIN(stats_min_value::BIGINT) AS lo,
               MAX(stats_max_value::BIGINT) AS hi
        FROM parquet_metadata('{path}/*.parquet')
        WHERE path_in_schema = '{column}'
        GROUP BY file_name ORDER BY lo
        """
    ).fetchall()


def files_matching(
    ranges: list[tuple[str, int, int]], lo: int, hi: int
) -> list[str]:
    """Files whose footer [min,max] intersects predicate [lo, hi] — the
    set a stats-pruning reader must open."""
    return [f for f, fl, fh in ranges if not (fh < lo or fl > hi)]


def quantile_cells(df: DataFrame, column: str, bits: int) -> Column:
    """Skew-resistant cell assignment: cell = rank among 2^bits - 1
    approxQuantile boundaries (driver-side list, error 1e-3 — a
    GK-sketch pass, not a sort).  Equal-POPULATION cells where
    ``bucketize``'s equal-WIDTH cells would put 99% of a skewed column
    into one cell and erase the curve's resolution there.  The rank is
    a fold over the literal boundary array — pure codegen."""
    n = 1 << bits
    bounds = df.approxQuantile(column, [i / n for i in range(1, n)], 0.001)
    return F.aggregate(
        F.lit(bounds),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col(column) >= b, 1).otherwise(0),
    )


def write_zorder_quantile(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """``write_zorder_clustered`` with quantile (equal-population)
    cells — use when clustered columns are skewed."""
    cells = [quantile_cells(df, c, bits) for c in cluster_cols]
    z = morton_code(cells, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
