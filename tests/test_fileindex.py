"""File-level min/max index: pruned reads match full scans, touch fewer
files, and fall back when stale."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.fileindex import (
    build_file_index,
    pruned_read,
)
from cloud_optimized_data_pipelines_spark.sinks import write_range_clustered


@pytest.fixture(scope="module")
def clustered_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fidx") / "table")
    df = spark.range(50_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("mod"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    write_range_clustered(df, path, ("k",), num_files=10)
    return path


def _n_files(df) -> int:
    return df.select(F.input_file_name()).distinct().count()


def test_pruned_read_matches_full_scan(spark, clustered_table):
    idx = build_file_index(spark, clustered_table, ["k"])
    got = pruned_read(spark, clustered_table, idx, "k", 10_000, 12_000)
    want = (
        spark.read.parquet(clustered_table)
        .filter((F.col("k") >= 10_000) & (F.col("k") <= 12_000))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pruned_read_touches_fewer_files(spark, clustered_table):
    idx = build_file_index(spark, clustered_table, ["k"])
    got = pruned_read(spark, clustered_table, idx, "k", 10_000, 12_000)
    # 2k-wide slice of a 50k range over 10 disjoint files → ≤2 files
    assert _n_files(got) <= 2
    assert _n_files(spark.read.parquet(clustered_table)) == 10


def test_persisted_index_roundtrip(spark, clustered_table, tmp_path):
    ipath = str(tmp_path / "idx")
    build_file_index(spark, clustered_table, ["k", "mod"], index_path=ipath)
    idx = spark.read.parquet(ipath)
    assert idx.count() == 10
    row = idx.agg(F.sum("n_rows"), F.sum("nulls_k")).first()
    assert row[0] == 50_000 and row[1] == 0
    got = pruned_read(spark, clustered_table, idx, "k", 0, 4_999)
    assert got.count() == 5_000


def test_stale_index_falls_back_to_full_scan(spark, clustered_table, tmp_path):
    """Files appended after the index build must still be visible —
    correctness beats skipping."""
    import shutil

    table2 = str(tmp_path / "grown")
    shutil.copytree(clustered_table, table2)
    idx = build_file_index(spark, table2, ["k"])
    extra = spark.range(1).select(
        F.lit(11_111_111).cast("long").alias("k"),
        F.lit(0).cast("long").alias("mod"),
        F.lit("late").alias("payload"),
    )
    extra.write.mode("append").parquet(table2)
    spark.catalog.refreshByPath(table2)
    got = pruned_read(spark, table2, idx, "k", 11_111_111, 11_111_111)
    assert got.count() == 1  # stale index did not hide the new row


def test_empty_candidate_set_returns_empty_with_schema(spark, clustered_table):
    idx = build_file_index(spark, clustered_table, ["k"])
    got = pruned_read(spark, clustered_table, idx, "k", 10_000_000, 20_000_000)
    assert got.count() == 0
    assert set(got.columns) == {"k", "mod", "payload"}
