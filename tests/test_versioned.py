"""Snapshot-versioned tables: atomic publish, time travel, pinned
readers surviving concurrent commits, vacuum retention."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.versioned import (
    commit_version,
    latest_version,
    read_version,
    vacuum,
)


def _table(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_commit_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert latest_version(path) is None
    assert commit_version(_table(spark, 10, "a"), path) == 0
    assert commit_version(_table(spark, 20, "b"), path) == 1
    assert latest_version(path) == 1
    assert read_version(spark, path).count() == 20
    old = read_version(spark, path, version=0)
    assert old.count() == 10 and old.first()["tag"] == "a"


def test_pinned_reader_survives_concurrent_commit(spark, tmp_path):
    """A frame planned against the latest snapshot must keep returning
    that snapshot's rows after a new commit — immutable version dirs
    mean no file is changed or deleted under the scan."""
    path = str(tmp_path / "tbl")
    commit_version(_table(spark, 10, "a"), path)
    pinned = read_version(spark, path)  # plans against v=0's directory
    commit_version(_table(spark, 99, "b"), path)
    assert pinned.count() == 10  # unchanged by the concurrent commit
    assert read_version(spark, path).count() == 99


def test_unpublished_crash_is_invisible(spark, tmp_path):
    """A snapshot directory without a pointer update (crashed commit)
    must never surface to readers."""
    import os

    path = str(tmp_path / "tbl")
    commit_version(_table(spark, 10, "a"), path)
    # simulate a writer that died after writing data, before publish
    _table(spark, 5, "crash").write.parquet(os.path.join(path, "v=1"))
    assert latest_version(path) == 0
    assert read_version(spark, path).first()["tag"] == "a"
    # the next successful commit recovers by overwriting the orphan
    v = commit_version(_table(spark, 7, "c"), path)
    assert v == 1 and read_version(spark, path).count() == 7


def test_vacuum_retains_recent_and_published(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(5):
        commit_version(_table(spark, i + 1, f"t{i}"), path)
    removed = vacuum(path, keep_last=2)
    assert removed == [0, 1, 2]
    assert read_version(spark, path, version=3).count() == 4
    assert read_version(spark, path).count() == 5
    with pytest.raises(FileNotFoundError):
        read_version(spark, path, version=0)
