"""AQE runtime bloom-filter injection — the shuffle-join analog of
dynamic partition pruning.

At 100 TB the expensive shape is fact ⋈ selectively-filtered dim where
the dim is too big to broadcast: both sides shuffle in full.  Spark's
InjectRuntimeFilter rewrites the fact side to
``might_contain(bloom_filter_agg(dim.k), fact.k)`` so fact rows that
cannot join are dropped BEFORE the shuffle.  The production thresholds
(creation side < 10 MB, application side scan > 10 GB) are exactly
right for the big cluster and exactly wrong for test fixtures, so the
test dials them to fixture scale — asserting the mechanism, not the
thresholds.
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            # conf.get renders byte confs as "<n>b", which set() rejects
            spark.conf.set(k, v[:-1] if v.endswith("b") and v[:-1].isdigit() else v)


@pytest.fixture(scope="module")
def fact_dim(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bloomtables")
    fact = spark.range(200_000).select(
        (F.col("id") % 5_000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("attr"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    fact.write.parquet(str(base / "fact"))
    dim.write.parquet(str(base / "dim"))
    return str(base / "fact"), str(base / "dim")


def test_bloom_filter_injected_on_fact_side(spark, fact_dim, bloom_confs):
    fact_path, dim_path = fact_dim
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("attr") == 7)
    joined = fact.join(dim, "k").groupBy("attr").agg(F.sum("v").alias("total"))
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in optimized and "might_contain" in optimized
    # and it actually runs: 50 dim keys × 40 fact rows each
    rows = joined.collect()
    assert rows[0]["attr"] == 7 and rows[0]["total"] is not None


def test_bloom_filter_result_unchanged(spark, fact_dim, bloom_confs):
    """The rewrite is a pure optimization — same rows either way."""
    fact_path, dim_path = fact_dim
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("attr") == 7)
    with_bloom = sorted(map(tuple, fact.join(dim, "k").select("k", "v").collect()))
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        without = sorted(map(tuple, fact.join(dim, "k").select("k", "v").collect()))
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == without and len(with_bloom) == 50 * 40


def test_no_bloom_filter_when_dim_unfiltered(spark, fact_dim, bloom_confs):
    """No selective filter on the creation side → nothing to transfer;
    Spark must not pay the sketch-build for a full-key join."""
    fact_path, dim_path = fact_dim
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    optimized = (
        fact.join(dim, "k")._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "might_contain" not in optimized
