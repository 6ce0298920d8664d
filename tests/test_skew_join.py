"""AQE skew-join mitigation — the runtime complement to the explicit
``operators/relational.salted_join``.

At 100 TB a single hot key turns one shuffle partition into a straggler
that outlives the rest of the stage by hours.  Two defenses ship in
this engine: salting (deterministic rewrite, works everywhere) and
AQE's OptimizeSkewedJoin (splits oversized partitions at runtime using
map-output sizes).  This test pins the latter: with thresholds dialed
to fixture scale, the executed plan must show the skewed side split
(``skew=true`` on the sort-merge join) and results must be identical
to the non-split plan.
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        # keep AQE from first coalescing tiny fixture partitions away
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # a downstream groupBy(k) reuses the join's hash partitioning,
        # which splitting would break — force tells AQE the extra
        # post-agg shuffle is worth un-straggling the join
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v[:-1] if v.endswith("b") and v[:-1].isdigit() else v)


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # key 0 carries 200k rows (with wide payload); keys 1..99 carry ~1k
    hot = spark.range(200_000).select(
        F.lit(0).cast("long").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    cold = spark.range(100_000).select(
        (F.col("id") % 99 + 1).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    left = hot.unionByName(cold)
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return left, right


def test_aqe_splits_skewed_partition(spark, skewed_pair, skew_confs):
    # NB: the hot key's payload must stay in the join output and be
    # incompressible (md5 strings) — skew detection reads COMPRESSED
    # map-output sizes, and 200k identical longs lz4 down to nothing
    left, right = skewed_pair
    joined = left.join(right, "k").select("k", "payload", "w")
    rows = joined.collect()  # run the exact frame → final AQE plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert len(rows) == 300_000
    assert sum(1 for r in rows if r["k"] == 0) == 200_000


def test_skew_split_preserves_results(spark, skewed_pair, skew_confs):
    left, right = skewed_pair
    with_split = (
        left.join(right, "k").agg(F.count("*"), F.sum("w")).first()
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        without = left.join(right, "k").agg(F.count("*"), F.sum("w")).first()
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert tuple(with_split) == tuple(without)
