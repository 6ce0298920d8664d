"""Bucketed-table layout: the join shuffle must actually disappear."""

import pytest
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.operators.bucketing import (
    co_bucketed_join,
    write_bucketed,
)


def _reset_table(spark, name):
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directory persists — clear stale locations
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    _reset_table(spark, "b_orders")
    _reset_table(spark, "b_lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"]
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_co_bucketed_join_has_no_exchange(spark, bucketed_tables, sf_dir):
    o_tab, l_tab = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path so the test sees the SMJ shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table(o_tab)
            .join(
                spark.table(l_tab),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle below the join on either side
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # and the values are right
        raw = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, raw.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruned_point_lookup(spark, bucketed_tables):
    o_tab, _ = bucketed_tables
    # bucket pruning: an equality predicate on the bucket column scans
    # only the matching bucket's files.  (The planner auto-disables
    # bucketed scans when nothing downstream uses the partitioning —
    # turn that off so the point lookup keeps the bucketed layout.)
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        df = spark.table(o_tab).filter(F.col("o_orderkey") == 42)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert df.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )


def test_window_over_bucketed_table_needs_no_exchange(spark, bucketed_tables):
    # the q21 fix claimed in SCALE.md: a window partitioned by the
    # bucket column consumes the bucketed layout directly
    from pyspark.sql import Window

    _, l_tab = bucketed_tables
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        w = Window.partitionBy("l_orderkey")
        df = (
            spark.table(l_tab)
            .withColumn("n_lines", F.count(F.lit(1)).over(w))
            .filter(F.col("n_lines") > 3)
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert df.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )


def test_merge_upsert_by_key(spark, sf_dir, tmp_path):
    from cloud_optimized_data_pipelines_spark.operators.compact import (
        merge_upsert,
    )

    target = str(tmp_path / "upsert_target")
    spark.read.parquet(f"{sf_dir}/supplier.parquet").write.parquet(target)
    orig = spark.read.parquet(target)
    n0 = orig.count()
    # snapshot before the swap — orig's resolved plan points at files
    # the merge will atomically replace
    untouched_before = set(
        map(tuple, orig.filter(F.col("s_suppkey") != 0).collect())
    )

    updates = spark.createDataFrame(
        [(0, "Supplier#UPDATED", 3, 999.99), (10_000_001, "Supplier#NEW", 1, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    before, after = merge_upsert(spark, target, updates, keys=["s_suppkey"])
    assert (before, after) == (n0, n0 + 1)

    merged = spark.read.parquet(target)
    assert merged.filter(F.col("s_suppkey") == 0).first()["s_name"] == "Supplier#UPDATED"
    assert merged.filter(F.col("s_name") == "Supplier#NEW").count() == 1
    # untouched rows survive byte-identical
    untouched_after = set(
        map(
            tuple,
            merged.filter(~F.col("s_suppkey").isin(0, 10_000_001)).collect(),
        )
    )
    assert untouched_after == untouched_before


def test_delete_where_predicate(spark, sf_dir, tmp_path):
    from cloud_optimized_data_pipelines_spark.operators.compact import (
        delete_where,
    )

    target = str(tmp_path / "delete_target")
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.parquet(target)
    n0 = spark.read.parquet(target).count()
    expect_deleted = (
        spark.read.parquet(target)
        .filter("o_orderstatus = 'F'")
        .count()
    )
    before, deleted = delete_where(spark, target, "o_orderstatus = 'F'")
    assert (before, deleted) == (n0, expect_deleted)
    remaining = spark.read.parquet(target)
    assert remaining.filter("o_orderstatus = 'F'").count() == 0
    assert remaining.count() == n0 - expect_deleted


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    from cloud_optimized_data_pipelines_spark.operators.compact import (
        delete_where,
    )

    target = str(tmp_path / "null_del_target")
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "id long, score double"
    ).write.parquet(target)
    before, deleted = delete_where(spark, target, "score > 50")
    # only id=3 is deleted; id=2 (NULL predicate) must survive
    assert (before, deleted) == (3, 1)
    assert sorted(
        r["id"] for r in spark.read.parquet(target).collect()
    ) == [1, 2]
