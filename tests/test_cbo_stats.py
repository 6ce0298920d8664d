"""Cost-based optimization: ANALYZE-collected statistics drive
cardinality estimates, and estimates drive physical strategy.

At 100 TB the difference between "broadcast the filtered dim" and
"shuffle both sides" is the whole job.  Without column statistics the
optimizer cannot see that `dattr = 7` keeps 100 of 300k rows (a Filter
passes its child's size through); with ANALYZE ... FOR ALL COLUMNS +
`spark.sql.cbo.enabled` the equi-height histogram prices the filter and
the join side becomes statically broadcastable — no AQE runtime rescue
needed (AQE only helps AFTER a shuffle has been planned and mapped).
"""

import pyspark.sql.functions as F
import pytest

N_ROWS = 300_000
N_DISTINCT = 3_000  # dattr = id % 3000 → ~100 rows per value


@pytest.fixture(scope="module")
def analyzed_tables(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("cbo"))
    spark.range(N_ROWS).select(
        F.col("id").alias("dim_id"),
        (F.col("id") % N_DISTINCT).alias("dattr"),
        F.concat(*[F.md5((F.col("id") + i).cast("string")) for i in range(2)]).alias(
            "pad"
        ),
    ).write.parquet(base + "/dim")
    spark.range(1_000_000).select(
        (F.col("id") % N_ROWS).alias("dim_id"), F.col("id").alias("v")
    ).write.parquet(base + "/fact")
    for t in ("dim", "fact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}_cbo")
        spark.sql(f"CREATE TABLE {t}_cbo USING parquet LOCATION '{base}/{t}'")
        spark.sql(f"ANALYZE TABLE {t}_cbo COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    for t in ("dim", "fact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}_cbo")


@pytest.fixture()
def cbo(spark):
    old = spark.conf.get("spark.sql.cbo.enabled", None)
    yield
    if old is None:
        spark.conf.unset("spark.sql.cbo.enabled")
    else:
        spark.conf.set("spark.sql.cbo.enabled", old)


def _filter_stats(spark):
    # fresh frame each call: QueryExecution memoizes optimized plans,
    # so a conf flip must not reuse a cached one
    flt = spark.table("dim_cbo").filter(F.col("dattr") == 7)
    return flt._jdf.queryExecution().optimizedPlan().stats()


def test_analyze_gives_exact_relation_rowcount(spark, analyzed_tables, cbo):
    # rowCount only surfaces through the stats visitor when CBO is on
    spark.conf.set("spark.sql.cbo.enabled", "true")
    stats = spark.table("dim_cbo")._jdf.queryExecution().optimizedPlan().stats()
    assert int(stats.rowCount().get()) == N_ROWS


def test_cbo_prices_the_filter(spark, analyzed_tables, cbo):
    spark.conf.set("spark.sql.cbo.enabled", "false")
    without = _filter_stats(spark).toString()
    assert "rowCount" not in without  # size passthrough, no cardinality

    spark.conf.set("spark.sql.cbo.enabled", "true")
    got = _filter_stats(spark)
    row_count = int(got.rowCount().get())
    # truth is ~100; the equi-height histogram lands within a few ×
    assert 20 <= row_count <= 500, row_count


def test_estimate_flips_join_strategy_statically(spark, analyzed_tables, cbo):
    """Same query, same data: stats decide shuffle vs broadcast in the
    STATIC plan.  (pad rides along so plain column-width scaling can't
    shrink the no-stats estimate below the threshold.)"""
    import re

    q = (
        "SELECT f.v, d.pad FROM fact_cbo f "
        "JOIN dim_cbo d ON f.dim_id = d.dim_id WHERE d.dattr = 7"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        plan_off = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
        spark.conf.set("spark.sql.cbo.enabled", "true")
        plan_on = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    first = lambda p: re.findall(r"SortMergeJoin|BroadcastHashJoin", p)[0]  # noqa: E731
    assert first(plan_off) == "SortMergeJoin"
    assert first(plan_on) == "BroadcastHashJoin"
