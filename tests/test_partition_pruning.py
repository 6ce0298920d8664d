"""Dynamic partition pruning: a selective dim filter must prune fact
partitions at runtime — the difference between scanning one partition
and scanning 100 TB when the filter is only known through a join."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_fact(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dpp") / "orders_by_year")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    return out


def test_static_partition_pruning(spark, partitioned_fact):
    df = spark.read.parquet(partitioned_fact).filter(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the literal year never reaches the data scan as a row filter — it
    # prunes directories
    assert "PartitionFilters: [isnotnull(o_year" in plan
    years = [r["o_year"] for r in df.select("o_year").distinct().collect()]
    assert years == [1997]


def test_dynamic_partition_pruning_through_join(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    # the selective predicate lives on the OTHER side of a join, on a
    # DIFFERENT column than the join key (so Catalyst cannot constant-
    # fold it into a static partition filter — it must plan a runtime
    # pruning subquery)
    dim_path = partitioned_fact + "_dim"
    spark.createDataFrame(
        [(y, "pick" if y == 1997 else "skip") for y in range(1990, 2010)],
        "dim_year int, tag string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "pick")
    joined = fact.join(
        F.broadcast(dim), fact.o_year == dim.dim_year
    ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    total = joined.agg(F.sum("n")).first()[0]
    expected = fact.filter(F.col("o_year") == 1997).count()
    assert total == expected
