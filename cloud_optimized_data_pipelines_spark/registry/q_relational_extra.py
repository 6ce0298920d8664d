"""additional relational coverage: cube, subqueries, pivot, range join, scalar functions

Split out of the single-file registry in round 11 (VERDICT r10 task
9); registration order is preserved by the import order in
``cloud_optimized_data_pipelines_spark.queries`` and pinned by
``tests/test_registry_order.py``.  Code is unchanged — only moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.functions.ids import item_id  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import text as T  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import vectors as V  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import dedup as D  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import similarity as S  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.operators.transfer import plan_transfer  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.sources import cmr as cmr_src  # noqa: F401
from cloud_optimized_data_pipelines_spark.sources import inventory as inv_src  # noqa: F401,E501

from cloud_optimized_data_pipelines_spark.queries import (  # noqa: F401
    load_tables,
    query,
)

# ---------------------------------------------------------------------------
# Additional relational coverage: cube, subqueries (correlated EXISTS +
# scalar), conditional pivot, range join, string/date scalar functions,
# HAVING, union-distinct — rounding out SURVEY sections 2.5-2.7.
# ---------------------------------------------------------------------------

_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("agg_cube_orders", _CUBE)
def cube_orders(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_CUBE)


_EXISTS = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@query("subquery_exists_big_orders", _EXISTS)
def exists_subquery(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_EXISTS)


_SCALAR_SUB = """
SELECT p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS p_retailprice
FROM part
WHERE p_retailprice > (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part
)
"""


@query("subquery_scalar_above_avg", _SCALAR_SUB)
def scalar_subquery(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_SCALAR_SUB)


_PIVOT = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_conditional_pivot", _PIVOT)
def conditional_pivot(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_PIVOT)


_RANGE_JOIN = """
SELECT o_orderkey,
       COUNT(*) AS n_shipped_within_30d
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderkey
"""


@query("join_range_ship_window", _RANGE_JOIN)
def range_join(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_RANGE_JOIN)


_STRINGS = """
SELECT p_partkey,
       upper(p_name) AS upper_name,
       substring(p_name, 1, 5) AS prefix5,
       replace(p_type, ' ', '_') AS type_snake,
       CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS brand_dist,
       CAST(position('#' IN p_brand) AS BIGINT) AS hash_pos,
       lpad(CAST(p_size AS STRING), 4, '0') AS size_padded
FROM part
"""


@query("scalar_string_functions", _STRINGS)
def string_functions(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_STRINGS)


_DATES_FN = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95
FROM orders
"""

_DATES_FN_SPARK = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NTZ) AS month_start,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01 00:00:00') AS BIGINT) AS days_since_95
FROM orders
"""


@query("scalar_date_functions", _DATES_FN)
def date_functions(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_DATES_FN_SPARK)


_HAVING = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
"""


@query("agg_having_frequent_customers", _HAVING)
def having_clause(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_HAVING)


_UNION_DISTINCT = """
SELECT DISTINCT key FROM (
  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
  UNION
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
) t
"""


@query("set_union_distinct", _UNION_DISTINCT)
def union_distinct(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_UNION_DISTINCT)


@query("agg_approx_distinct")  # no oracle: approximate by design (rows-only)
def approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the sketch the engine uses
    at 100 TB where exact COUNT(DISTINCT) would shuffle every key."""
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.count("*").alias("n"),
    )


