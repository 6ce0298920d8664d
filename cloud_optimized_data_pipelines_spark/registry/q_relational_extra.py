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


@query("agg_approx_distinct")  # no oracle: native HLL++ sketch is opaque
# (rows-only by design; the estimator math is hash-graded by the
# portable twin agg_approx_distinct_portable below)
def approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the sketch the engine uses
    at 100 TB where exact COUNT(DISTINCT) would shuffle every key."""
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.count("*").alias("n"),
    )


_APPROX_DISTINCT_PORTABLE = """
WITH o AS (
  SELECT o_orderstatus, CAST(o_custkey AS VARCHAR) AS k FROM orders
),
h AS (
  SELECT o_orderstatus,
         ('0x' || substr(md5(k), 1, 3))::BIGINT AS bucket,
         ('0x' || substr(md5(k), 4, 13))::BIGINT AS w
  FROM o
),
regs AS (
  SELECT o_orderstatus, bucket,
         MAX(CASE WHEN w = 0 THEN 53
                  ELSE 53 - length(bin(w)) END) AS register
  FROM h GROUP BY o_orderstatus, bucket
),
agg AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS present,
         list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list(struct_pack(b := bucket, r := register))),
               s -> 1.0 / power(2.0, s.r::DOUBLE))),
           (a, b) -> a + b) AS s_present
  FROM regs GROUP BY o_orderstatus
),
est AS (
  SELECT o_orderstatus, present,
         (4096.0 - present) + s_present AS s,
         CAST(4096 - present AS BIGINT) AS zeros
  FROM agg
),
ex AS (
  SELECT o_orderstatus,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus
)
SELECT e.o_orderstatus,
       round(CASE WHEN 12098218.894406674 / e.s <= 10240.0 AND e.zeros > 0
                  THEN 4096.0 * ln(4096.0 / e.zeros::DOUBLE)
                  ELSE 12098218.894406674 / e.s END, 6) AS distinct_est,
       e.present AS buckets_used,
       e.zeros AS empty_buckets,
       x.n_exact,
       x.n
FROM est e JOIN ex x USING (o_orderstatus)
"""


@query("agg_approx_distinct_portable", _APPROX_DISTINCT_PORTABLE)
def approx_distinct_portable(spark, sf_dir):
    """HASH-GRADED twin of agg_approx_distinct (VERDICT r12 task 5 —
    the one remaining rows-only ledger row): the SAME distinct-
    customers-per-status shape, but through the portable
    own-implementation HLL (operators/sketches.py::
    portable_hll_registers/portable_hll_estimate) whose md5 bucketing,
    52-bit rank, power-of-two fold and linear-counting correction the
    DuckDB oracle replays exactly — so the estimator MATH sits under
    the value hash while the native twin keeps covering Spark's
    opaque HyperLogLog++ surface.  Exact counts join alongside as the
    self-audit.  Same 100 TB shape: fixed 4096-register state per
    group, map-side-combinable MAX."""
    from cloud_optimized_data_pipelines_spark.operators import sketches as SK

    t = load_tables(spark, sf_dir)
    regs = SK.portable_hll_registers(
        t["orders"], "o_custkey", dims=("o_orderstatus",)
    )
    est = SK.portable_hll_estimate(regs, dims=("o_orderstatus",))
    exact = t["orders"].groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact"),
        F.count("*").cast("long").alias("n"),
    )
    return est.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "distinct_est",
        "buckets_used",
        "empty_buckets",
        "n_exact",
        "n",
    )




_SKEW_SALTED = """
WITH dim AS (
  SELECT event_type, MAX(value) AS type_max, COUNT(*) AS type_n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(d.type_max - e.value, 9) AS below_peak,
       d.type_n
FROM events e JOIN dim d USING (event_type)
"""


@query("join_skew_salted", _SKEW_SALTED)
def join_skew_salted_q(spark, sf_dir):
    """Skew-proof salted equi-join (operators/relational.py::
    salted_join): events joined to a 5-row per-type dimension — EVERY
    key is hot (2k rows/key here, 1e10 rows/key at 100 TB), the shape
    where one reducer would otherwise receive an entire key.  The
    large side gets a deterministic xxhash64 salt, the dim side is
    replicated num_salts times, the join runs on (key, salt) — and
    the oracle proves the result set is EXACTLY the plain join's.
    The dim carries only order-independent aggregates (MAX, COUNT) so
    the comparison is float-exact without term rounding games."""
    from cloud_optimized_data_pipelines_spark.operators.relational import (
        salted_join,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(
        F.max("value").alias("type_max"),
        F.count("*").alias("type_n"),
    )
    joined = salted_join(ev, dim, "event_type", num_salts=8)
    return joined.select(
        "event_id",
        "event_type",
        F.round(F.col("type_max") - F.col("value"), 9).alias("below_peak"),
        "type_n",
    )
