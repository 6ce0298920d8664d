"""Relational extension operators Spark lacks natively.

The flagship here is the **as-of join** (point-in-time lookup): for each
left row, the most recent right row with ``right_time <= left_time`` per
key.  The naive formulation — range join + max aggregation — explodes
quadratically per key (every purchase pairs with EVERY earlier click
before aggregating).  This implementation uses the union+window trick:

    union(left-tagged, right-tagged)
    -> window last(right_payload, ignorenulls) over
       (partition by key order by time, right-first-at-ties)
    -> keep left rows

One shuffle, state linear in rows, no pair blow-up — the plan a
1000-executor cluster wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: spread each hot key of the large side over
    ``num_salts`` shuffle partitions.

    Large side gets a deterministic salt from its OTHER columns
    (xxhash64 over the full row), so one hot key's rows land in
    num_salts different reducers; the small side is replicated
    num_salts times with every salt value.  Join keys become
    (key, salt) — same result set as the plain join.

    AQE's skew-join split handles most cases at runtime; explicit
    salting remains for aggregation-free pipelines, stateful streaming
    joins (no AQE), and keys hot enough that a single post-split
    partition still overflows.
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in large.columns])) % num_salts).alias(
        "_salt"
    )
    l = large.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(num_salts)]))
    )
    return l.join(s, [on, "_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (inclusive: a right row at exactly left_time
    matches).  Output: all left columns + one ``{col}{suffix}`` column
    per entry in right_values (NULL when no earlier right row exists)."""
    left_cols = left.columns
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {dict(right.dtypes)[c]}" for c in right_values) + ">"
        ).alias("_r"),
    )
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {dict(left.dtypes)[c]}" for c in left_cols) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_values]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal timestamps so the
    # inclusive <= semantics hold
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l.unionByName(r).withColumn(
        "_last_r", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_right") == 0).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
    return out
