"""Privacy-preserving release operators (extension, SURVEY section 7.7).

Complements the text-level PII scrub (``functions/text.py`` /
``text_pii_redact``) with TABLE-level protections a training-data
release pipeline needs before publishing aggregates or samples:

- **k-anonymity suppression**: rows whose quasi-identifier combination
  occurs fewer than k times are suppressed (the classic Sweeney 2002
  rule) — one partial-aggregated count + a semi/anti split, no window;
- **small-group aggregate suppression**: aggregate rows backed by
  fewer than k contributors are dropped before release.

Both are pure relational plans (count + join) — at 100 TB the
quasi-identifier count is a map-side-combined groupBy and the join is a
semi join on the same key, reusing the shuffle partitioning.

NULL quasi-identifier values are a GROUP, not a gap: ``groupBy`` already
buckets NULLs together, and the flag/suppress joins use null-safe
equality (``<=>``) so those rows are counted and flagged like any other
group — the survivorship contract ("every input row comes back") holds
even on dirty identifiers, which is exactly when a release audit
matters.  Null-safe equality remains a hashable equi-join key in Spark,
so the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _null_safe_cond(
    df: DataFrame, other: DataFrame, quasi_cols: list[str]
) -> Column:
    cond: Column | None = None
    for c in quasi_cols:
        e = df[c].eqNullSafe(other[f"_q_{c}"])
        cond = e if cond is None else cond & e
    return cond


def k_anonymous_flags(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Every input row plus ``group_size`` and ``k_anonymous`` (its
    quasi-identifier combination occurs >= k times).  Survivorship
    form — release policy decides whether to suppress, generalize, or
    route flagged rows elsewhere.  NULL quasi values form their own
    group (null-safe join; see module docstring)."""
    counts = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    renamed = counts.select(
        *[F.col(c).alias(f"_q_{c}") for c in quasi_cols], "group_size"
    )
    return (
        df.join(renamed, _null_safe_cond(df, renamed, quasi_cols))
        .drop(*[f"_q_{c}" for c in quasi_cols])
        .withColumn("k_anonymous", F.col("group_size") >= k)
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Drop rows whose quasi-identifier group has fewer than k members
    (left-semi against the >= k key set — no row-count column leaks
    into the released table).  Null-safe keys: a NULL-valued group of
    size >= k survives like any other."""
    keys = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .select(*[F.col(c).alias(f"_q_{c}") for c in quasi_cols])
    )
    return df.join(keys, _null_safe_cond(df, keys, quasi_cols), "left_semi")
