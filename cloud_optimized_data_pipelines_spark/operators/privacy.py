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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymous_flags(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Every input row plus ``group_size`` and ``k_anonymous`` (its
    quasi-identifier combination occurs >= k times).  Survivorship
    form — release policy decides whether to suppress, generalize, or
    route flagged rows elsewhere."""
    counts = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return df.join(counts, quasi_cols).withColumn(
        "k_anonymous", F.col("group_size") >= k
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Drop rows whose quasi-identifier group has fewer than k members
    (left-semi against the >= k key set — no row-count column leaks
    into the released table)."""
    keys = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .select(*quasi_cols)
    )
    return df.join(keys, quasi_cols, "left_semi")
