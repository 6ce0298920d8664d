"""Filename date extraction — the reference's signature scalar function.

Replicates ``lambdas/build-stac/utils/regex.py:30-83`` (SURVEY C1-C3)
as a single pure column expression:

* Four regex strategies tried in priority order; the FIRST strategy with
  any match wins and ALL of its matches are parsed (the reference's
  ``break`` at regex.py:55) — expressed as ``coalesce`` over per-strategy
  match arrays (SURVEY W2).
* >1 dates  -> (min, max, NULL)            (regex.py:67-70: sort, first/last)
* 1 date + datetime_range='month' -> (first-of-month, last-of-month)
  (regex.py:18-21 — ``relativedelta(day=31)`` clamps exactly like
  ``last_day``)
* 1 date + datetime_range='year'  -> (Jan 1, Dec 31)   (regex.py:12-15)
* 1 date, no range -> (NULL, NULL, date)
* 0 dates -> reference raises (regex.py:60-64); we surface an ``error``
  field so the plan stays total — callers opt into strictness.

All parsing is UTC (regex.py:52-53); sessions created by
``session.get_spark`` pin ``spark.sql.session.timeZone=UTC``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (regex, Spark datetime pattern) — priority order is load-bearing:
# _(\d{8}) must be tried before _(\d{6}) / _(\d{4}) so e.g. "_20050302"
# parses as 2005-03-02, not 2005-03 or 2005. Mirrors regex.py:37-42.
DATE_REGEX_STRATEGIES: list[tuple[str, str]] = [
    (r"_(\d{4}-\d{2}-\d{2})", "yyyy-MM-dd"),
    (r"_(\d{8})", "yyyyMMdd"),
    (r"_(\d{6})", "yyyyMM"),
    (r"_(\d{4})", "yyyy"),
]


def _strategy_dates(filename: Column, pattern: str, fmt: str) -> Column:
    """Array of UTC timestamps for one strategy, NULL when no match."""
    matches = F.regexp_extract_all(filename, F.lit(pattern), F.lit(1))
    return F.when(
        F.size(matches) > 0,
        F.transform(matches, lambda s: F.to_timestamp(s, fmt)),
    )


def month_range(ts: Column) -> tuple[Column, Column]:
    """(first-of-month, last-of-month) — regex.py:18-21 (C2)."""
    return (
        F.date_trunc("month", ts),
        F.to_timestamp(F.last_day(ts)),
    )


def year_range(ts: Column) -> tuple[Column, Column]:
    """(Jan 1, Dec 31) of ts's year — regex.py:12-15 (C3)."""
    return (
        F.date_trunc("year", ts),
        F.to_timestamp(F.concat(F.year(ts).cast("string"), F.lit("-12-31"))),
    )


def extract_dates(filename: Column | str, datetime_range: Column | str | None = None) -> Column:
    """STRUCT<start_datetime, end_datetime, single_datetime TIMESTAMP, error STRING>.

    ``datetime_range`` may be a literal ('month'/'year'/None) or a per-row
    column — the reference carries it per event (events.py:44).
    """
    if isinstance(filename, str):
        filename = F.col(filename)
    if datetime_range is None or isinstance(datetime_range, str):
        rng = F.lit(datetime_range)
    else:
        rng = datetime_range

    dates = F.coalesce(
        *[_strategy_dates(filename, p, f) for p, f in DATE_REGEX_STRATEGIES]
    )

    def build(sorted_dates: Column) -> Column:
        n = F.coalesce(F.size(sorted_dates), F.lit(0))
        single = F.element_at(sorted_dates, 1)
        m_start, m_end = month_range(single)
        y_start, y_end = year_range(single)

        # all outputs normalized to TIMESTAMP_NTZ: session-timezone-proof
        # (values were parsed as naive UTC wall clocks — regex.py:52-53)
        null_ts = F.lit(None).cast("timestamp_ntz")
        start = (
            F.when(n > 1, F.element_at(sorted_dates, 1))
            .when((n == 1) & (rng == "month"), m_start)
            .when((n == 1) & (rng == "year"), y_start)
            .otherwise(null_ts)
        ).cast("timestamp_ntz")
        end = (
            F.when(n > 1, F.element_at(sorted_dates, -1))
            .when((n == 1) & (rng == "month"), m_end)
            .when((n == 1) & (rng == "year"), y_end)
            .otherwise(null_ts)
        ).cast("timestamp_ntz")
        single_out = F.when(
            (n == 1) & (rng.isNull() | ~rng.isin("month", "year")), single
        ).cast("timestamp_ntz")
        error = F.when(
            n == 0,
            F.concat(
                F.lit("No dates provided in filename='"),
                filename,
                F.lit("'. At least one date in format yyyy-mm-dd is required."),
            ),
        )
        return F.struct(
            start.alias("start_datetime"),
            end.alias("end_datetime"),
            single_out.alias("single_datetime"),
            error.alias("error"),
        )

    # let-binding via a single-element transform: the 4-strategy regex
    # coalesce is evaluated ONCE per row and bound to the lambda var —
    # referencing `dates` directly from each struct field re-inlines the
    # whole regex subtree 4+ times (codegen CSE does not cover these
    # higher-order expressions; measured 8x slower at 15M rows).
    return F.element_at(
        F.transform(F.array(F.array_sort(dates)), build), 1
    )
