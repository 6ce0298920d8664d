"""Event validation — the pydantic gate as a column-expression step.

The reference parses every record into ``CmrEvent``/``RegexEvent``
(pydantic, frozen) and raises ``ValidationError`` on malformed input
(``lambdas/build-stac/handler.py:40-41``; tested
``tests/test_handler.py:93-102``).  Dispatch between the two models is
granule_id presence (SURVEY F10).

Spark-first shape: a total function — instead of raising per record,
emit a ``validation_error`` column (NULL = valid) so one bad record
cannot kill a 100 TB batch; strict mode routes error rows to the
quarantine table (streaming) or raises after an aggregation (batch),
preserving the reference's observable all-or-nothing behavior when
wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BaseEvent required fields (events.py:14-16); datetime_range domain
# (events.py:10: Literal['month','year'])
REQUIRED_FIELDS = ["collection", "s3_filename"]
VALID_DATETIME_RANGES = ["month", "year"]


def event_type() -> Column:
    """F10 dispatch: 'cmr' when granule_id present else 'regex'
    (build-stac/handler.py:40-41)."""
    return F.when(F.col("granule_id").isNotNull(), F.lit("cmr")).otherwise(
        F.lit("regex")
    )


def validation_error() -> Column:
    """First failed rule as a message, NULL when the event is valid."""
    checks: list[tuple[Column, str]] = []
    for field in REQUIRED_FIELDS:
        checks.append(
            (
                F.col(field).isNull() | (F.col(field) == ""),
                f"field required: {field}",
            )
        )
    checks.append(
        (
            F.col("datetime_range").isNotNull()
            & ~F.col("datetime_range").isin(*VALID_DATETIME_RANGES),
            "unexpected value; permitted: 'month', 'year' (datetime_range)",
        )
    )
    out = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        out = F.when(cond, F.lit(msg)).otherwise(out)
    return out


def validate_events(events: DataFrame, strict: bool = False) -> DataFrame:
    """Attach ``event_type`` + ``validation_error`` columns.

    strict=True replicates the reference's raise-on-malformed: any
    invalid row fails the job (checked with a cheap count on the
    filtered side, not a collect)."""
    out = events.withColumn("event_type", event_type()).withColumn(
        "validation_error", validation_error()
    )
    if strict:
        bad = out.filter(F.col("validation_error").isNotNull())
        n = bad.count()
        if n:
            sample = [r.validation_error for r in bad.limit(3).collect()]
            raise ValueError(f"{n} invalid event(s), e.g. {sample}")
    return out
