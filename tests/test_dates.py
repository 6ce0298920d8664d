"""Golden-table tests for extract_dates — port of the reference's
date-extraction corpus (lambdas/build-stac/tests/test_regex.py:8-136,
13 parametrized cases) plus engine edge cases."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates


def dt(*args):
    return datetime(*args)


GOLDEN = [
    # (filename, datetime_range) -> (start, end, single)
    (("s3://foo/bar/foo_2010-10-31_bar.tif", None), (None, None, dt(2010, 10, 31))),
    (("s3://foo/bar/foo_20051212_bar.tif", None), (None, None, dt(2005, 12, 12))),
    (("s3://foo/bar/foo_200507_bar.tif", None), (None, None, dt(2005, 7, 1))),
    (("s3://foo/bar/foo_2012_bar.tif", None), (None, None, dt(2012, 1, 1))),
    (
        ("s3://foo/bar/foo_2005-07-02_to_2006-09-29_bar.tif", None),
        (dt(2005, 7, 2), dt(2006, 9, 29), None),
    ),
    (
        ("s3://foo/bar/foo_20050702_to_20060929_bar.tif", None),
        (dt(2005, 7, 2), dt(2006, 9, 29), None),
    ),
    (
        ("s3://foo/bar/foo_2005_2006_2007_bar.tif", None),
        (dt(2005, 1, 1), dt(2007, 1, 1), None),
    ),
    (
        ("s3://foo/bar/foo_2005-01-02.tif", "month"),
        (dt(2005, 1, 1), dt(2005, 1, 31), None),
    ),
    (
        ("s3://foo/bar/foo_2005-02-02.tif", "month"),
        (dt(2005, 2, 1), dt(2005, 2, 28), None),
    ),
    (
        ("s3://foo/bar/foo_20050302_bar.tif", "month"),
        (dt(2005, 3, 1), dt(2005, 3, 31), None),
    ),
    (
        ("s3://foo/bar/foo_20050402_bar.tif", "month"),
        (dt(2005, 4, 1), dt(2005, 4, 30), None),
    ),
    (
        ("s3://foo/bar/foo_2005-01-02.tif", "year"),
        (dt(2005, 1, 1), dt(2005, 12, 31), None),
    ),
    (
        ("s3://foo/bar/foo_2005-02-02.tif", "year"),
        (dt(2005, 1, 1), dt(2005, 12, 31), None),
    ),
    (
        ("s3://foo/bar/foo_20050302_bar.tif", "year"),
        (dt(2005, 1, 1), dt(2005, 12, 31), None),
    ),
    (
        ("s3://foo/bar/foo_20050402_bar.tif", "year"),
        (dt(2005, 1, 1), dt(2005, 12, 31), None),
    ),
]


def test_date_extraction_golden(spark):
    rows = [(f, r) for (f, r), _ in GOLDEN]
    df = spark.createDataFrame(rows, "filename string, datetime_range string")
    out = (
        df.withColumn("d", extract_dates("filename", F.col("datetime_range")))
        .select("filename", "datetime_range", "d.*")
        .collect()
    )
    by_key = {(r.filename, r.datetime_range): r for r in out}
    for (fname, rng), (start, end, single) in GOLDEN:
        r = by_key[(fname, rng)]
        assert r.start_datetime == start, (fname, rng, "start", r.start_datetime)
        assert r.end_datetime == end, (fname, rng, "end", r.end_datetime)
        assert r.single_datetime == single, (fname, rng, "single", r.single_datetime)
        assert r.error is None


def test_no_date_yields_error(spark):
    df = spark.createDataFrame([("s3://foo/nodates.tif",)], "filename string")
    r = df.select(extract_dates("filename").alias("d")).select("d.*").collect()[0]
    assert r.start_datetime is None and r.end_datetime is None
    assert r.single_datetime is None
    assert r.error and "No dates provided" in r.error


def test_strategy_priority_eight_digits_beats_six(spark):
    # _20050302 must parse as %Y%m%d (2005-03-02), never %Y%m of "200503"
    df = spark.createDataFrame([("x_20050302_y",)], "filename string")
    r = df.select(extract_dates("filename").alias("d")).select("d.*").collect()[0]
    assert r.single_datetime == dt(2005, 3, 2)


@pytest.mark.parametrize(
    "fname,expected",
    [
        ("a_2004-02-15.tif", dt(2004, 2, 29)),  # leap-year February clamp
        ("a_2005-06-10.tif", dt(2005, 6, 30)),  # 30-day month clamp
    ],
)
def test_month_end_clamping(spark, fname, expected):
    df = spark.createDataFrame([(fname,)], "filename string")
    r = (
        df.select(extract_dates("filename", "month").alias("d"))
        .select("d.*")
        .collect()[0]
    )
    assert r.end_datetime == expected
