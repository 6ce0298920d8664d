"""Port of the reference's routing/validation tests
(lambdas/build-stac/tests/test_handler.py:40-102): CmrEvent vs
RegexEvent dispatch and malformed-event rejection."""

import pytest
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.operators.validate import validate_events

SCHEMA = (
    "collection string, s3_filename string, granule_id string, "
    "datetime_range string"
)


def test_event_type_dispatch(spark):
    df = spark.createDataFrame(
        [
            ("c1", "s3://b/k1.tif", "G123-PROV", None),  # CMR-routed
            ("c1", "s3://b/k2.tif", None, "month"),  # regex-routed
        ],
        SCHEMA,
    )
    out = {r.s3_filename: r for r in validate_events(df).collect()}
    assert out["s3://b/k1.tif"].event_type == "cmr"
    assert out["s3://b/k2.tif"].event_type == "regex"
    assert all(r.validation_error is None for r in out.values())


def test_malformed_events_flagged(spark):
    df = spark.createDataFrame(
        [
            (None, "s3://b/k.tif", None, None),  # missing collection
            ("c1", None, None, None),  # missing s3_filename
            ("c1", "s3://b/k.tif", None, "decade"),  # bad interval literal
        ],
        SCHEMA,
    )
    errs = [r.validation_error for r in validate_events(df).collect()]
    assert errs[0] == "field required: collection"
    assert errs[1] == "field required: s3_filename"
    assert "permitted: 'month', 'year'" in errs[2]


def test_strict_mode_raises_like_pydantic(spark):
    df = spark.createDataFrame([(None, "s3://b/k.tif", None, None)], SCHEMA)
    with pytest.raises(ValueError, match="invalid event"):
        validate_events(df, strict=True)


def test_strict_mode_passes_valid(spark):
    df = spark.createDataFrame([("c1", "s3://b/k.tif", None, "year")], SCHEMA)
    assert validate_events(df, strict=True).count() == 1
