"""Golden tests for item_id (test_regex.py:139-168), path stem semantics,
and URL scalars."""

from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.ids import (
    item_id,
    item_id_per_row,
    path_basename,
    path_stem,
)
from cloud_optimized_data_pipelines_spark.functions.urls import (
    s3_url,
    target_key,
    url_bucket,
    url_key,
)

ID_REGEX = r"s3://([^/]*)/(.+).tif$"
ID_GOLDEN = [
    (
        "s3://OMNO2d_HRM/OMI_trno20.10x0.10_201601_Col3_V4.nc.tif",
        "OMNO2d_HRM-OMI_trno20.10x0.10_201601_Col3_V4.nc",
    ),
    (
        "s3://OMNO2d_HRMDifference/OMI_trno20.10x0.10_201601_Col3_V4.nc.tif",
        "OMNO2d_HRMDifference-OMI_trno20.10x0.10_201601_Col3_V4.nc",
    ),
]


def test_item_id_regex_golden(spark):
    df = spark.createDataFrame([(f,) for f, _ in ID_GOLDEN], "s3_filename string")
    got = [r.id for r in df.select(item_id("s3_filename", ID_REGEX).alias("id")).collect()]
    assert got == [e for _, e in ID_GOLDEN]


def test_item_id_per_row_matches_literal(spark):
    rows = [(f, ID_REGEX) for f, _ in ID_GOLDEN] + [
        ("s3://bucket/dir/file_2010.nc.tif", None)
    ]
    df = spark.createDataFrame(rows, "s3_filename string, id_regex string")
    got = [
        r.id
        for r in df.select(
            item_id_per_row("s3_filename", "id_regex").alias("id")
        ).collect()
    ]
    assert got == [e for _, e in ID_GOLDEN] + ["file_2010.nc"]


def test_path_stem_semantics(spark):
    cases = [
        ("s3://b/dir/foo.nc.tif", "foo.nc"),  # only last suffix stripped
        ("s3://b/dir/foo", "foo"),
        ("s3://b/dir/.bashrc", ".bashrc"),  # Path('.bashrc').stem == '.bashrc'
        ("plain.txt", "plain"),
    ]
    df = spark.createDataFrame(cases, "p string, expected string")
    for r in df.select(path_stem("p").alias("s"), "expected").collect():
        assert r.s == r.expected


def test_url_scalars(spark):
    df = spark.createDataFrame(
        [("s3://my-bucket/some/deep/key_2010.tif", "coll")], "u string, coll string"
    )
    r = df.select(
        url_bucket("u").alias("b"),
        url_key("u").alias("k"),
        path_basename("u").alias("f"),
        target_key("coll", "u").alias("t"),
        s3_url(F.lit("dst"), target_key("coll", "u")).alias("rewritten"),
    ).collect()[0]
    assert r.b == "my-bucket"
    assert r.k == "some/deep/key_2010.tif"
    assert r.f == "key_2010.tif"
    assert r.t == "coll/key_2010.tif"
    assert r.rewritten == "s3://dst/coll/key_2010.tif"
