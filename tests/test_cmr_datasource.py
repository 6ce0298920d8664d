"""CMR Python Data Source: pagination partitions + predicate pushdown
(the reference pushes short_name/version/temporal into the CMR REST
call — lambdas/cmr-query/handler.py:21-27; here those predicates are
absorbed by pushFilters and the catalog is paged into input
partitions)."""

import json

from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.sources.cmr_datasource import register


def _write_fixture(path, n=250):
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(
                json.dumps(
                    {
                        "granule_id": f"G{i:04d}",
                        "collection": "OMDOAO3e" if i % 2 else "MOD13A1",
                        "version": "003",
                        "time_start": f"20{10 + i % 10}-0{1 + i % 9}-15T00:00:00Z",
                        "bbox": [-180, -90, 180, 90],
                        "href": f"https://x/g{i}.nc",
                    }
                )
                + "\n"
            )


def test_cmr_source_pushdown_and_pagination(spark, tmp_path):
    register(spark)
    fixture = str(tmp_path / "catalog.jsonl")
    _write_fixture(fixture)

    base = (
        spark.read.format("cmr")
        .option("fixture_path", fixture)
        .option("page_size", "50")
        .load()
    )
    assert base.count() == 250
    assert base.rdd.getNumPartitions() == 5  # 250 / 50 pages

    filtered = base.filter(
        (F.col("collection") == "OMDOAO3e")
        & (F.col("time_start") >= F.lit("2015-01-01").cast("timestamp_ntz"))
        & (F.col("href").endswith(".nc"))
    )
    rows = filtered.collect()
    assert len(rows) == 75
    assert all(r.collection == "OMDOAO3e" for r in rows)
    assert all(r.time_start.year >= 2015 for r in rows)

    # pushed predicates shrink the paged catalog -> fewer partitions
    assert filtered.rdd.getNumPartitions() == 2  # 75 rows / 50 per page

    # plan check: collection/time_start absorbed by the source; only the
    # non-pushable suffix predicate (+null guards) is re-applied by Spark
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "EndsWith" in plan
    assert "= OMDOAO3e" not in plan


def test_cmr_source_options_without_filters(spark, tmp_path):
    register(spark)
    fixture = str(tmp_path / "catalog.jsonl")
    _write_fixture(fixture, n=20)
    df = (
        spark.read.format("cmr")
        .option("fixture_path", fixture)
        .option("short_name", "MOD13A1")
        .load()
    )
    assert df.count() == 10
    assert {r.collection for r in df.collect()} == {"MOD13A1"}


def test_cmr_stream_reader_incremental(spark, tmp_path):
    """Streaming discovery: first run drains the catalog; a second run
    from the same checkpoint emits ONLY granules added in between."""
    register(spark)
    fixture = str(tmp_path / "catalog.jsonl")
    _write_fixture(fixture, n=10)
    out = str(tmp_path / "discovered")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("cmr")
            .option("fixture_path", fixture)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 10

    # catalog grows by 5 granules; incremental offsets pick up ONLY them
    with open(fixture, "a") as fh:
        for i in range(10, 15):
            fh.write(
                json.dumps(
                    {
                        "granule_id": f"G{i:04d}",
                        "collection": "MOD13A1",
                        "version": "003",
                        "time_start": "2020-01-15T00:00:00Z",
                        "bbox": [-180, -90, 180, 90],
                        "href": f"https://x/g{i}.nc",
                    }
                )
                + "\n"
            )
    drain()
    back = spark.read.parquet(out)
    assert back.count() == 15
    assert back.select("granule_id").distinct().count() == 15
