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


# ---------------------------------------------------------------------------
# round-6: REAL HTTP backend driven against a loopback CMR-style server
# ---------------------------------------------------------------------------


class _CmrServer:
    """Loopback server speaking the public CMR granules.json shape:
    short_name/version/temporal/page_num/page_size params, CMR-Hits
    total header, feed.entry list with boxes 'S W N E' + data# links."""

    def __init__(self, granules):
        import http.server
        import json as _json
        import threading
        import urllib.parse as up

        self.requests = []
        server = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                q = up.parse_qs(up.urlparse(self.path).query)
                server.requests.append(
                    {
                        "params": {k: v[0] for k, v in q.items()},
                        "auth": self.headers.get("Authorization"),
                    }
                )
                sel = [
                    g
                    for g in granules
                    if ("short_name" not in q or g["short_name"] == q["short_name"][0])
                    and ("version" not in q or g["version"] == q["version"][0])
                ]
                if "temporal" in q:
                    lo, hi = q["temporal"][0].split(",")
                    sel = [g for g in sel if lo <= g["time_start"] <= hi]
                page = int(q.get("page_num", ["1"])[0])
                size = int(q.get("page_size", ["100"])[0])
                entries = sel[(page - 1) * size : page * size]
                body = _json.dumps({"feed": {"entry": entries}}).encode()
                self.send_response(200)
                self.send_header("CMR-Hits", str(len(sel)))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/search/granules.json"

    def stop(self):
        self.httpd.shutdown()


def _mk_granules(n, short_name="NO2", version="1"):
    return [
        {
            "title": f"G{i:03d}",
            "producer_granule_id": f"G{i:03d}.nc",
            "short_name": short_name,
            "version": version,
            "time_start": f"2021-01-{i % 28 + 1:02d}T00:00:00Z",
            "boxes": ["-10 -20 10 20"],  # S W N E
            "links": [
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#",
                 "href": "https://x/meta"},
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/data#",
                 "href": f"s3://bucket/G{i:03d}.nc"},
            ],
        }
        for i in range(n)
    ]


def test_cmr_http_backend_pagination_auth_and_pushdown(spark):
    from cloud_optimized_data_pipelines_spark.sources.cmr_datasource import (
        register,
    )

    srv = _CmrServer(_mk_granules(10, "NO2") + _mk_granules(4, "AOD"))
    try:
        register(spark)
        df = (
            spark.read.format("cmr")
            .option("endpoint", srv.url)
            .option("page_size", "3")
            .option("token", "EDL-abc123")
            .load()
            .filter(F.col("collection") == "NO2")
        )
        rows = df.collect()
        assert len(rows) == 10
        # bbox mapping from CMR 'S W N E' boxes
        r = rows[0]
        assert (r.west, r.south, r.east, r.north) == (-20.0, -10.0, 20.0, 10.0)
        assert r.href.startswith("s3://bucket/G")
        assert r.granule_id.endswith(".nc")
        # pagination: count request + ceil(10/3)=4 page reads (workers may
        # retry; at least 4 distinct page_nums for NO2)
        pages = {
            req["params"].get("page_num")
            for req in srv.requests
            if req["params"].get("short_name") == "NO2"
            and req["params"].get("page_size") == "3"
        }
        assert pages >= {"1", "2", "3", "4"}
        # pushFilters reached the server: every request carried short_name
        assert all(
            req["params"].get("short_name") == "NO2"
            for req in srv.requests
            if req["params"].get("page_size") == "3"
        )
        # Earthdata bearer token on the wire
        assert all(req["auth"] == "Bearer EDL-abc123" for req in srv.requests)
    finally:
        srv.stop()


def test_cmr_http_backend_temporal_pushdown(spark):
    from cloud_optimized_data_pipelines_spark.sources.cmr_datasource import (
        register,
    )

    srv = _CmrServer(_mk_granules(28, "NO2"))
    try:
        register(spark)
        df = (
            spark.read.format("cmr")
            .option("endpoint", srv.url)
            .option("page_size", "50")
            .load()
            .filter(
                (F.col("collection") == "NO2")
                & (F.col("time_start") >= "2021-01-10")
                & (F.col("time_start") < "2021-01-15")
            )
        )
        rows = df.collect()
        assert {r.time_start.day for r in rows} == {10, 11, 12, 13, 14}
        # the temporal range was narrowed SERVER-side (params, not just
        # a client filter): some request carries a non-default window
        assert any(
            req["params"].get("temporal", "").startswith("2021-01-10")
            for req in srv.requests
        )
    finally:
        srv.stop()


def test_cmr_http_backend_boxless_granules(spark):
    """Granules described by polygons/points (no 'boxes') decode with
    NULL bbox columns instead of killing the task."""
    from cloud_optimized_data_pipelines_spark.sources.cmr_datasource import (
        register,
    )

    grans = _mk_granules(3, "NO2")
    del grans[1]["boxes"]
    srv = _CmrServer(grans)
    try:
        register(spark)
        rows = {
            r.granule_id: r
            for r in spark.read.format("cmr")
            .option("endpoint", srv.url)
            .load()
            .collect()
        }
        assert len(rows) == 3
        assert rows["G001.nc"].west is None and rows["G001.nc"].north is None
        assert rows["G000.nc"].west == -20.0
    finally:
        srv.stop()
