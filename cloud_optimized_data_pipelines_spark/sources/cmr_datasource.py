"""CMR granule catalog as a first-class Spark data source.

SURVEY §4: the reference pushes ``temporal`` / ``bounding_box`` /
``short_name`` / ``version`` predicates INTO the CMR REST call
(``lambdas/cmr-query/handler.py:21-27``) — the one operator that needs
source-level code to keep that pushdown in a Spark engine.  This is the
Python Data Source API (Spark 4) implementation:

    spark.read.format("cmr")
         .option("fixture_path", ...)       # offline catalog; prod: REST
         .option("page_size", "100")
         .load()
         .filter(...)                        # temporal/collection filters
                                             # arrive via pushFilters()

- ``pushFilters`` accepts equality on collection/version and range
  predicates on ``time_start`` — exactly the parameters the reference
  sends server-side — and leaves everything else to Spark.
- ``partitions`` exposes CMR's pagination as input partitions: each
  page is fetched by its own task (the reference's ``get_all()`` loop
  at cmr-query/handler.py:8-27 becomes executor parallelism).
- The catalog backend is pluggable — and BOTH are real:
  * ``fixture_path``: JSON-lines catalog (offline tests/CI);
  * ``endpoint``: an actual paginated CMR-style REST backend — GET
    ``{endpoint}?short_name=&version=&temporal=start,end&page_num=N&
    page_size=K`` (the public CMR granules.json parameter shape,
    cmr-query/handler.py:21-27) via stdlib urllib, total hits from the
    ``CMR-Hits`` response header, entries parsed from ``feed.entry``
    (title/producer_granule_id, time_start, ``boxes`` "S W N E",
    data# link href).  Optional ``token`` sends the Earthdata
    ``Authorization: Bearer`` header.  The sandbox has no external
    egress, but the HTTP path is driven end-to-end in tests against a
    loopback server — the same code path a networked cluster runs
    against cmr.earthdata.nasa.gov.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from datetime import datetime, timezone
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

CMR_SCHEMA = (
    "granule_id string, collection string, version string, "
    "time_start timestamp_ntz, west double, south double, "
    "east double, north double, href string"
)

_ISO = "%Y-%m-%dT%H:%M:%SZ"


def _parse_ts(s: str) -> datetime:
    return datetime.strptime(s, _ISO)


class _Page(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CmrReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.options = options
        self.fixture_path = options.get("fixture_path")
        self.endpoint = options.get("endpoint")
        self.token = options.get("token")
        self.timeout = float(options.get("timeout", "30"))
        self.page_size = int(options.get("page_size", "100"))
        # server-side parameters (reference defaults:
        # cmr-query/handler.py:15,25)
        self.collection = options.get("short_name")
        self.version = options.get("version")
        self.temporal_start = _parse_ts(
            options.get("temporal_start", "1000-01-01T00:00:00Z")
        )
        self.temporal_end = _parse_ts(
            options.get("temporal_end", "3000-01-01T00:00:00Z")
        )

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        """Absorb the predicates CMR evaluates server-side; yield back
        the rest for Spark to apply.

        CMR's ``temporal`` range is INCLUSIVE on both ends, so strict
        ``<`` / ``>`` predicates are used to NARROW the server request
        but are ALSO yielded back for Spark to re-apply — absorbing
        them outright would leak boundary-timestamp granules (caught by
        the loopback-server test; double-filtering is always safe)."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if isinstance(f, EqualTo) and col == "collection":
                self.collection = f.value
            elif isinstance(f, EqualTo) and col == "version":
                self.version = f.value
            elif isinstance(f, GreaterThanOrEqual) and col == "time_start":
                self.temporal_start = max(self.temporal_start, f.value)
            elif isinstance(f, LessThanOrEqual) and col == "time_start":
                self.temporal_end = min(self.temporal_end, f.value)
            elif isinstance(f, GreaterThan) and col == "time_start":
                self.temporal_start = max(self.temporal_start, f.value)
                yield f  # inclusive server range: Spark re-applies strict >
            elif isinstance(f, LessThan) and col == "time_start":
                self.temporal_end = min(self.temporal_end, f.value)
                yield f  # inclusive server range: Spark re-applies strict <
            else:
                yield f  # not server-side-expressible: Spark re-applies

    def _catalog(self) -> list[dict]:
        with open(self.fixture_path) as fh:
            grans = [json.loads(line) for line in fh if line.strip()]
        out = []
        for g in grans:
            ts = _parse_ts(g["time_start"])
            if self.collection and g["collection"] != self.collection:
                continue
            if self.version and g["version"] != self.version:
                continue
            if not (self.temporal_start <= ts <= self.temporal_end):
                continue
            out.append(g)
        return out

    # -- REST backend (the public CMR granules.json parameter shape) --

    def _http_params(self, page_num: int, page_size: int) -> str:
        params = {
            "page_num": str(page_num),
            "page_size": str(page_size),
            "temporal": (
                self.temporal_start.strftime(_ISO)
                + ","
                + self.temporal_end.strftime(_ISO)
            ),
        }
        if self.collection:
            params["short_name"] = self.collection
        if self.version:
            params["version"] = self.version
        return urllib.parse.urlencode(params)

    def _http_get(self, page_num: int, page_size: int):
        """One paginated GET; returns (entries, total_hits)."""
        url = f"{self.endpoint}?{self._http_params(page_num, page_size)}"
        req = urllib.request.Request(url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            hits = int(resp.headers.get("CMR-Hits", "0"))
            body = json.loads(resp.read())
        return body.get("feed", {}).get("entry", []), hits

    def _entry_tuple(self, e: dict):
        # CMR boxes are "south west north east"; granules described by
        # polygons/points instead of boxes get NULL bbox columns (the
        # schema is nullable) rather than a task-killing KeyError
        if e.get("boxes"):
            s, w, n, east = (float(x) for x in e["boxes"][0].split())
        else:
            s = w = n = east = None
        href = next(
            (
                link["href"]
                for link in e.get("links", [])
                if link.get("rel", "").endswith("/data#")
            ),
            None,
        )
        return (
            e.get("producer_granule_id") or e["title"],
            self.collection or e.get("short_name", ""),
            self.version or e.get("version", ""),
            # survivorship: a granule missing time_start emits NULL (the
            # schema is nullable) instead of a task-killing KeyError —
            # same policy as the boxless-bbox hardening above
            _parse_ts(e["time_start"]) if e.get("time_start") else None,
            w,
            s,
            east,
            n,
            href,
        )

    def partitions(self) -> list[_Page]:
        # one partition per catalog page — the paginated get_all() loop
        # as task parallelism; a count query is one cheap pre-request
        if self.endpoint:
            _, hits = self._http_get(1, 1)  # CMR-Hits carries the total
            n = hits
        else:
            n = len(self._catalog())
        pages = max(1, -(-n // self.page_size))
        return [
            _Page(i * self.page_size, min((i + 1) * self.page_size, n))
            for i in range(pages)
        ]

    def read(self, partition: _Page):
        if self.endpoint:
            page_num = partition.start // self.page_size + 1
            entries, _ = self._http_get(page_num, self.page_size)
            for e in entries:
                yield self._entry_tuple(e)
            return
        for g in self._catalog()[partition.start : partition.end]:
            yield (
                g["granule_id"],
                g["collection"],
                g["version"],
                _parse_ts(g["time_start"]),
                float(g["bbox"][0]),
                float(g["bbox"][1]),
                float(g["bbox"][2]),
                float(g["bbox"][3]),
                g["href"],
            )


def _granule_tuple(g: dict):
    return (
        g["granule_id"],
        g["collection"],
        g["version"],
        _parse_ts(g["time_start"]),
        float(g["bbox"][0]),
        float(g["bbox"][1]),
        float(g["bbox"][2]),
        float(g["bbox"][3]),
        g["href"],
    )


class CmrStreamReader(SimpleDataSourceStreamReader):
    """Incremental discovery: each micro-batch emits granules the
    catalog added since the last committed offset — the reference's
    re-run-discovery-on-a-schedule loop (OPERATING.md) as a Structured
    Streaming source with exactly-once offsets.

    Offset = count of catalog entries already emitted (CMR returns
    results in stable insertion order; prod would track the CMR
    ``revision_date`` cursor instead)."""

    def __init__(self, options):
        self.fixture_path = options.get("fixture_path")

    def _catalog(self) -> list[dict]:
        with open(self.fixture_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        cat = self._catalog()
        i = start["index"]
        return [_granule_tuple(g) for g in cat[i:]], {"index": len(cat)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery
        return [
            _granule_tuple(g)
            for g in self._catalog()[start["index"] : end["index"]]
        ]


class CmrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cmr"

    def schema(self) -> str:
        return CMR_SCHEMA

    def reader(self, schema: StructType) -> CmrReader:
        return CmrReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> CmrStreamReader:
        return CmrStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CmrDataSource)
