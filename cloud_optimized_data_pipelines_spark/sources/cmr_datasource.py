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
- The catalog backend is pluggable: a JSON-lines fixture here (the
  container has no network); production swaps a ``requests``-paginated
  fetch with identical pushed-parameter semantics.
"""

from __future__ import annotations

import json
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
        the rest for Spark to apply."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if isinstance(f, EqualTo) and col == "collection":
                self.collection = f.value
            elif isinstance(f, EqualTo) and col == "version":
                self.version = f.value
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == "time_start":
                self.temporal_start = max(self.temporal_start, f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and col == "time_start":
                self.temporal_end = min(self.temporal_end, f.value)
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

    def partitions(self) -> list[_Page]:
        # one partition per catalog page — the paginated get_all() loop
        # as task parallelism; a count query is one cheap pre-request
        n = len(self._catalog())
        pages = max(1, -(-n // self.page_size))
        return [
            _Page(i * self.page_size, min((i + 1) * self.page_size, n))
            for i in range(pages)
        ]

    def read(self, partition: _Page):
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
