"""STAC ingestor as a first-class Spark writer format.

``sinks.submit_items`` (K4) POSTs from ``foreachPartition`` — fire and
forget, like the reference's Lambda (at-least-once, no transactional
boundary).  This DataSourceWriter upgrade adds the two-phase contract
Spark's sink API provides and the reference lacks:

    df.write.format("stac_ingestor")
      .option("staging_dir", ...)         # capture target (prod: + POST)
      .option("api_url", "...")           # reference: STAC_INGESTOR_API_URL
      .mode("append").save()

- each task stages its partition's items to
  ``{staging_dir}/part-{partition}-{attempt}.jsonl`` and returns a
  commit message (path + row count);
- ``commit`` runs ONCE on the driver after every task succeeded and
  publishes a ``_MANIFEST.json`` listing the staged files — a reader
  (or the downstream POST relay) trusts only manifested files, so
  retried/zombie task attempts can never double-submit;
- ``abort`` leaves no manifest: the staged files are dead by contract.

The HTTP POST itself (submit-stac/handler.py:80-93) is relayed from
the manifested files in prod — the container has no network, so the
relay hook raises NotImplementedError like the other I/O stubs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


class StacIngestorWriter(DataSourceWriter):
    def __init__(self, options):
        self.staging_dir = options.get("staging_dir")
        self.item_col = options.get("item_col", "item_json")

    def write(self, iterator: Iterator) -> _Staged:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        path = os.path.join(
            self.staging_dir,
            f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl",
        )
        os.makedirs(self.staging_dir, exist_ok=True)
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(row[self.item_col] + "\n")
                n += 1
        return _Staged(path=path, rows=n)

    def commit(self, messages) -> None:
        manifest = {
            "files": [{"path": m.path, "rows": m.rows} for m in messages],
            "total_rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.staging_dir, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        # no manifest -> staged files are unreferenced by contract;
        # best-effort cleanup of whatever attempts reported back
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


def relay_manifest(staging_dir: str) -> None:  # pragma: no cover - stub
    """Prod hook: POST every manifested item to the ingestor REST API
    (submit-stac/handler.py:80-93).  No network in this container."""
    raise NotImplementedError(
        "wire requests.post({api_url}/ingestions) over _MANIFEST.json files"
    )


class StacIngestorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stac_ingestor"

    def schema(self) -> str:  # writer-only source; schema comes from the df
        return "item_json string"

    def writer(self, schema: StructType, overwrite: bool) -> StacIngestorWriter:
        return StacIngestorWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(StacIngestorDataSource)
