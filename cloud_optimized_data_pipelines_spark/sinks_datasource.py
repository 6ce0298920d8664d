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
the manifested files by :func:`relay_manifest` — a REAL urllib POST
loop with bearer auth, bounded retries with backoff on 5xx/connection
errors, and fail-fast on 4xx (a rejected item re-posted forever is the
reference's DLQ poison case).  The sandbox has no external egress, but
the relay is driven end-to-end in tests against a loopback HTTP server
— same code path a networked cluster runs.
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


def relay_manifest(
    staging_dir: str,
    api_url: str,
    token: str | None = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff: float = 0.2,
) -> dict:
    """POST every MANIFESTED item to ``{api_url}/ingestions`` — the
    reference's submit handler (submit-stac/handler.py:80-93) run from
    the two-phase staging area.

    Trusts only ``_MANIFEST.json`` (absent manifest = aborted write =
    nothing to relay, raised loudly); per item: urllib POST with
    ``Authorization: Bearer <token>`` when given, retried with linear
    backoff on connection errors / 5xx up to ``max_retries``, FAIL-FAST
    on 4xx (client-rejected items must go to quarantine, not a retry
    storm — the reference's DLQ poison case).  Returns
    ``{"posted": n, "failed": [(item_index, error), ...]}`` —
    at-least-once like the reference; idempotence is the ingestor's
    side of the contract (items carry stable ids).
    """
    import time
    import urllib.error
    import urllib.request

    manifest_path = os.path.join(staging_dir, "_MANIFEST.json")
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"no _MANIFEST.json in {staging_dir!r}: the write was never "
            "committed (aborted staging files are dead by contract)"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    url = api_url.rstrip("/") + "/ingestions"
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    posted = 0
    failed: list[tuple[int, str]] = []
    idx = 0
    for entry in manifest["files"]:
        with open(entry["path"]) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                last_err = None
                for attempt in range(max_retries):
                    req = urllib.request.Request(
                        url, data=line.encode(), headers=headers, method="POST"
                    )
                    try:
                        with urllib.request.urlopen(req, timeout=timeout):
                            posted += 1
                            last_err = None
                            break
                    except urllib.error.HTTPError as exc:
                        if 400 <= exc.code < 500:
                            last_err = f"HTTP {exc.code} (not retried)"
                            break  # fail fast: client error
                        last_err = f"HTTP {exc.code}"
                    except (urllib.error.URLError, OSError) as exc:
                        last_err = f"{type(exc).__name__}: {exc}"
                    time.sleep(backoff * (attempt + 1))
                if last_err is not None:
                    failed.append((idx, last_err))
                idx += 1
    return {"posted": posted, "failed": failed}


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
