"""Snapshot-versioned parquet tables: atomic commits, time travel, and
vacuum — the transactional slice of a lakehouse format on plain files.

The other maintenance ops here (compact/merge/delete in compact.py)
swap a table in place: readers get old-or-new, but history is gone and
a long-running job that listed files pre-swap can lose them mid-scan.
Versioning fixes both with the standard trick (Delta/Iceberg do the
same with manifests): every commit writes a NEW immutable snapshot
directory ``v=N`` and then atomically publishes a tiny pointer file.

- **Writers never mutate published data** — a crashed commit leaves an
  unpublished directory, never a torn table.
- **Readers pin a snapshot** at plan time (the pointer read), so a
  concurrent commit cannot change or delete files under a running scan
  (vacuum retains recent versions for exactly this reason).
- **Time travel** is just reading an older ``v=N``.

Publication relies on POSIX rename atomicity (os.replace).  On S3 the
pointer would be a small object PUT (atomic per-object) — same design,
which is precisely how Delta's ``_last_checkpoint`` behaves.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_PTR = "_latest"


def _version_dir(path: str, version: int) -> str:
    return os.path.join(path, f"v={version}")


def latest_version(path: str) -> int | None:
    """The published version, or None for an empty table.  Unpublished
    (crashed) snapshot dirs are invisible here by construction."""
    try:
        with open(os.path.join(path, _PTR)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def commit_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next snapshot and publish it atomically.
    Returns the new version number."""
    os.makedirs(path, exist_ok=True)
    current = latest_version(path)
    new = 0 if current is None else current + 1
    df.write.mode("overwrite").parquet(_version_dir(path, new))
    tmp = os.path.join(path, f"{_PTR}.tmp.{new}")
    with open(tmp, "w") as f:
        f.write(str(new))
    os.replace(tmp, os.path.join(path, _PTR))  # the atomic publish
    return new


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the latest snapshot, or time-travel to ``version``."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version at {path}")
    d = _version_dir(path, v)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"version {v} not found (vacuumed?) at {path}")
    return spark.read.parquet(d)


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop snapshots older than the ``keep_last`` most recent
    (published one always retained).  Returns removed versions.
    ``keep_last >= 2`` keeps the previous snapshot alive for readers
    that pinned it just before the latest commit."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    current = latest_version(path)
    if current is None:
        return []
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    keep = set(versions[-keep_last:]) | {current}
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(_version_dir(path, v))
            removed.append(v)
    return removed
