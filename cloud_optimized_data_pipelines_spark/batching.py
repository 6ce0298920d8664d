"""Bounded Arrow output batches for payload-exploding mapInPandas
operators.

A generator that yields one DataFrame per INPUT batch hands the JVM
one Arrow record batch per task-split — for payload columns that can
be a single multi-hundred-MB batch, which measured 51 MB/s
cluster-wide at 32-way local concurrency vs 1.5 GB/s when flushed at
8 MB (the hand-back then overlaps the python-side decode; see
SCALE.md r12).  It also means worker memory scales with the SPLIT
size instead of the flush budget — the failure mode that matters when
a 100 TB corpus hides the occasional 1 GB shard.

Usage inside a mapInPandas generator::

    fl = BatchFlusher(["id", "text"])
    for ...:
        out = fl.add({"id": i, "text": t}, nbytes=len(t))
        if out is not None:
            yield out
    tail = fl.tail()
    if tail is not None:
        yield tail
"""

from __future__ import annotations

import pandas as pd

FLUSH_BYTES = 8 << 20
FLUSH_ROWS = 10_000


class BatchFlusher:
    """Accumulate result rows; emit a DataFrame every ``budget``
    payload bytes or ``max_rows`` rows, whichever comes first."""

    __slots__ = ("columns", "budget", "max_rows", "_rows", "_pending")

    def __init__(self, columns: list[str], budget: int = FLUSH_BYTES,
                 max_rows: int = FLUSH_ROWS):
        self.columns = list(columns)
        self.budget = budget
        self.max_rows = max_rows
        self._rows: list[dict] = []
        self._pending = 0

    def add(self, row: dict, nbytes: int = 0) -> pd.DataFrame | None:
        self._rows.append(row)
        self._pending += nbytes
        if self._pending >= self.budget or len(self._rows) >= self.max_rows:
            return self._emit()
        return None

    def tail(self) -> pd.DataFrame | None:
        if self._rows:
            return self._emit()
        return None

    def _emit(self) -> pd.DataFrame:
        out = pd.DataFrame(self._rows, columns=self.columns)
        self._rows, self._pending = [], 0
        return out


def spread_small_scan(df):
    """Repartition an UNDER-PARALLEL input to the cluster's default
    parallelism before a payload exploder — the small-corpus floor fix
    (SCALE.md r12: a 64-shard parquet scans as 2 input splits under
    128 MB maxPartitionBytes, so 30 of 32 cores idle through the whole
    decode).  The branch only fires when the scan yields FEWER
    partitions than cores: at production scale (many input splits) the
    condition is false and no shuffle is added; when it does fire the
    one-time shuffle moves only the small corpus's compressed bytes
    and buys cores-per-shard decode parallelism."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:  # non-standard sessions: keep the plan untouched
        pass
    return df
