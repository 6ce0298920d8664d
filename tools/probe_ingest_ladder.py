"""Compressed-corpus ingest ladder (r14 — VERDICT r13 task 7): one
session, one table.  N zstd shards (~11 MB decoded each) in a single
parquet binary column -> decode_text_column (magic sniff, zstd CLI
engine, bounded Arrow hand-back, spread_small_scan parallelism floor)
-> agg forcing the full text column across the bridge.  Reports wall
time, cluster MB/s (decoded bytes / wall), and the post-spread
partition count per rung.

Usage: python tools/probe_ingest_ladder.py [shards ...]   # default 64 256 1024
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402


def build_shard() -> tuple[bytes, int]:
    """One ~11.2 MB-decoded deterministic JSONL text shard, zstd -3."""
    lines = []
    for k in range(80_000):
        lines.append(
            '{"id": %d, "text": "the quick brown fox %d jumps over the '
            'lazy dog while sampling token budgets and charset chains '
            '%d"}' % (k, k * 7 % 9973, k * 13 % 7919)
        )
    raw = ("\n".join(lines)).encode()
    comp = subprocess.run(
        ["zstd", "-3", "-c"], input=raw, capture_output=True, check=True
    ).stdout
    return comp, len(raw)


def main() -> None:
    rungs = [int(x) for x in sys.argv[1:]] or [64, 256, 1024]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.sources.compressed import (
        decode_text_column,
    )

    comp, raw_len = build_shard()
    print(f"shard: {len(comp) / 1e6:.1f} MB compressed, "
          f"{raw_len / 1e6:.1f} MB decoded")
    tmp = tempfile.mkdtemp(prefix="ingest_ladder_")

    def run_rung(n: int, reps: int):
        """Median-of-``reps`` wall time for one rung (first Spark job
        of a session pays python-worker startup; host noise showed a
        13x outlier on a single 1024 reading — medians are the only
        trustworthy reading on a shared box)."""
        path = os.path.join(tmp, f"shards_{n}")
        if not os.path.isdir(path):
            spark.createDataFrame(
                [Row(id=i, blob=bytearray(comp)) for i in range(n)]
            ).coalesce(max(1, n // 32)).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        scan_parts = df.rdd.getNumPartitions()
        decoded = decode_text_column(df, "id", "blob")
        walls = []
        for _ in range(reps):
            t0 = time.time()
            got = decoded.agg(
                F.count("*").alias("n"),
                F.sum(F.length("text")).alias("chars"),
            ).collect()[0]
            walls.append(time.time() - t0)
            assert got["n"] == n, got
        dt = sorted(walls)[len(walls) // 2]
        post = decoded.rdd.getNumPartitions()
        return scan_parts, post, dt, walls

    # absorb python-worker startup before anything is timed for record
    run_rung(8, 1)

    results = []
    for n in rungs:
        scan_parts, post, dt, walls = run_rung(n, 3)
        mbs = n * raw_len / 1e6 / dt
        results.append((n, scan_parts, post, n * raw_len / 1e9, dt, mbs))
        print(f"shards={n}: scan_splits={scan_parts} post_spread={post} "
              f"decoded={n * raw_len / 1e9:.1f} GB wall={dt:.1f}s "
              f"(runs {['%.1f' % w for w in walls]}) "
              f"cluster={mbs:,.0f} MB/s")
    print("\n| shards | scan splits | post-spread | decoded GB | wall s "
          "| cluster MB/s |")
    print("|---|---|---|---|---|---|")
    for n, sp, po, gb, dt, mbs in results:
        print(f"| {n} | {sp} | {po} | {gb:.1f} | {dt:.1f} | "
              f"**{mbs:,.0f}** |")


if __name__ == "__main__":
    main()
