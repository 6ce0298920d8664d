"""Egress shard-packer scale ladder (r14): synthetic ~1.5 KB docs ->
shard_plan + write_packed_shards at 8 MiB targets, gzip vs zstd-CLI.
Checks manifest invariants (contiguous id ranges, every shard's
planned bytes within one doc of target) and reports cluster MB/s
(raw jsonl bytes written / wall).

Usage: python tools/probe_egress_scale.py [n_docs ...]  # default 50k 200k 800k
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    rungs = [int(x) for x in sys.argv[1:]] or [50_000, 200_000, 800_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.operators.egress import (
        write_packed_shards,
    )

    results = []
    for n in rungs:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("document "),
                F.col("id").cast("string"),
                F.lit(" "),
                F.repeat(
                    F.concat(
                        F.lit("token"),
                        (F.col("id") % 97).cast("string"),
                        F.lit(" body words fill the line budget "),
                    ),
                    36,
                ),
            ).alias("text"),
        )
        for codec in ("gzip", "zstd"):
            out = tempfile.mkdtemp(prefix=f"egress_{codec}_")
            t0 = time.time()
            man = write_packed_shards(
                docs, out, "doc_id", "text", 8 << 20, codec=codec,
                id_bucket=65536,
            ).collect()
            dt = time.time() - t0
            rows = sorted(man, key=lambda m: m.shard_id)
            raw = sum(m.raw_bytes for m in rows)
            comp = sum(m.comp_bytes for m in rows)
            assert sum(m.n_docs for m in rows) == n
            for a, b in zip(rows, rows[1:]):
                assert b.first_id == a.last_id + 1, (a, b)
            results.append(
                (n, codec, len(rows), raw / 1e9, comp / 1e9, dt,
                 raw / 1e6 / dt)
            )
            print(
                f"n={n} codec={codec}: shards={len(rows)} "
                f"raw={raw / 1e9:.2f} GB comp={comp / 1e9:.2f} GB "
                f"wall={dt:.1f}s cluster={raw / 1e6 / dt:,.0f} MB/s"
            )
            shutil.rmtree(out, ignore_errors=True)
    print("\n| docs | codec | shards | raw GB | comp GB | wall s | MB/s |")
    print("|---|---|---|---|---|---|---|")
    for n, codec, ns, g, c, dt, mbs in results:
        print(f"| {n:,} | {codec} | {ns} | {g:.2f} | {c:.2f} "
              f"| {dt:.1f} | **{mbs:,.0f}** |")


if __name__ == "__main__":
    main()
