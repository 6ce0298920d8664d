"""SparkSession factory with scale-oriented defaults.

Tuned for the 100 TB design point but sized by environment variables so
local[32] tests and a 1000-executor cluster share one code path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """~1/5 of AVAILABLE RAM, clamped to [4g, 24g]: 24g on the 128 GiB
    bench box (768 MB per local[32] task), proportionally less on dev
    laptops so the local-mode JVM never swaps or fails to start.
    Available = min(physical RAM, cgroup memory limit) — inside a
    memory-limited container sysconf reports the HOST's RAM, and
    sizing to that gets the JVM OOM-killed.  SPARK_DRIVER_MEMORY
    overrides."""
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return "8g"
    for limit_file in (
        "/sys/fs/cgroup/memory.max",  # cgroup v2
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",  # cgroup v1
    ):
        try:
            with open(limit_file) as f:
                raw = f.read().strip()
            if raw.isdigit():
                total = min(total, int(raw))
        except OSError:
            pass
    total_gib = total / (1 << 30)
    return f"{max(4, min(24, int(total_gib / 5)))}g"


def get_spark(
    app_name: str = "cloud-optimized-data-pipelines-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE + Arrow enabled.

    Defaults that matter at scale:
    - AQE on (runtime coalescing, skew-join splitting, dynamic join
      strategy switch) — the 100 TB plan is re-planned from actual
      shuffle statistics instead of static estimates.
    - ``advisoryPartitionSizeInBytes`` 128m — post-shuffle partitions
      sized to fit executor memory at any SF.
    - Arrow execution for every pandas interchange (the multimodal /
      raster UDF path).
    - 128m ``maxPartitionBytes`` so a 100 TB scan yields ~800k input
      splits, matching a 1000-executor cluster's task granularity.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        # the synthetic testdata carries TIMESTAMP(NANOS) parquet columns
        # (events.ts) which Spark has no native type for: read as long,
        # converted to microsecond timestamps in queries.load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # DuckDB-oracle parity: all timestamps are naive (NTZ); with the
        # session pinned to UTC the semantics are unchanged
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        # Python Data Source API pushdown (the CMR connector translates
        # collection/version/temporal predicates into catalog-side
        # parameters — sources/cmr_datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # local-mode the driver JVM IS the executor: size the heap for
        # SPARK_GRAFT_CPUS concurrent tasks (8g gave 32 tasks 256 MB
        # each — GC-bound on multi-GB string scans; 24g ≈ 768 MB/task
        # on a 128 GiB box, matching a sane per-core cluster sizing).
        # The default DERIVES from machine RAM (~1/5, clamped to
        # [4g, 24g]) so smaller dev boxes start without swapping;
        # SPARK_DRIVER_MEMORY overrides either way (r12 ADVICE).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        # bucketed-table writes (operators/bucketing.py) need a managed
        # warehouse; keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
