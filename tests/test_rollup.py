"""Hypertable rollup: materialized partials + exact late-tail merge."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.rollup import (
    continuous_aggregate,
    hourly_rollup,
    materialize_rollup,
    merge_rollups,
)
from cloud_optimized_data_pipelines_spark.queries import load_tables

CUTOFF = "2024-01-20 07:45:00"  # deliberately mid-hour


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


def direct_agg(events):
    """The ground truth: one aggregation over all raw rows."""
    return merge_rollups(hourly_rollup(events))


def test_merge_equals_direct_aggregation(spark, events):
    merged = continuous_aggregate(events, CUTOFF).collect()
    direct = direct_agg(events).collect()
    key = lambda r: (r["bucket"], r["event_type"])  # noqa: E731
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def test_cutoff_hour_split_across_partials_merges_exactly(events):
    """The bucket containing the cutoff appears in BOTH partials; its
    merged state must equal the direct state (counts/sums add)."""
    hour = "2024-01-20 07:00:00"
    merged = (
        continuous_aggregate(events, CUTOFF)
        .filter(F.col("bucket") == F.lit(hour).cast("timestamp_ntz"))
        .collect()
    )
    direct = (
        direct_agg(events)
        .filter(F.col("bucket") == F.lit(hour).cast("timestamp_ntz"))
        .collect()
    )
    assert len(merged) > 0, "cutoff hour empty — fixture drifted"
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def test_materialized_rollup_roundtrip(spark, events, tmp_path):
    """Materialize history to parquet (partitioned by bucket date), then
    merge with the raw tail — still equals direct aggregation."""
    path = str(tmp_path / "rollup")
    hist = materialize_rollup(spark, events, path, CUTOFF)
    merged = continuous_aggregate(events, CUTOFF, materialized=hist).collect()
    direct = direct_agg(events).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def test_tail_scan_filter_is_pushed_down(spark, events, tmp_path):
    """With a MATERIALIZED history, the only raw scan the merge pays is
    the tail; its timestamp predicate must reach the parquet reader
    (row-group pruning at scale).  (The in-flight path instead does ONE
    full scan with the cutoff as a grouping flag — no second scan to
    push into.)  The shared testdata stores ts as TIMESTAMP(NANOS)
    (read as long + rewritten, which blocks pushdown), so this asserts
    over a production-layout copy with a native timestamp column."""
    raw_path = str(tmp_path / "events_native")
    events.write.parquet(raw_path)
    native = spark.read.parquet(raw_path)
    hist = materialize_rollup(spark, native, str(tmp_path / "hist"), CUTOFF)
    plan = (
        continuous_aggregate(native, CUTOFF, materialized=hist)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # two tables in the plan: the materialized rollup (no ts column)
    # and raw events — identify the raw scans by ts in their ReadSchema
    # (the Location path is elided when long, so don't match on it)
    scans = [
        m.group(0)
        for m in re.finditer(r"FileScan parquet[^\n]*", plan)
        if "ts:" in m.group(0)
    ]
    assert scans, "expected raw events FileScan nodes in plan"
    for s in scans:
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", s)
        assert pushed and "ts" in pushed.group(1)


def test_rollup_state_is_tiny(events):
    """State size is |buckets × dims|, independent of raw row count —
    the reason the merge agg is cheap at 100 TB."""
    n_state = hourly_rollup(events).count()
    n_raw = events.count()
    n_hours = 31 * 24
    n_types = events.select("event_type").distinct().count()
    assert n_state <= n_hours * n_types
    assert n_state < n_raw


def test_stream_ingestion_then_compaction(spark, events, tmp_path):
    """Micro-batches append per-batch partials (append-only, no
    read-modify-write); the merged view equals direct aggregation after
    EVERY stage: multi-partial, and post-compaction."""
    from cloud_optimized_data_pipelines_spark.operators.rollup import (
        append_stream_rollup,
        compact_rollup,
        read_rollup_merged,
    )

    src = str(tmp_path / "src")
    # several small files → several micro-batches → repeated buckets
    events.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rollup_path = str(tmp_path / "rollup_stream")
    q = append_stream_rollup(stream, rollup_path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    direct = direct_agg(events).collect()
    merged = read_rollup_merged(spark, rollup_path).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))

    before, after = compact_rollup(spark, rollup_path)
    assert after <= before  # partial rows folded (equal if 1 batch/bucket)
    n_buckets = read_rollup_merged(spark, rollup_path).count()
    assert after == n_buckets  # exactly one partial row per bucket now
    compacted = read_rollup_merged(spark, rollup_path).collect()
    assert sorted(map(tuple, compacted)) == sorted(map(tuple, direct))


def test_cascade_composes_hour_day_month(spark, events):
    """hour → day → month cascades equal direct aggregation at every
    grain (partial state stays mergeable through re-truncation)."""
    from cloud_optimized_data_pipelines_spark.operators.rollup import (
        cascade_rollup,
        hourly_rollup,
        merge_rollups,
    )

    hourly = hourly_rollup(events)
    daily = cascade_rollup(hourly, "day")
    monthly = cascade_rollup(daily, "month")
    via_cascade = merge_rollups(monthly).collect()
    direct = merge_rollups(hourly_rollup(events, bucket="month")).collect()
    assert sorted(map(tuple, via_cascade)) == sorted(map(tuple, direct))
