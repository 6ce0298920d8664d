"""Mergeable sketches: exact-merge properties, accuracy gates, plans."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators import sketches as SK
from cloud_optimized_data_pipelines_spark.queries import load_tables


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"].filter(F.col("user_id").isNotNull())


def test_kmv_daily_merge_equals_direct_sketch(events):
    """The KMV merge property: k-smallest of the distinct union of
    daily partials IS the one-pass sketch — arrays bit-equal."""
    daily = SK.kmv_partial(
        events.withColumn("day", F.to_date("ts")),
        "user_id",
        dims=("event_type", "day"),
        k=64,
    )
    merged = {
        r["event_type"]: r["kmv"]
        for r in SK.kmv_merge(daily, dims=("event_type",), k=64).collect()
    }
    direct = {
        r["event_type"]: r["kmv"]
        for r in SK.kmv_partial(events, "user_id", dims=("event_type",), k=64).collect()
    }
    assert merged == direct and len(direct) > 0


def test_kmv_estimate_accuracy(spark, events):
    est = (
        SK.kmv_partial(events, "user_id", dims=("event_type",), k=64)
        .select("event_type", SK.kmv_estimate("kmv", k=64).alias("est"))
        .collect()
    )
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in est:
        rel = abs(r["est"] - exact[r["event_type"]]) / exact[r["event_type"]]
        assert rel < 0.25, (r["event_type"], r["est"], exact[r["event_type"]])


def test_kmv_small_group_is_exact(spark):
    """Groups with < k distinct keys: the sketch is the whole hash set,
    estimate falls back to the exact distinct count."""
    df = spark.range(40).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 10).alias("k")
    )
    rows = (
        SK.kmv_partial(df, "k", dims=("g",), k=64)
        .select("g", SK.kmv_estimate("kmv", k=64).alias("est"))
        .collect()
    )
    assert {r["g"]: r["est"] for r in rows} == {0: 5.0, 1: 5.0}


def test_cms_never_undercounts_and_bounded_state(events):
    sketch = SK.cms_build(events, "user_id", depth=4, width=512)
    assert sketch.count() <= 4 * 512  # fixed-size state, any input volume
    top = (
        events.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    n_total = events.count()
    probed = SK.cms_probe(sketch, top, "user_id", depth=4, width=512).collect()
    assert len(probed) == top.count()  # ≤20 when the sf has fewer users
    for r in probed:
        assert r["cms_estimate"] >= r["exact_n"]  # collisions only add
        # classic CMS bound with depth=4: err ≤ e·N/width w.h.p.;
        # generous 2× slack keeps the deterministic fixture stable
        assert r["cms_estimate"] - r["exact_n"] <= 2 * 2.718 * n_total / 512


def test_cms_probe_broadcasts_candidates(events):
    sketch = SK.cms_build(events, "user_id", depth=4, width=512)
    top = events.groupBy("user_id").agg(F.count("*").alias("exact_n")).limit(5)
    plan = (
        SK.cms_probe(sketch, top, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_hll_daily_merge_matches_exact_within_tolerance(events):
    daily = SK.hll_partial(
        events.withColumn("day", F.to_date("ts")), "user_id", dims=("event_type", "day")
    )
    est = {
        r["event_type"]: r["est_uniques"]
        for r in SK.hll_merge_estimate(daily, dims=("event_type",)).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.05, (t, est[t], n)


def test_hll_merge_is_partitioning_invariant(events):
    """HLL register state depends on the hashed SET, not row order or
    grouping — merging day partials equals the one-pass estimate."""
    daily = SK.hll_partial(
        events.withColumn("day", F.to_date("ts")), "user_id", dims=("event_type", "day")
    )
    via_days = {
        r["event_type"]: r["est_uniques"]
        for r in SK.hll_merge_estimate(daily, dims=("event_type",)).collect()
    }
    one_pass = {
        r["event_type"]: r["est"]
        for r in SK.hll_partial(events, "user_id", dims=("event_type",))
        .select("event_type", F.hll_sketch_estimate("hll").alias("est"))
        .collect()
    }
    assert via_days == one_pass


def test_approx_percentile_tracks_exact(spark, sf_dir):
    # the graded query's histogram estimates (in cents) AND the
    # native GK percentile_approx both track the exact percentiles
    # within the documented bounds
    from cloud_optimized_data_pipelines_spark.queries import QUERIES, load_tables

    hist = {
        r["l_returnflag"]: (r["p50_est"] / 100.0, r["p95_est"] / 100.0)
        for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    }
    li = load_tables(spark, sf_dir)["lineitem"]
    native = {
        r["l_returnflag"]: (r["p50_gk"], r["p95_gk"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", 0.5, 10000
            ).alias("p50_gk"),
            F.percentile_approx(
                "l_extendedprice", 0.95, 10000
            ).alias("p95_gk"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    span = float(hi - lo)
    # histogram bound: half a bucket of the FIXED [900, 110000] domain
    hist_bound = (110000.0 - 900.0) / 512
    for flag, (e50, e95) in exact.items():
        h50, h95 = hist[flag]
        assert abs(h50 - float(e50)) <= hist_bound, (flag, h50, e50)
        assert abs(h95 - float(e95)) <= hist_bound, (flag, h95, e95)
        g50, g95 = native[flag]
        assert abs(float(g50) - float(e50)) <= 0.01 * span
        assert abs(float(g95) - float(e95)) <= 0.01 * span


def test_streamed_sketch_partials_merge_to_one_pass(spark, events, tmp_path):
    """Sketches over streams: per-micro-batch KMV and HLL partials
    appended (streaming/partials.py), merged at read time — identical
    to the one-pass batch sketch over the same rows."""
    from cloud_optimized_data_pipelines_spark.streaming.partials import (
        append_stream_partials,
    )

    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    kmv_path = str(tmp_path / "kmv")
    q1 = append_stream_partials(
        make_stream(),
        kmv_path,
        str(tmp_path / "ck1"),
        lambda b: SK.kmv_partial(b, "user_id", dims=("event_type",), k=32),
    )
    hll_path = str(tmp_path / "hll")
    q2 = append_stream_partials(
        make_stream(),
        hll_path,
        str(tmp_path / "ck2"),
        lambda b: SK.hll_partial(b, "user_id", dims=("event_type",)),
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    streamed_kmv = {
        r["event_type"]: list(r["kmv"])
        for r in SK.kmv_merge(
            spark.read.parquet(kmv_path), dims=("event_type",), k=32
        ).collect()
    }
    direct_kmv = {
        r["event_type"]: list(r["kmv"])
        for r in SK.kmv_partial(events, "user_id", dims=("event_type",), k=32).collect()
    }
    assert streamed_kmv == direct_kmv

    streamed_hll = {
        r["event_type"]: r["est_uniques"]
        for r in SK.hll_merge_estimate(
            spark.read.parquet(hll_path), dims=("event_type",)
        ).collect()
    }
    one_pass = {
        r["event_type"]: r["est"]
        for r in SK.hll_partial(events, "user_id", dims=("event_type",))
        .select("event_type", F.hll_sketch_estimate("hll").alias("est"))
        .collect()
    }
    assert streamed_hll == one_pass


def test_kmin_sample_merge_equals_direct(events):
    """Bottom-k rank sample merge property: k smallest ranks of the
    union of daily partials IS the one-pass sample — struct arrays
    equal, so quantile estimates from either path are identical."""
    daily = SK.kmin_sample_partial(
        events.withColumn("day", F.to_date("ts")),
        "event_id",
        "value",
        dims=("event_type", "day"),
        k=64,
    )
    merged = {
        r["event_type"]: r["sample"]
        for r in SK.kmin_sample_merge(daily, dims=("event_type",), k=64).collect()
    }
    direct = {
        r["event_type"]: r["sample"]
        for r in SK.kmin_sample_partial(
            events, "event_id", "value", dims=("event_type",), k=64
        ).collect()
    }
    assert merged == direct and len(direct) > 0


def test_kmin_sample_quantile_is_close(spark, events):
    """64-point sample median lands near the exact median (uniform
    sample; loose 25%-relative gate keeps the test deterministic)."""
    sk = SK.kmin_sample_partial(
        events, "event_id", "value", dims=("event_type",), k=64
    ).select("event_type", SK.kmin_sample_quantile("sample", 0.5).alias("est"))
    exact = events.groupBy("event_type").agg(
        F.median(F.col("value").cast("double")).alias("ex")
    )
    for r in sk.join(exact, "event_type").collect():
        assert abs(r.est - r.ex) <= 0.25 * max(abs(r.ex), 1.0)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_contains,
        bloom_partial,
    )

    present = spark.createDataFrame(
        [(f"url-{i}",) for i in range(500)], "k string"
    )
    bloom = bloom_partial(present, "k", m_bits=1 << 14, k_hashes=4)
    # no false negatives: every inserted key tests maybe_present
    got = bloom_contains(bloom, present, "k", m_bits=1 << 14, k_hashes=4)
    assert got.filter(~F.col("maybe_present")).count() == 0
    # false positives bounded: n=500, m=16384, k=4 -> ~(1-e^-0.122)^4 ~ 1.7e-4
    absent = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], "k string"
    )
    fp = (
        bloom_contains(bloom, absent, "k", m_bits=1 << 14, k_hashes=4)
        .filter(F.col("maybe_present"))
        .count()
    )
    assert fp <= 10, fp  # generous ceiling over the ~0.3 expectation


def test_bloom_merge_equals_one_pass(spark):
    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_merge,
        bloom_partial,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "k string")
    merged = bloom_merge(
        bloom_partial(a, "k").unionByName(bloom_partial(b, "k"))
    )
    direct = bloom_partial(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # idempotent: re-merging the same partial changes nothing
    twice = bloom_merge(
        bloom_partial(a, "k").unionByName(bloom_partial(a, "k"))
    )
    assert sorted(map(tuple, twice.collect())) == sorted(
        map(tuple, bloom_partial(a, "k").collect())
    )
    # sign bit never set (63-bit packing keeps DuckDB's checked shift safe)
    assert direct.filter("bits < 0").count() == 0


def test_portable_hll_accuracy_and_merge(spark):
    """Own-implementation HLL: estimate within the ~1.6%/sqrt(m)=1.63%
    envelope (3 sigma ~ 5%) across the linear-counting AND raw-
    estimator regimes; register partials merged by GROUP BY + MAX give
    the IDENTICAL estimate to sketching the union directly — the
    mergeability that makes it a sketch."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    for n in (500, 20000):  # linear-counting vs raw-estimator regimes
        df = spark.range(n).select(F.col("id").alias("k"))
        est = portable_hll_estimate(
            portable_hll_registers(df, "k")
        ).collect()[0]
        rel = abs(est["distinct_est"] - n) / n
        assert rel < 0.05, (n, est["distinct_est"])
    # mergeability: two halves sketched separately, registers merged
    a = spark.range(0, 6000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))  # overlap
    ra = portable_hll_registers(a, "k")
    rb = portable_hll_registers(b, "k")
    merged = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    direct = portable_hll_registers(a.unionByName(b), "k")
    em = portable_hll_estimate(merged).collect()[0]["distinct_est"]
    ed = portable_hll_estimate(direct).collect()[0]["distinct_est"]
    assert em == ed  # identical registers -> identical estimate
    assert abs(em - 9000) / 9000 < 0.05


def test_histogram_quantile_merge_invariance(spark, sf_dir):
    # partials merged across an arbitrary re-partitioning give the
    # same estimates — the summary's defining property
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    li = load_tables(spark, sf_dir)["lineitem"].withColumn(
        "cents", F.expr("CAST(l_extendedprice * 100 AS BIGINT)")
    )
    kw = dict(dims=("l_returnflag",), lo=90000, hi=11000000, buckets=512)
    one = SK.histogram_quantile_partials(li, "cents", **kw)
    # split the input, build partials per half, merge by SUM
    a = SK.histogram_quantile_partials(
        li.filter(F.col("l_orderkey") % 2 == 0), "cents", **kw
    )
    b = SK.histogram_quantile_partials(
        li.filter(F.col("l_orderkey") % 2 == 1), "cents", **kw
    )
    merged = (
        a.unionByName(b)
        .groupBy("l_returnflag", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    est = lambda p: sorted(
        tuple(r)
        for r in SK.histogram_quantile_estimate(p, **kw).collect()
    )
    assert est(one) == est(merged)


def test_portable_hll_sliding_matches_window_recompute(spark, events):
    # the fan-out merge equals recomputing each 7-day window from raw
    ev = events.filter(F.col("user_id").isNotNull()).withColumn(
        "day", F.to_date("ts")
    )
    daily = SK.portable_hll_registers(
        ev, "user_id", dims=("event_type", "day")
    )
    sliding = SK.portable_hll_sliding(
        daily, "day", dims=("event_type",), window=7
    )
    est = {
        (r["event_type"], r["window_end"]): r["distinct_est"]
        for r in SK.portable_hll_estimate(
            sliding, dims=("event_type", "window_end")
        ).collect()
    }
    # recompute three arbitrary windows from the raw events
    some = sorted({k[1] for k in est})[2:5]
    for wend in some:
        raw = ev.filter(
            (F.col("day") > F.date_sub(F.lit(wend), 7))
            & (F.col("day") <= F.lit(wend))
        )
        regs = SK.portable_hll_registers(
            raw, "user_id", dims=("event_type",)
        )
        direct = {
            r["event_type"]: r["distinct_est"]
            for r in SK.portable_hll_estimate(
                regs, dims=("event_type",)
            ).collect()
        }
        for et, v in direct.items():
            assert est[(et, wend)] == v, (et, wend)
