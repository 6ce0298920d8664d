"""Streaming-mode tests: queue tables, micro-batch stages, quarantine,
watermarked windows, streaming dedup — against the events test table."""

import time

from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.streaming.queues import (
    dedup_within_watermark,
    enqueue,
    run_stage,
    stream_queue,
    windowed_event_counts,
)


def _await(query, timeout=60):
    query.awaitTermination(timeout * 1000)


def test_queue_stage_end_to_end(spark, sf_dir, tmp_path):
    """Producer -> queue -> micro-batch stage -> output queue, with the
    bad rows quarantined (the reference's cogify_queue -> DLQ shape)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    # queue payloads carry epoch micros regardless of how the parquet
    # declares ts (bigint nanos in older testdata, timestamp[us] now)
    if dict(events.dtypes)["ts"] != "bigint":
        events = events.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        )
    else:
        events = events.withColumn("ts", F.col("ts").cast("long"))
    qdir = str(tmp_path / "queue")
    enqueue(events, qdir)

    schema = spark.read.parquet(qdir).schema
    stream = stream_queue(spark, qdir, schema, max_files_per_trigger=10)
    assert stream.isStreaming

    def stage(batch):
        return batch.withColumn(
            "error",
            F.when(F.col("event_type") == "error", F.lit("simulated failure")),
        )

    out_dir = str(tmp_path / "out")
    qr_dir = str(tmp_path / "quarantine")
    q = run_stage(
        stream,
        stage,
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine_path=qr_dir,
        available_now=True,
    )
    _await(q)

    out = spark.read.parquet(out_dir)
    quarantined = spark.read.parquet(qr_dir)
    n_bad = events.filter(F.col("event_type") == "error").count()
    assert out.count() == 200 - n_bad
    assert quarantined.count() == n_bad
    assert quarantined.select(F.max("attempts")).collect()[0][0] == 1
    assert out.filter(F.col("event_type") == "error").count() == 0


def test_windowed_counts_with_watermark(spark, sf_dir, tmp_path):
    """Watermarked tumbling windows over a real event stream; closed
    windows match the batch groupBy exactly."""
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    events = load_tables(spark, sf_dir)["events"]
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = stream_queue(spark, src, schema, max_files_per_trigger=100)
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    out = str(tmp_path / "agg_out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; every emitted row
    # must equal its batch-mode counterpart
    batch = (
        events.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    joined = got.select("window_start", "event_type", "n_events").join(
        batch.withColumnRenamed("n_events", "expected"),
        ["window_start", "event_type"],
    )
    assert joined.count() > 0
    assert joined.filter(F.col("n_events") != F.col("expected")).count() == 0


def test_dedup_within_watermark_stream(spark, tmp_path):
    rows = [
        (1, "u1", "click", "2024-01-01 10:00:00"),
        (1, "u1", "click", "2024-01-01 10:00:05"),  # dup id within watermark
        (2, "u1", "view", "2024-01-01 10:01:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = stream_queue(spark, src, spark.read.parquet(src).schema, 10)
    deduped = dedup_within_watermark(stream, ["event_id"], "1 hour")
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert got.filter(F.col("event_id") == 1).count() == 1


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Stream-stream attribution join: streaming result rows must be a
    subset-equal of the batch interval join over the same data."""
    from cloud_optimized_data_pipelines_spark.queries import load_tables
    from cloud_optimized_data_pipelines_spark.streaming.queues import (
        attribution_interval_join,
    )

    events = load_tables(spark, sf_dir)["events"]
    src = str(tmp_path / "ssj_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    views = stream_queue(spark, src, schema, 1000).filter(
        F.col("event_type") == "view"
    )
    clicks = stream_queue(spark, src, schema, 1000).filter(
        F.col("event_type") == "click"
    )
    joined = attribution_interval_join(views, clicks, max_delay="1 hour")
    out = str(tmp_path / "ssj_out")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out).select("imp_event_id", "conv_event_id")

    ev = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vk"),
        F.col("event_id").alias("imp_event_id"),
        F.col("ts").alias("vts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("ck"),
        F.col("event_id").alias("conv_event_id"),
        F.col("ts").alias("cts"),
    )
    batch = v.join(
        c,
        (F.col("vk") == F.col("ck"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 1 hour")),
    ).select("imp_event_id", "conv_event_id")

    assert got.count() > 0
    # every emitted pair is correct, and (availableNow over a static
    # source) nothing within the watermark horizon was dropped
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Streaming dedup vs the persistent digest table: duplicates are
    dropped within AND across micro-batches; the earliest occurrence
    survives; digest state is md5-sized."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        stream_exact_dedup,
    )

    rows = [
        (i, f"doc text {i % 30}") for i in range(90)
    ]  # every text appears 3x across the stream
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_exact_dedup(
        stream,
        "text",
        "doc_id",
        str(tmp_path / "out"),
        str(tmp_path / "digests"),
        str(tmp_path / "ckpt"),
    )
    _await(q)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 30  # one survivor per distinct text
    assert out.select("text").distinct().count() == 30
    # each survivor is one of its text's real occurrences (earliest
    # batch wins; batch composition depends on file split order, so the
    # deterministic min-id-within-batch property is covered by the
    # replay test below)
    occurrences = {}
    for i, t in rows:
        occurrences.setdefault(t, set()).add(i)
    for r in out.collect():
        assert r.doc_id in occurrences[r.text]
    digests = spark.read.parquet(str(tmp_path / "digests"))
    assert digests.count() == 30
    assert set(digests.columns) == {"_h", "batch_id"}


def test_stream_exact_dedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch retry semantics: re-running a batch with the same
    batch_id must overwrite its own partition with the identical rows —
    no duplicates, no loss."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    out = str(tmp_path / "out")
    dig = str(tmp_path / "digests")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], "doc_id long, text string"
    )
    process_dedup_batch(spark, b0, 0, "text", "doc_id", out, dig)
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig)
    first = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert first == [(1, "alpha"), (3, "beta"), (5, "gamma")]
    # replay batch 1 (simulated foreachBatch retry after failure)
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig)
    again = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert again == first
    assert spark.read.parquet(dig).count() == 3


def test_streaming_psi_matches_batch(spark, tmp_path):
    """Streaming drift monitor: per-micro-batch category partials,
    merged PSI == batch psi_by_window bit-for-bit regardless of how
    micro-batches sliced the stream; replaying with the same checkpoint
    appends nothing new."""
    from cloud_optimized_data_pipelines_spark.operators.drift import (
        psi_by_window,
    )
    from cloud_optimized_data_pipelines_spark.streaming.drift_stream import (
        append_category_partials,
        psi_from_partials,
    )

    rows = [
        (i, ["click", "view", "buy", "view"][i % 4], i % 10 < 6)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, early boolean")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    wexpr = F.when(F.col("early"), "before").otherwise("after")
    part_path = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    _await(append_category_partials(stream, part_path, ckpt, "event_type", wexpr))

    partials = spark.read.parquet(part_path)
    assert partials.count() > 3  # several per-batch partial rows
    n_before_replay = partials.count()

    got = sorted(
        map(tuple, psi_from_partials(spark, part_path, "before", "after").collect())
    )
    want = sorted(
        map(tuple, psi_by_window(df, "event_type", wexpr).collect())
    )
    assert got == want  # bit-identical, not approx

    # replay: same checkpoint, no new files -> nothing appended
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _await(append_category_partials(stream2, part_path, ckpt, "event_type", wexpr))
    assert spark.read.parquet(part_path).count() == n_before_replay


def test_streaming_discovery_fetch_pipeline(spark, tmp_path):
    """The reference's discovery -> download loop as a STREAMING stage:
    queued discovery records drain in micro-batches through fetch_stage
    (real file:// chunked fetch on executors); failed URLs keep flowing
    with their error captured (quarantine split semantics) rather than
    failing the batch."""
    import os

    from cloud_optimized_data_pipelines_spark.operators.fetch import (
        fetch_stage,
    )
    from cloud_optimized_data_pipelines_spark.streaming.queues import (
        enqueue,
        run_stage,
        stream_queue,
    )

    store = tmp_path / "granules"
    os.makedirs(store)
    rows = []
    for i in range(8):
        p = store / f"g{i}.nc"
        p.write_bytes(b"granule-bytes-%d" % i)
        rows.append((i, p.as_uri()))
    rows.append((99, str(store / "missing.nc")))  # captured, not fatal
    df = spark.createDataFrame(rows, "event_id long, s3_filename string")
    q = str(tmp_path / "queue")
    df.repartition(3).write.parquet(q)  # 3 files -> several micro-batches
    stream = stream_queue(
        spark, q, spark.read.parquet(q).schema, max_files_per_trigger=1
    )
    out_path = str(tmp_path / "fetched")
    query = run_stage(
        stream,
        lambda batch: fetch_stage(batch, dest_dir=str(tmp_path), timeout=2),
        out_path,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    _await(query)
    out = {r.event_id: r for r in spark.read.parquet(out_path).collect()}
    assert len(out) == 9  # survivorship across micro-batches
    for i in range(8):
        assert out[i].error is None
        assert out[i].n_bytes == len(b"granule-bytes-%d" % i)
        with open(out[i].local_path, "rb") as f:
            assert f.read() == b"granule-bytes-%d" % i
    assert out[99].error is not None and out[99].local_path is None


def test_bloom_gated_dedup_equals_ungated(spark, tmp_path):
    """The Bloom gate is a pure pre-filter: across several batches with
    in-batch dups, cross-batch dups, and all-new batches, the gated
    pipeline admits EXACTLY the rows the ungated one does (the
    no-false-negative property), and the bloom partial table stays
    fixed-size."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    batches = [
        [(1, "alpha"), (2, "alpha"), (3, "beta")],
        [(4, "beta"), (5, "gamma"), (6, "gamma")],
        [(7, "delta"), (8, "epsilon")],  # the all-new crawl batch
        [(9, "alpha"), (10, "zeta")],
    ]
    plain_out, plain_dig = str(tmp_path / "po"), str(tmp_path / "pd")
    gate_out, gate_dig = str(tmp_path / "go"), str(tmp_path / "gd")
    bloom = str(tmp_path / "bloom")
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_dedup_batch(spark, b, bid, "text", "doc_id",
                            plain_out, plain_dig)
        process_dedup_batch(spark, b, bid, "text", "doc_id",
                            gate_out, gate_dig, bloom_path=bloom,
                            bloom_m_bits=1 << 12, bloom_k_hashes=4)
    plain = sorted((r.doc_id, r.text, r.batch_id)
                   for r in spark.read.parquet(plain_out).collect())
    gated = sorted((r.doc_id, r.text, r.batch_id)
                   for r in spark.read.parquet(gate_out).collect())
    assert gated == plain
    bp = spark.read.parquet(bloom)
    assert set(bp.columns) == {
        "word_idx", "bits", "batch_id", "m_bits", "k_hashes"
    }
    assert {(r.m_bits, r.k_hashes)
            for r in bp.select("m_bits", "k_hashes").distinct().collect()
            } == {(1 << 12, 4)}
    # fixed-size state: well under m_bits/63 words regardless of rows
    assert bp.count() <= (1 << 12) // 63 + 4


def test_bloom_gated_dedup_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch through the gated path (foreachBatch retry)
    must reproduce its exact survivor set: the bloom partial of the
    replayed batch is already on disk, but (a) it is excluded by
    batch_id on read, and (b) bit_or merge is idempotent anyway."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    out, dig, bloom = (str(tmp_path / p) for p in ("out", "dig", "bloom"))
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(3, "beta"), (4, "gamma")], "doc_id long, text string"
    )
    kw = dict(bloom_path=bloom, bloom_m_bits=1 << 12)
    process_dedup_batch(spark, b0, 0, "text", "doc_id", out, dig, **kw)
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig, **kw)
    first = sorted((r.doc_id, r.text)
                   for r in spark.read.parquet(out).collect())
    assert first == [(1, "alpha"), (2, "beta"), (4, "gamma")]
    bloom_first = sorted(
        (r.word_idx, r.bits, r.batch_id)
        for r in spark.read.parquet(bloom).collect()
    )
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig, **kw)
    again = sorted((r.doc_id, r.text)
                   for r in spark.read.parquet(out).collect())
    assert again == first
    bloom_again = sorted(
        (r.word_idx, r.bits, r.batch_id)
        for r in spark.read.parquet(bloom).collect()
    )
    assert bloom_again == bloom_first


def test_bloom_gate_forced_false_positive_still_correct(spark, tmp_path):
    """A tiny filter (m=63 -> everything collides) forces the
    false-positive path: every key reads maybe_present and takes the
    anti-join — results must still match the ungated truth."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    out, dig, bloom = (str(tmp_path / p) for p in ("o2", "d2", "b2"))
    b0 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(2, "alpha"), (3, "brand-new")], "doc_id long, text string"
    )
    kw = dict(bloom_path=bloom, bloom_m_bits=63, bloom_k_hashes=2)
    process_dedup_batch(spark, b0, 0, "text", "doc_id", out, dig, **kw)
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig, **kw)
    got = sorted((r.doc_id, r.text)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "alpha"), (3, "brand-new")]


def test_bloom_gate_bootstraps_from_pregate_digest_history(spark, tmp_path):
    """Introducing bloom_path AFTER ungated batches have admitted
    digests must not create false negatives: the gate backfills the
    missing batches' partials from the digest table before probing, so
    a duplicate of a pre-bloom document is still rejected (this was
    the ADVICE r7 hazard: pre-bloom digests absent from the filter
    probed 'definitely new' and skipped the anti-join)."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    out, dig, bloom = (str(tmp_path / p) for p in ("o3", "d3", "b3"))
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame([(3, "gamma")], "doc_id long, text string")
    # batches 0-1 run UNGATED: digest history exists, bloom table does not
    process_dedup_batch(spark, b0, 0, "text", "doc_id", out, dig)
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig)
    # batch 2 turns the gate on and carries a dup of batch-0 content
    b2 = spark.createDataFrame(
        [(4, "alpha"), (5, "delta")], "doc_id long, text string"
    )
    process_dedup_batch(spark, b2, 2, "text", "doc_id", out, dig,
                        bloom_path=bloom, bloom_m_bits=1 << 12,
                        bloom_k_hashes=4)
    got = sorted((r.doc_id, r.text)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma"), (5, "delta")]
    # the backfill wrote partials for every pre-gate batch
    bp = spark.read.parquet(bloom)
    assert {r.batch_id for r in bp.select("batch_id").distinct().collect()
            } == {0, 1, 2}


def test_bloom_gate_auto_resizes_and_stays_exact(spark, tmp_path):
    """bloom_m_bits='auto' (the default) sizes the filter from the
    persisted digest count: a first batch large enough that 64 Ki bits
    would saturate makes the NEXT batch rebuild at a bigger power of
    two, every partial carries the new uniform geometry, and the gated
    survivor set still equals the ungated truth (dup rejected, new
    admitted)."""
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        _auto_bloom_size,
        process_dedup_batch,
    )

    # geometry math: floor at 64 Ki, then next power of two past ~9.59n
    assert _auto_bloom_size(0) == (1 << 16, 8)
    assert _auto_bloom_size(1000) == (1 << 16, 8)   # 9.59k < 64k -> floor
    m8k, k8k = _auto_bloom_size(8000)               # 76.7k -> 128 Ki
    assert m8k == 1 << 17 and 1 <= k8k <= 8

    out, dig, bloom = (str(tmp_path / p) for p in ("o4", "d4", "b4"))
    n = 8000
    b0 = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(n)], "doc_id long, text string"
    ).coalesce(4)
    process_dedup_batch(spark, b0, 0, "text", "doc_id", out, dig,
                        bloom_path=bloom)
    # batch 0 sized for an empty history -> 64 Ki floor
    import pyspark.sql.functions as F
    bp0 = spark.read.parquet(bloom)
    assert {r.m_bits for r in bp0.select("m_bits").distinct().collect()
            } == {1 << 16}
    # batch 1 sees n=8000 digests -> rebuild at 128 Ki, uniform geometry
    b1 = spark.createDataFrame(
        [(n + 1, "doc-0"), (n + 2, "fresh-doc")], "doc_id long, text string"
    )
    process_dedup_batch(spark, b1, 1, "text", "doc_id", out, dig,
                        bloom_path=bloom)
    bp1 = spark.read.parquet(bloom)
    assert {(r.m_bits, r.k_hashes) for r in
            bp1.select("m_bits", "k_hashes").distinct().collect()
            } == {(m8k, k8k)}
    admitted = spark.read.parquet(out).filter(F.col("batch_id") == 1)
    assert sorted((r.doc_id, r.text) for r in admitted.collect()
                  ) == [(n + 2, "fresh-doc")]


def test_watermark_replay_matches_real_stream(spark, tmp_path):
    """The graded batch twin (watermark_replay) and the REAL
    withWatermark stream agree on every finalized window: same
    accepted counts, and the replay's dropped rows are exactly the
    ones the stream never aggregates.  Batch order is forced via file
    modification times + maxFilesPerTrigger=1."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.streaming.queues import (
        watermark_replay,
        windowed_event_counts,
    )

    base = dt.datetime(2024, 1, 1)

    def t(h, m=30):
        return base + dt.timedelta(hours=h, minutes=m)

    # (event_id, ts, type, arrival_batch); delay 2h, hourly windows.
    # The watermark in effect during batch k lags TWO batches (batch
    # k-1's stats commit at batch k+1): wm(b0)=wm(b1)=-inf,
    # wm(b2) = max(b0) - 2h = 1:30.  Discriminators:
    #   row 8  (0:40 in b1): wm -inf            -> ACCEPTED (late, open)
    #   row 12 (3:15 in b2): end 4:00 > 1:30    -> ACCEPTED
    #   row 14 (0:50 in b2): end 1:00 <= 1:30   -> DROPPED
    #   row 15 (2:15 in b2): end 3:00 > 1:30    -> ACCEPTED (the case
    #     that separates the two-batch lag from the naive one-batch
    #     rule, under which wm(b2) would be 5:30 and this would drop)
    rows = [
        (0, t(0), "a", 0), (1, t(1), "a", 0), (2, t(2), "b", 0),
        (3, t(3), "a", 0),
        (4, t(4), "b", 1), (5, t(5), "a", 1), (6, t(6), "b", 1),
        (7, t(7), "a", 1),
        (8, t(0, 40), "a", 1), (9, t(1, 40), "b", 1),
        (10, t(8), "a", 2), (11, t(9), "b", 2),
        (12, t(3, 15), "a", 2), (13, t(5, 15), "b", 2),
        (14, t(0, 50), "a", 2), (15, t(2, 15), "a", 2),
    ]
    df = spark.createDataFrame(
        [(i, ts, et, 1.0, b) for i, ts, et, b in rows],
        "event_id long, ts timestamp, event_type string, value double, b int",
    )

    rep = {
        (r.window_us, r.event_type): r
        for r in watermark_replay(
            df, "b", "ts", "event_type", delay_seconds=7200
        ).collect()
    }
    h = 3_600_000_000

    def us(hour):
        return int((base + dt.timedelta(hours=hour)).timestamp() * 1e6)

    assert rep[(us(0), "a")].accepted == 2  # 0:40 straggler aggregated
    assert rep[(us(0), "a")].dropped == 1  # 0:50 in b2: window finalized
    assert rep[(us(1), "b")].accepted == 1  # the 1:40 straggler lands
    assert rep[(us(3), "a")].accepted == 2  # 3:15 still open under 1:30
    assert rep[(us(2), "a")].accepted == 1  # 2:15 — the lag discriminator
    assert rep[(us(5), "b")].accepted == 1  # 5:15 late-but-open
    assert sum(r.dropped for r in rep.values()) == 1

    # real stream: one file per batch, mtime-ordered
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    for k in range(3):
        part = str(tmp_path / f"b{k}")
        df.filter(F.col("b") == k).drop("b").coalesce(1).write.parquet(part)
        (pf,) = glob.glob(os.path.join(part, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{k}.parquet")
        shutil.copyfile(pf, dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        windowed_event_counts(
            stream, window_duration="1 hour", watermark_delay="2 hours"
        )
        .writeStream.format("memory")
        .queryName("wm_equiv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    emitted = spark.table("wm_equiv").collect()
    assert emitted, "append mode emitted no finalized windows"
    for r in emitted:
        key = (int(r.window_start.timestamp() * 1e6), r.event_type)
        assert key in rep, f"stream emitted unexpected window {key}"
        assert r.n_events == rep[key].accepted, key
    # every emitted window is finalized: end <= final watermark 7:30
    for r in emitted:
        assert int(r.window_end.timestamp() * 1e6) <= us(7) + h // 2
