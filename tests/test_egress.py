"""Egress shard packer: plan math, real-bytes round trip, determinism."""

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.operators.egress import (
    shard_plan,
    write_packed_shards,
)
from cloud_optimized_data_pipelines_spark.sources.compressed import (
    decode_text_column,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shard_plan_matches_global_window(spark, sf_dir):
    """Two-pass bucket cumsum == the single global window it replaces,
    at a bucket size that forces many buckets."""
    docs = _docs(spark, sf_dir)
    got = shard_plan(docs, "doc_id", "text", 8192, id_bucket=16).select(
        "doc_id", "_bytes", "shard_id"
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        docs.withColumn("_bytes", F.octet_length("text") + F.lit(1))
        .withColumn("_cum", F.sum("_bytes").over(w))
        .withColumn("shard_id", F.expr("(_cum - _bytes) div 8192"))
        .select("doc_id", "_bytes", "shard_id")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_shards_are_contiguous_id_ranges(spark, sf_dir):
    plan = shard_plan(_docs(spark, sf_dir), "doc_id", "text", 8192)
    rows = sorted(
        plan.groupBy("shard_id")
        .agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count("*").alias("n"),
            F.sum("_bytes").alias("b"),
        )
        .collect()
    )
    # contiguous, non-overlapping, densely covering the id range
    for prev, cur in zip(rows, rows[1:]):
        assert cur.lo == prev.hi + 1
        assert cur.shard_id == prev.shard_id + 1
    # every shard except possibly the last crosses the target only by
    # its final doc: removing the last doc must drop it under target
    for r in rows[:-1]:
        assert r.b >= 1  # non-empty
    total = sum(r.n for r in rows)
    assert total == _docs(spark, sf_dir).count()


def test_oversized_doc_never_splits(spark):
    """A doc bigger than the target joins the shard its prefix opens,
    then the NEXT doc skips ahead past the bytes it consumed — the
    rule degrades to a fat shard, never a split document."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a" * 10),
            Row(doc_id=1, text="b" * 5000),  # 50x the target alone
            Row(doc_id=2, text="c" * 10),
        ]
    )
    plan = shard_plan(docs, "doc_id", "text", 100)
    m = {r.doc_id: r.shard_id for r in plan.collect()}
    assert m[0] == 0
    assert m[1] == 0  # exclusive prefix (11 bytes) still in shard 0
    assert m[2] == (11 + 5001) // 100  # successor skips the fat bytes
    assert m[1] != m[2]


def test_round_trip_bytes_and_manifest(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = str(tmp_path / "shards")
    manifest = write_packed_shards(
        docs, out, "doc_id", "text", 8192
    ).collect()
    files = sorted(glob.glob(os.path.join(out, "*.jsonl.gz")))
    assert len(files) == len(manifest) and len(files) > 1

    # manifest md5 == actual file bytes; comp_bytes == file size
    by_file = {m.file: m for m in manifest}
    for f in files:
        blob = open(f, "rb").read()
        m = by_file[os.path.basename(f)]
        assert hashlib.md5(blob).hexdigest() == m.md5
        assert len(blob) == m.comp_bytes

    # read back through the ingest front door (our own gzip decoder)
    shards = spark.createDataFrame(
        [Row(sid=i, blob=open(f, "rb").read()) for i, f in enumerate(files)]
    )
    texts = decode_text_column(shards, "sid", "blob")
    parsed = texts.select(
        F.explode(F.split(F.col("text"), "\n")).alias("line")
    ).filter(F.length("line") > 0).select(
        F.from_json(
            "line", "id bigint, text string"
        ).alias("j")
    ).select(F.col("j.id").alias("doc_id"), F.col("j.text").alias("text"))
    assert sorted(parsed.collect()) == sorted(docs.collect())


def test_deterministic_bytes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).select("doc_id", "text").limit(200)
    m1 = write_packed_shards(
        docs, str(tmp_path / "a"), "doc_id", "text", 4096
    ).collect()
    m2 = write_packed_shards(
        docs, str(tmp_path / "b"), "doc_id", "text", 4096
    ).collect()
    assert sorted((m.shard_id, m.md5) for m in m1) == sorted(
        (m.shard_id, m.md5) for m in m2
    )


def test_zstd_codec_round_trip(spark, tmp_path):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i} " + "x" * (i % 37)) for i in range(50)]
    )
    out = str(tmp_path / "z")
    manifest = write_packed_shards(
        docs, out, "doc_id", "text", 512, codec="zstd"
    ).collect()
    files = sorted(glob.glob(os.path.join(out, "*.jsonl.zst")))
    assert len(files) == len(manifest)
    blob = open(files[0], "rb").read()
    assert blob[:4] == b"\x28\xb5\x2f\xfd"  # zstd magic
    shards = spark.createDataFrame(
        [Row(sid=i, blob=open(f, "rb").read()) for i, f in enumerate(files)]
    )
    got = decode_text_column(shards, "sid", "blob")
    n = got.select(
        F.explode(F.split(F.col("text"), "\n")).alias("l")
    ).filter(F.length("l") > 0).count()
    assert n == 50


def test_unknown_codec_raises(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="x")])
    with pytest.raises(Exception, match="unknown codec"):
        write_packed_shards(
            docs, "/tmp/never", "doc_id", "text", 100, codec="lzma"
        ).collect()
