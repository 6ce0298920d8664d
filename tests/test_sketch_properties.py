"""Hypothesis fuzzing of the new mergeable/layout operators against
pure-Python models: KMV sketches (merge == direct, any partitioning),
Morton codes (bit-interleave model), and chunk windows (sliding-slice
model).  One Spark job per example batch, examples capped for speed."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloud_optimized_data_pipelines_spark.operators import sketches as SK
from cloud_optimized_data_pipelines_spark.operators.packing import chunk_documents
from cloud_optimized_data_pipelines_spark.operators.zorder import morton_code

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def model_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def model_kmv(keys: list[str], k: int) -> list[int]:
    return sorted({model_hash32(x) for x in keys})[:k]


@SET
@given(
    keys=st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=120),
    k=st.integers(min_value=1, max_value=16),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_kmv_matches_model_any_partitioning(spark, keys, k, n_parts):
    """Daily/sharded partials merged == one-pass == pure-Python model,
    regardless of how rows land in partitions."""
    rows = [(key, i % n_parts) for i, key in enumerate(keys)]
    df = spark.createDataFrame(rows, "k string, part long")
    direct = SK.kmv_partial(df, "k", dims=(), k=k).first()["kmv"]
    per_part = SK.kmv_partial(df, "k", dims=("part",), k=k)
    merged = SK.kmv_merge(per_part.drop("part").select(F.col("kmv")), dims=(), k=k)
    assert list(direct) == model_kmv([r[0] for r in rows], k)
    assert list(merged.first()["kmv"]) == list(direct)


def model_morton(vals: list[int], bits: int) -> int:
    z = 0
    d = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * d + j)
    return z


@SET
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_morton_matches_model_3d(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long, z long")
    got = [
        r["m"]
        for r in df.select(
            morton_code([F.col("x"), F.col("y"), F.col("z")], bits=8).alias("m")
        ).collect()
    ]
    assert got == [model_morton(list(p), 8) for p in pts]


def model_chunks(tokens: list[str], size: int, stride: int) -> list[tuple]:
    starts = [0]
    while starts[-1] + size < len(tokens):
        starts.append(starts[-1] + stride)
    return [
        (s // stride, " ".join(tokens[s : s + size]), min(size, len(tokens) - s))
        for s in starts
    ]


@SET
@given(
    n_tok=st.integers(min_value=0, max_value=200),
    size=st.integers(min_value=2, max_value=32),
    overlap=st.integers(min_value=0, max_value=31),
)
def test_chunks_match_model(spark, n_tok, size, overlap):
    if overlap >= size:
        overlap = size - 1
    toks = [f"t{i}" for i in range(n_tok)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, size=size, overlap=overlap).collect()
    )
    want = sorted(model_chunks(toks, size, size - overlap))
    if n_tok == 0:
        want = [(0, "", 0)]
    assert got == want
