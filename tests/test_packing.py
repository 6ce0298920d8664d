"""Chunking and packing: boundary cases + reconstruction properties."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.packing import (
    chunk_documents,
    pack_documents,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # shorter than size
        (2, " ".join(f"u{i}" for i in range(16))),   # exactly size
        (3, " ".join(f"v{i}" for i in range(17))),   # one past → 2 chunks
        (4, " ".join(f"w{i}" for i in range(100))),  # many windows
        (5, ""),                                     # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_window_boundaries(toy_docs):
    out = chunk_documents(toy_docs, size=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # stride 12: doc4 (100 toks) → ceil((100-16)/12)=7 strides → 8 chunks
    assert [len(by_doc[d]) for d in (1, 2, 3, 4, 5)] == [1, 1, 2, 8, 1]
    assert by_doc[5][0]["chunk_text"] == "" and by_doc[5][0]["n_tokens"] == 0
    assert by_doc[3][1]["chunk_text"].split()[-1] == "v16"  # tail covered


def test_chunks_reconstruct_document(toy_docs):
    """Dropping each chunk's first `overlap` tokens (except chunk 0)
    and concatenating reproduces the document exactly."""
    out = chunk_documents(toy_docs, size=16, overlap=4)
    rows = sorted(
        out.filter(F.col("doc_id") == 4).collect(), key=lambda r: r["chunk_idx"]
    )
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split()
        # windows step by stride=12; a late window may re-cover more
        # than `overlap` of the tail — drop whatever is already present
        new = [t for t in toks if t not in rebuilt]
        rebuilt.extend(new)
    assert rebuilt == [f"w{i}" for i in range(100)]


def test_chunking_is_shuffle_free(toy_docs):
    plan = (
        chunk_documents(toy_docs, size=16, overlap=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_invariants(spark, sf_dir):
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    packed = pack_documents(docs, budget=512, n_shards=16)
    rows = packed.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r["pack_offset"] < 512 for r in rows)
    assert all(0 <= r["shard"] < 16 for r in rows)
    # per shard, pack_id is nondecreasing in doc_id order and dense-ish
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for shard, ids in by_shard.items():
        assert ids == sorted(ids), f"pack_id not monotone in shard {shard}"
        assert ids[0] == 0


def test_pack_determinism_under_repartition(spark, sf_dir):
    """Hash-shard + windowed cumsum must not depend on input layout."""
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    a = sorted(map(tuple, pack_documents(docs, budget=512).collect()))
    b = sorted(
        map(tuple, pack_documents(docs.repartition(7), budget=512).collect())
    )
    assert a == b


def test_null_text_is_empty_doc(spark):
    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    chunks = chunk_documents(df, size=4, overlap=1).collect()
    by_doc = {r["doc_id"]: r for r in chunks}
    assert by_doc[1]["chunk_text"] == "" and by_doc[1]["n_tokens"] == 0
    packs = {r["doc_id"]: r for r in pack_documents(df, budget=4).collect()}
    assert packs[1]["n_tokens"] == 0 and packs[1]["pack_id"] is not None
