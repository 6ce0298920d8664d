"""Document chunking and sequence packing — the last mile between a
cleaned corpus and a trainer's fixed-length windows.

Chunking: each document becomes overlapping token windows (stride =
size - overlap).  Pure column expressions: tokenize once, explode a
precomputed start-index sequence, slice — no Python, no UDF, and the
explode is map-side (no shuffle at all).

Packing: pretraining concatenates documents into a token stream and
splits it into fixed budgets; a document's pack is decided by where its
first token lands in the stream.  A literal global cumsum is a
single-partition window — the classic scale trap — so the stream is
sharded first: documents hash into ``n_shards`` independent streams and
the running sum is windowed per shard.  Same training semantics (each
shard is a valid stream), bounded window partitions, deterministic
output (md5 hash order, no RNG).

Both are exact cross-engine (DuckDB oracle): identical tokenization
regex, identical window frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions import text as T
from cloud_optimized_data_pipelines_spark.operators.sampling import hash_bucket


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding token windows per document: (doc_id, chunk_idx,
    chunk_text, n_tokens).  Short docs yield one (possibly short)
    chunk; stride windows stop once a window covers the tail."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    # NULL text = empty doc (one empty chunk) — explode of a NULL
    # starts array would otherwise silently DROP the document
    toks = T.tokens(F.coalesce(F.col(text_col), F.lit("")))
    # last window start: the largest stride multiple that still adds
    # new tokens — ceil((n_tok - size) / stride) strides past 0
    n_tok = F.size(toks)
    n_strides = F.greatest(
        F.lit(0).cast("long"), F.ceil((n_tok - F.lit(size)) / F.lit(stride))
    )
    starts = F.sequence(
        F.lit(0).cast("long"), n_strides * stride, F.lit(stride).cast("long")
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(starts).alias("start"),
        )
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice("__toks", F.col("start").cast("int") + 1, size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(size).cast("long"), F.size("__toks") - F.col("start")
            ).alias("n_tokens"),
        )
    )


def pack_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Assign every document a (shard, pack_id): documents stream
    through their shard in id order and a pack closes when the running
    token total passes ``budget``.  Output: (doc_id, n_tokens, shard,
    pack_id, pack_offset) — offset = the document's first-token
    position inside its pack, so a trainer can slice exactly."""
    shard = hash_bucket(id_col, n_shards)
    # NULL text = 0 tokens, not a NULL that poisons the running sum
    n_tokens = T.token_count(F.coalesce(F.col(text_col), F.lit("")))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        shard.alias("shard"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        id_col,
        "n_tokens",
        "shard",
        ((F.col("cum") - F.col("n_tokens")) / budget).cast("long").alias("pack_id"),
        ((F.col("cum") - F.col("n_tokens")) % budget).alias("pack_offset"),
    )
