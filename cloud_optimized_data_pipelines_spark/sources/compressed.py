"""Uniform compressed-corpus ingestion: magic-sniffed decode of the
five container formats training-data shards actually arrive in —
gzip (.jsonl.gz), zstd (.jsonl.zst), LZ4 frame (.jsonl.lz4), xz
(.jsonl.xz) and bzip2 (.jsonl.bz2) — through ONE entry point, so a
mixed-provenance corpus (different dumps compressed differently)
reads as a single binary column regardless of codec.

Decoders: gzip rides ``operators/deflate_codec`` (dual-engine: C
zlib hot path, from-scratch RFC 1951 conformance artifact), zstd
rides ``operators/zstd_codec`` (from-scratch RFC 8878, CLI
cross-checked), LZ4 rides ``operators/lz4_codec`` (from-scratch
frame+block, CLI cross-checked); xz and bzip2 use the stdlib
``lzma``/``bz2`` C modules (both formats carry no public from-scratch
value here — stdlib IS the reference binding).

Spark surface: :func:`decode_text_column` — Arrow-batched map that
sniffs each blob, decodes, and returns (id, codec, text); at 100 TB
this is a pure scan-side map, one decode per shard inside its input
split, no shuffle.
"""

from __future__ import annotations

import bz2
import lzma
from typing import Iterator

import pandas as pd

from cloud_optimized_data_pipelines_spark.batching import (
    BatchFlusher,
    spread_small_scan,
)
from cloud_optimized_data_pipelines_spark.operators.deflate_codec import (
    gzip_decode,
)
from cloud_optimized_data_pipelines_spark.operators.lz4_codec import (
    lz4_decompress,
)
from cloud_optimized_data_pipelines_spark.operators.zstd_codec import (
    zstd_decompress,
)

_MAGICS = [
    (b"\x1f\x8b", "gzip"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"\x04\x22\x4d\x18", "lz4"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"BZh", "bzip2"),
]


def detect_codec(data: bytes) -> str:
    for magic, name in _MAGICS:
        if data[: len(magic)] == magic:
            return name
    return "raw"


def decompress_auto(data: bytes, zstd_engine: str = "auto") -> bytes:
    """Sniff + decode one shard.  ``zstd_engine`` forwards to
    :func:`zstd_codec.zstd_decompress` (default "auto": the
    reference CLI when present — the bulk-throughput path — falling
    back to the from-scratch pure decoder)."""
    codec = detect_codec(data)
    if codec == "gzip":
        return gzip_decode(data)
    if codec == "zstd":
        return zstd_decompress(data, engine=zstd_engine)
    if codec == "lz4":
        return lz4_decompress(data)
    if codec == "xz":
        return lzma.decompress(data)
    if codec == "bzip2":
        return bz2.decompress(data)
    return data


COMPRESSED_TEXT_SCHEMA = "id bigint, codec string, text string"

def decode_text_column(df, id_col: str, binary_col: str,
                       zstd_engine: str = "auto"):
    """Explode a binary column of compressed text shards into
    (id, codec, text) — the uniform front door for mixed-codec
    corpora.  Output flushes in bounded Arrow batches (see
    ``batching.BatchFlusher``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fl = BatchFlusher(["id", "codec", "text"])
        for pdf in batches:
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                raw = decompress_auto(blob, zstd_engine=zstd_engine)
                out = fl.add(
                    {
                        "id": int(rid),
                        "codec": detect_codec(blob),
                        "text": raw.decode("utf-8", errors="replace"),
                    },
                    nbytes=len(raw),
                )
                if out is not None:
                    yield out
        tail = fl.tail()
        if tail is not None:
            yield tail

    return spread_small_scan(df.select(id_col, binary_col)).mapInPandas(
        gen, COMPRESSED_TEXT_SCHEMA
    )
