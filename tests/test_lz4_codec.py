"""LZ4 frame/block codec tests — reference CLI cross-check in both
directions (the in-container ``lz4`` binary), XXH32 via the frame
checksums, plus block-format edge cases."""

import os
import random
import shutil
import struct
import subprocess

import pytest

from cloud_optimized_data_pipelines_spark.operators import lz4_codec as L

_HAVE_CLI = shutil.which("lz4") is not None
needs_cli = pytest.mark.skipif(not _HAVE_CLI, reason="lz4 CLI not present")


def _cli(args, data):
    r = subprocess.run(args, input=data, capture_output=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


def _corpus():
    random.seed(23)
    return {
        "empty": b"",
        "tiny": b"abc",
        "rle": b"z" * 9000,
        "text": b"the quick brown fox jumps over the lazy dog. " * 1500,
        "rand": os.urandom(40_000),
        "mixed": b"A" * 40_000 + os.urandom(400) + b"B" * 40_000,
        "big": bytes(random.choices(b"abcdef ", k=2_500_000)),  # 3 blocks
    }


def test_xxh32_reference_vector():
    # xxHash spec: XXH32("") seed 0
    assert L.xxh32(b"") == 0x02CC5D05


@needs_cli
@pytest.mark.parametrize("level", ["-1", "-9"])
def test_decode_cli_frames(level):
    for name, data in _corpus().items():
        comp = _cli(["lz4", level, "-c"], data)
        assert L.lz4_decompress(comp) == data, name


@needs_cli
def test_cli_decodes_our_frames():
    for name, data in _corpus().items():
        enc = L.lz4_frame_compress(data)
        assert _cli(["lz4", "-d", "-c"], enc) == data, name


def test_self_roundtrip_and_block_layer():
    for name, data in _corpus().items():
        enc = L.lz4_frame_compress(data)
        assert L.lz4_decompress(enc) == data, name
        if data:
            blk = L.lz4_block_compress(data[:60_000])
            assert L.lz4_block_decompress(blk) == data[:60_000], name


def test_compression_ratio_sane():
    text = b"spark shuffles lz4 blocks " * 4000
    enc = L.lz4_frame_compress(text)
    assert len(enc) < len(text) // 10
    rnd = os.urandom(30_000)
    assert len(L.lz4_frame_compress(rnd)) <= len(rnd) + 64


def test_overlapping_match_semantics():
    # offset 1 run + offset 3 period through the block layer
    data = b"x" + b"x" * 300 + b"abc" * 200
    blk = L.lz4_block_compress(data)
    assert L.lz4_block_decompress(blk) == data


def test_skippable_and_multiframe():
    a, b = b"alpha " * 500, b"beta! " * 700
    skip = (
        (0x184D2A50).to_bytes(4, "little")
        + (5).to_bytes(4, "little")
        + b"skipm"
    )
    blob = (
        L.lz4_frame_compress(a) + skip + L.lz4_frame_compress(b)
    )
    assert L.lz4_decompress(blob) == a + b


def test_guards():
    with pytest.raises(ValueError, match="bad magic"):
        L.lz4_decompress(b"\x00\x01\x02\x03rest")
    with pytest.raises(ValueError, match="legacy"):
        L.lz4_decompress(struct.pack("<I", 0x184C2102) + b"x" * 8)
    enc = bytearray(L.lz4_frame_compress(b"payload data here" * 10))
    enc[-12] ^= 0xFF  # corrupt inside the last block's bytes
    with pytest.raises(ValueError, match="checksum|offset|exceeds"):
        L.lz4_decompress(bytes(enc))
    # header checksum
    enc2 = bytearray(L.lz4_frame_compress(b"x"))
    enc2[6] ^= 0xFF  # HC byte
    with pytest.raises(ValueError, match="header checksum"):
        L.lz4_decompress(bytes(enc2))
    with pytest.raises(ValueError, match="zero match offset"):
        L.lz4_block_decompress(bytes([0x10]) + b"a" + b"\x00\x00")


# ---------------------------------------------------------------------------
# sources/compressed.py — the magic-sniff front door
# ---------------------------------------------------------------------------


def test_detect_and_decompress_auto():
    import bz2 as _bz2
    import lzma as _lzma

    from cloud_optimized_data_pipelines_spark.operators.deflate_codec import (
        gzip_encode,
    )
    from cloud_optimized_data_pipelines_spark.operators.zstd_codec import (
        zstd_compress_stored,
    )
    from cloud_optimized_data_pipelines_spark.sources.compressed import (
        decompress_auto,
        detect_codec,
    )

    payload = b'{"id":1,"text":"hello"}\n' * 200
    blobs = {
        "gzip": gzip_encode(payload),
        "zstd": zstd_compress_stored(payload),
        "lz4": L.lz4_frame_compress(payload),
        "xz": _lzma.compress(payload),
        "bzip2": _bz2.compress(payload),
        "raw": payload,
    }
    for codec, blob in blobs.items():
        assert detect_codec(blob) == codec
        assert decompress_auto(blob) == payload


def test_decode_text_column_spark(spark):
    import bz2 as _bz2
    import lzma as _lzma

    from cloud_optimized_data_pipelines_spark.operators.deflate_codec import (
        gzip_encode,
    )
    from cloud_optimized_data_pipelines_spark.sources.compressed import (
        decode_text_column,
    )

    text = "line one\nline two\n"
    rows = [
        (0, bytearray(gzip_encode(text.encode()))),
        (1, bytearray(L.lz4_frame_compress(text.encode()))),
        (2, bytearray(_lzma.compress(text.encode()))),
        (3, bytearray(_bz2.compress(text.encode()))),
        (4, bytearray(text.encode())),
    ]
    df = spark.createDataFrame(rows, "doc bigint, blob binary")
    out = decode_text_column(df, "doc", "blob").orderBy("id").collect()
    assert [r.codec for r in out] == ["gzip", "lz4", "xz", "bzip2", "raw"]
    assert all(r.text == text for r in out)


def test_decode_text_column_flushes_bounded_batches(spark):
    # shards whose decoded size exceeds the 8 MiB flush budget must
    # still come back complete and correct (the BatchFlusher path:
    # several output record batches per task instead of one giant one)
    from cloud_optimized_data_pipelines_spark.operators.deflate_codec import (
        gzip_encode,
    )
    from cloud_optimized_data_pipelines_spark.sources.compressed import (
        decode_text_column,
    )

    from pyspark.sql import functions as F

    big = ("payload row %d\n" * 1000) % tuple(range(1000))
    big = big * 700  # ~10 MB decoded
    blob = bytearray(gzip_encode(big.encode()))
    df = spark.createDataFrame(
        [(i, blob) for i in range(4)], "doc bigint, blob binary"
    ).repartition(2)
    out = decode_text_column(df, "doc", "blob")
    got = out.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count_distinct(F.md5("text")).alias("distinct_md5"),
    ).collect()[0]
    assert got.n == 4
    assert got.chars == 4 * len(big)
    assert got.distinct_md5 == 1
