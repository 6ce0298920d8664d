"""Pure-numpy PNG codec: round-trip, filter coverage, structural
invariants, and the real-decode multimodal path."""

import hashlib
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cloud_optimized_data_pipelines_spark.operators.png_codec import (
    _SIGNATURE,
    decode_png,
    encode_png,
)


def _rand(shape, dtype, seed):
    rng = np.random.RandomState(seed)
    hi = 65536 if dtype == np.uint16 else 256
    return rng.randint(0, hi, size=shape).astype(dtype)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("cycle", [True, False])
def test_round_trip_all_color_types_and_depths(ch, dtype, cycle):
    a = _rand((23, 17, ch), dtype, seed=ch * 100 + (dtype == np.uint16))
    d = decode_png(encode_png(a, filter_cycle=cycle))
    assert d.shape == a.shape and d.dtype == a.dtype
    assert np.array_equal(d, a)


def test_filter_cycle_exercises_all_five_filters():
    # 10 rows -> filters 0,1,2,3,4,0,1,2,3,4 in the raw stream
    a = _rand((10, 8, 3), np.uint8, seed=1)
    png = encode_png(a, filter_cycle=True)
    # find IDAT, inflate, read the per-row filter bytes
    pos = 8
    idat = b""
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        ctype = png[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += png[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 8 * 3 + 1
    filters = {raw[y * stride] for y in range(10)}
    assert filters == {0, 1, 2, 3, 4}


def test_single_pixel_and_single_row_edges():
    for shape in [(1, 1, 1), (1, 9, 3), (9, 1, 4), (2, 2, 2)]:
        a = _rand(shape, np.uint8, seed=sum(shape))
        assert np.array_equal(decode_png(encode_png(a)), a)


def test_two_dim_input_becomes_grayscale():
    g = _rand((12, 9), np.uint8, seed=3)
    d = decode_png(encode_png(g))
    assert d.shape == (12, 9, 1)
    assert np.array_equal(d[:, :, 0], g)


def test_signature_and_chunk_layout():
    png = encode_png(_rand((4, 4, 3), np.uint8, seed=4))
    assert png[:8] == _SIGNATURE
    assert png[12:16] == b"IHDR"
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", png[16:29])
    assert (w, h, depth, ctype, comp, filt, inter) == (4, 4, 8, 2, 0, 0, 0)
    assert png[-12:-8] == struct.pack(">I", 0)  # IEND length
    assert png[-8:-4] == b"IEND"


def test_crc_tamper_detected():
    png = bytearray(encode_png(_rand((6, 6, 1), np.uint8, seed=5)))
    png[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_truncated_stream_detected():
    png = encode_png(_rand((6, 6, 1), np.uint8, seed=6))
    with pytest.raises(ValueError):
        decode_png(png[: len(png) // 2])


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG" + b"\x00" * 40)


def test_interlace_flag_mismatch_detected():
    """A sequential byte stream whose IHDR lies about Adam7 must fail
    the per-pass byte accounting, not silently misdecode."""
    png = bytearray(encode_png(_rand((4, 4, 3), np.uint8, seed=7)))
    png[28] = 1  # interlace flag inside IHDR
    # fix IHDR CRC
    body = bytes(png[16:29])
    png[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        decode_png(bytes(png))


@pytest.mark.parametrize("ch,depth", [(1, 8), (3, 8), (4, 8), (2, 16), (3, 16)])
@pytest.mark.parametrize("dims", [(13, 17), (5, 3), (8, 8), (1, 1), (2, 9)])
def test_adam7_round_trip(ch, depth, dims):
    """Adam7 interlace round-trips bit-exactly for every color type /
    depth, including images smaller than one 8x8 interlace tile (some
    passes empty) and single-pixel edges."""
    rng = np.random.RandomState(sum(dims) + ch + depth)
    arr = rng.randint(0, 2 ** depth, dims + (ch,)).astype(
        np.uint16 if depth == 16 else np.uint8
    )
    png = encode_png(arr, interlace=True)
    # IHDR interlace byte actually set
    assert png[28] == 1
    assert np.array_equal(decode_png(png), arr)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grayscale_round_trip(depth):
    rng = np.random.RandomState(depth)
    for dims in [(9, 13), (3, 8), (7, 1)]:
        arr = rng.randint(0, 2 ** depth, dims).astype(np.uint8)[:, :, None]
        for il in (False, True):
            png = encode_png(arr, bit_depth=depth, interlace=il)
            assert np.array_equal(decode_png(png), arr), (depth, dims, il)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_round_trip_expands_to_rgb(depth):
    from cloud_optimized_data_pipelines_spark.operators.png_codec import (
        encode_png_palette,
    )

    rng = np.random.RandomState(depth + 40)
    pal = rng.randint(0, 256, (min(256, 2 ** depth), 3)).astype(np.uint8)
    idx = rng.randint(0, len(pal), (11, 7))
    for il in (False, True):
        png = encode_png_palette(idx, pal, bit_depth=depth, interlace=il)
        dec = decode_png(png)
        assert dec.shape == (11, 7, 3) and dec.dtype == np.uint8
        assert np.array_equal(dec, pal[idx])


def test_palette_errors():
    from cloud_optimized_data_pipelines_spark.operators.png_codec import (
        encode_png_palette,
    )

    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(ValueError, match="depth"):
        encode_png_palette(np.zeros((2, 2), int), pal, bit_depth=16)
    with pytest.raises(ValueError, match="range"):
        encode_png_palette(np.full((2, 2), 9), pal, bit_depth=8)
    # palette image with PLTE chunk stripped must fail by name
    png = bytearray(encode_png_palette(np.zeros((2, 2), int), pal))
    start = bytes(png).find(b"PLTE") - 4
    (length,) = struct.unpack(">I", png[start : start + 4])
    del png[start : start + 12 + length]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(png))


def test_16bit_samples_are_big_endian_per_spec():
    a = np.array([[[0x0102]]], dtype=np.uint16)
    png = encode_png(a, filter_cycle=False)
    # locate IDAT, inflate: one row = filter byte + 2 sample bytes
    pos = 8
    while png[pos + 4 : pos + 8] != b"IDAT":
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        pos += 12 + length
    (length,) = struct.unpack(">I", png[pos : pos + 4])
    raw = zlib.decompress(png[pos + 8 : pos + 8 + length])
    assert raw == b"\x00\x01\x02"


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    depth16=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_fuzz(h, w, ch, depth16, seed):
    a = _rand((h, w, ch), np.uint16 if depth16 else np.uint8, seed)
    assert np.array_equal(decode_png(encode_png(a)), a)


def test_png_variant_is_deterministic_and_verified():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        _png_variant,
    )

    a = _png_variant(3)
    b = _png_variant(3)
    assert a == b
    assert len(a["png_md5"]) == 32
    assert a["px_sum"] > 0


def test_extract_image_features_real_decode(spark):
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        extract_image_features,
    )

    imgs = {
        "a": _rand((5, 7, 3), np.uint8, seed=11),
        "b": _rand((9, 4, 1), np.uint16, seed=12),
    }
    rows = [(k, bytearray(encode_png(v))) for k, v in imgs.items()]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r.asset_id: r for r in extract_image_features(df).collect()}
    for k, arr in imgs.items():
        r = got[k]
        assert (r.height, r.width, r.channels) == arr.shape
        assert r.bit_depth == (16 if arr.dtype == np.uint16 else 8)
        assert r.px_sum == int(arr.sum(dtype=np.int64))
        assert r.png_md5 == hashlib.md5(encode_png(arr)).hexdigest()


def test_real_decode_dispatch():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        real_decode,
    )

    a = _rand((3, 3, 3), np.uint8, seed=13)
    assert np.array_equal(real_decode(encode_png(a), "image/png"), a)
    # audio/wav is REAL since the wav codec landed (see test_wav_codec);
    # video remains the stubbed modality
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00", "video/mp4")


def test_downscale_box_exact_integer_means():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        downscale_box,
    )

    a = np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1)
    d = downscale_box(a, 2, 2)
    # blocks: [[0,1,4,5],[2,3,6,7],...] -> floor(mean)
    assert d.shape == (2, 2, 1)
    assert d[0, 0, 0] == (0 + 1 + 4 + 5) // 4
    assert d[1, 1, 0] == (10 + 11 + 14 + 15) // 4
    with pytest.raises(ValueError, match="divisible"):
        downscale_box(np.zeros((5, 4, 1), np.uint8), 2, 2)


def test_resize_images_end_to_end(spark):
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        downscale_box,
        resize_images,
    )

    a = _rand((8, 12, 3), np.uint8, seed=21)
    df = spark.createDataFrame(
        [("x", bytearray(encode_png(a)))], "asset_id string, payload binary"
    )
    row = resize_images(df, 4, 4).collect()[0]
    assert (row.height, row.width) == (2, 3)
    got = decode_png(bytes(row.payload))
    assert np.array_equal(got, downscale_box(a, 4, 4))


def test_decimate_frames_and_probe_determinism():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        _png_resize_variant,
        _wav_downsample_variant,
        decimate_frames,
    )

    a = np.arange(20, dtype=np.int16).reshape(10, 2)
    d = decimate_frames(a, 3)
    assert d.tolist() == [[0, 1], [6, 7], [12, 13], [18, 19]]
    assert _png_resize_variant(5) == _png_resize_variant(5)
    assert _wav_downsample_variant(5) == _wav_downsample_variant(5)


# ---------------------------------------------------------------------------
# hypothesis fuzz: round-6 paths (palette, Adam7, sub-byte) round-trip
# for arbitrary dims/content
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    depth=st.sampled_from([1, 2, 4, 8]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_palette_roundtrip(h, w, depth, interlace, seed):
    from cloud_optimized_data_pipelines_spark.operators.png_codec import (
        encode_png_palette,
    )

    rng = np.random.RandomState(seed)
    npal = min(256, 2 ** depth)
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.randint(0, npal, (h, w))
    png = encode_png_palette(idx, pal, bit_depth=depth, interlace=interlace)
    assert np.array_equal(decode_png(png), pal[idx])


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ch=st.sampled_from([1, 2, 3, 4]),
    depth16=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_adam7_roundtrip(h, w, ch, depth16, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 65536 if depth16 else 256, (h, w, ch)).astype(
        np.uint16 if depth16 else np.uint8
    )
    assert np.array_equal(decode_png(encode_png(arr, interlace=True)), arr)


def test_palette_trns_alpha_expansion():
    """tRNS: palette images with a transparency vector decode to RGBA;
    entries beyond the vector are opaque per spec."""
    from cloud_optimized_data_pipelines_spark.operators.png_codec import (
        encode_png_palette,
    )

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    trans = np.array([0, 128], np.uint8)  # entries 2,3 default opaque
    idx = np.array([[0, 1], [2, 3]])
    for il in (False, True):
        dec = decode_png(
            encode_png_palette(idx, pal, bit_depth=2, interlace=il,
                               trans=trans)
        )
        assert dec.shape == (2, 2, 4)
        assert list(dec[0, 0]) == [255, 0, 0, 0]
        assert list(dec[0, 1]) == [0, 255, 0, 128]
        assert list(dec[1, 0]) == [0, 0, 255, 255]
        assert list(dec[1, 1]) == [9, 9, 9, 255]
    with pytest.raises(ValueError, match="tRNS"):
        encode_png_palette(idx, pal, trans=np.zeros(9, np.uint8))
