"""Pure-numpy COG encoder (operators/geotiff.py): structural validity,
tile round-trip, overview chain, geo tags, nodata, determinism, and the
cogify-stage integration producing real COG bytes."""

import hashlib

import numpy as np

from cloud_optimized_data_pipelines_spark.operators.geotiff import (
    OVR_TILE,
    TILE,
    encode_cog,
    read_tiff_meta,
)


def _ramp(h, w):
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    return y * np.float32(0.25) + x * np.float32(0.5)


def test_small_raster_single_tile_roundtrip():
    arr = _ramp(100, 130)
    buf = encode_cog(arr, nodata=-9999.0)
    ifds = read_tiff_meta(buf)
    assert len(ifds) == 1  # fits one 256-tile: no overviews
    top = ifds[0]
    assert (top["width"], top["height"]) == (130, 100)
    assert top["tile"] == TILE
    assert top["compression"] == 8  # DEFLATE (handler.py:144)
    assert top["sample_format"] == 3 and top["bits_per_sample"] == 32
    assert not top["is_overview"]
    np.testing.assert_array_equal(top["array"], arr)


def test_multi_tile_and_overview_chain():
    arr = _ramp(600, 700)  # 3x3 grid of 256-tiles at full res
    buf = encode_cog(arr, nodata=-1.0)
    ifds = read_tiff_meta(buf)
    top, *ovrs = ifds
    assert top["n_tiles"] == 9
    np.testing.assert_array_equal(top["array"], arr)
    # overviews: 350x300 (128-tiles), then 175x150 -> fits 256, stop
    assert [o["is_overview"] for o in ovrs] == [True, True]
    assert [(o["width"], o["height"]) for o in ovrs] == [(350, 300), (175, 150)]
    assert all(o["tile"] == OVR_TILE for o in ovrs)
    np.testing.assert_array_equal(ovrs[0]["array"], arr[::2, ::2])
    np.testing.assert_array_equal(ovrs[1]["array"], arr[::4, ::4])


def test_geo_tags_default_global_extent():
    arr = _ramp(180, 360)
    buf = encode_cog(arr)  # bbox default (-180,-90,180,90) — handler.py:101
    top = read_tiff_meta(buf)[0]
    assert top["pixel_scale"] == [1.0, 1.0, 0.0]
    assert top["tiepoint"] == [0.0, 0.0, 0.0, -180.0, 90.0, 0.0]
    keys = top["geokeys"]
    assert keys[:4] == [1, 1, 0, 3]
    assert keys[12:16] == [2048, 0, 1, 4326]  # GeographicTypeGeoKey = 4326


def test_affine_override_and_nodata_tag():
    arr = _ramp(40, 40)
    gt = (-180.0, 0.25, 0.0, 90.0, 0.0, -0.25)
    buf = encode_cog(arr, geotransform=gt, nodata=-9999.0)
    top = read_tiff_meta(buf)[0]
    assert top["pixel_scale"] == [0.25, 0.25, 0.0]
    assert top["tiepoint"][3:5] == [-180.0, 90.0]
    assert top["nodata"] == ["-9999.0"]


def test_deterministic_golden_bytes():
    """Same input -> same bytes, pinned: any encoder change that alters
    the emitted layout must update this hash consciously."""
    arr = _ramp(300, 300)
    arr[::7, ::11] = np.float32(-9999.0)
    buf = encode_cog(arr, nodata=-9999.0)
    assert buf[:4] == b"II\x2a\x00"
    digest = hashlib.md5(buf).hexdigest()
    assert hashlib.md5(encode_cog(arr, nodata=-9999.0)).hexdigest() == digest
    assert digest == "ad8081ee31096212c36bf824d0f35697"


def test_cogify_stage_emits_real_cogs(spark):
    """K1 integration: the mapInPandas stage now produces byte-valid
    tiled COGs (decode still a deterministic stub — no netCDF4 here)."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        _cogify_bytes,
    )

    blob = _cogify_bytes("s3://src/omi/OMI-Aura_2022m0101.he5", "O3", None)
    ifds = read_tiff_meta(blob)
    assert ifds[0]["compression"] == 8
    assert ifds[0]["tile"] == TILE
    assert ifds[0]["nodata"] == ["-9999.0"]
    # deterministic across calls (executor-independent)
    blob2 = _cogify_bytes("s3://src/omi/OMI-Aura_2022m0101.he5", "O3", None)
    assert blob == blob2


def test_roundtrip_property_random_rasters():
    """Property: any 2-D float raster round-trips bit-exactly through
    encode_cog/read_tiff_meta, any shape, with or without nodata."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        arr=arrays(
            dtype=np.float32,
            shape=st.tuples(
                st.integers(1, 300), st.integers(1, 300)
            ),
            elements=st.floats(
                -1e6, 1e6, allow_nan=False, width=32
            ),
        ),
        nodata=st.one_of(st.none(), st.just(-9999.0)),
    )
    def check(arr, nodata):
        buf = encode_cog(arr, nodata=nodata)
        top = read_tiff_meta(buf)[0]
        np.testing.assert_array_equal(top["array"], arr)
        assert (top["nodata"] is None) == (nodata is None)

    check()


def test_reader_handles_non_square_tiles():
    """TileWidth and TileLength are independent TIFF 6.0 tags; a valid
    file with 8x4 tiles (w x h) must reshape as (tile_length,
    tile_width).  Hand-built single-IFD TIFF: 8 wide, 8 tall, two
    stacked 8x4 tiles."""
    import struct
    import zlib

    arr = _ramp(8, 8)
    tiles = [arr[:4, :], arr[4:, :]]
    blobs = [zlib.compress(t.astype("<f4").tobytes()) for t in tiles]

    def entry(tag, typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack("<" + fmt * len(vals), *vals)
        raw = raw.ljust(4, b"\x00")
        return struct.pack("<HHI", tag, typ, len(vals)) + raw[:4]

    # layout: header(8) + IFD + tile data
    ntags = 11
    ifd_size = 2 + 12 * ntags + 4
    data0 = 8 + ifd_size
    offs = [data0, data0 + len(blobs[0])]
    tags = [
        entry(256, 4, [8]),               # ImageWidth
        entry(257, 4, [8]),               # ImageLength
        entry(258, 3, [32]),              # BitsPerSample
        entry(259, 3, [8]),               # Compression: deflate
        entry(262, 3, [1]),               # Photometric
        entry(277, 3, [1]),               # SamplesPerPixel
        entry(322, 3, [8]),               # TileWidth
        entry(323, 3, [4]),               # TileLength  != width
        entry(324, 4, offs)[:8] + struct.pack("<I", 0),  # placeholder
        entry(325, 4, [len(b) for b in blobs])[:8] + struct.pack("<I", 0),
        entry(339, 3, [3]),               # SampleFormat: float
    ]
    # multi-value LONG tags (2 values = 8 bytes) need an offset — put
    # them after the tile data
    arrays_off = data0 + sum(len(b) for b in blobs)
    tags[8] = struct.pack("<HHII", 324, 4, 2, arrays_off)
    tags[9] = struct.pack("<HHII", 325, 4, 2, arrays_off + 8)
    buf = b"II\x2a\x00" + struct.pack("<I", 8)
    buf += struct.pack("<H", ntags) + b"".join(tags) + struct.pack("<I", 0)
    assert len(buf) == data0
    buf += b"".join(blobs)
    buf += struct.pack("<II", *offs)
    buf += struct.pack("<II", *[len(b) for b in blobs])
    top = read_tiff_meta(buf)[0]
    assert top["tile"] == 8 and top["tile_length"] == 4
    np.testing.assert_array_equal(top["array"], arr)
