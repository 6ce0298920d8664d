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
