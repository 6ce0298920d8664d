"""Pure-numpy classic netCDF reader/writer (sources/netcdf_classic.py)
and the real-decode cogify path it unlocks."""

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.sources.netcdf_classic import (
    read_header,
    read_variable,
    write_classic,
)


def _sample_file():
    var = np.arange(20, dtype=np.float32).reshape(4, 5) * np.float32(1.5)
    lat = np.array([40.0, 30.0, 20.0, 10.0])
    lon = np.array([-100.0, -95.0, -90.0, -85.0, -80.0])
    buf = write_classic(
        {
            "no2": (var, {"_FillValue": np.float32(-9999.0), "units": "ppb"}),
            "lat": (lat, {}),
            "lon": (lon, {}),
        },
        dims=[("lat", 4), ("lon", 5)],
        gatts={"title": "synthetic granule"},
    )
    return buf, var, lat, lon


def test_roundtrip_header_and_values():
    buf, var, lat, lon = _sample_file()
    assert buf[:4] == b"CDF\x01"
    hdr = read_header(buf)
    assert hdr.dims == [("lat", 4), ("lon", 5)]
    assert hdr.gatts["title"] == "synthetic granule"
    assert hdr.variables["no2"].attrs["units"] == "ppb"
    arr, fill = read_variable(buf, "no2")
    assert arr.dtype == np.float32 and fill == np.float32(-9999.0)
    np.testing.assert_array_equal(arr, var)
    la, f = read_variable(buf, "lat")
    assert f is None
    np.testing.assert_array_equal(la, lat)


def test_roundtrip_two_record_variables_interleaved():
    """Records of ALL record variables are interleaved (spec): the
    stride is sum(vsize) over record vars, not one variable's vsize.
    time (1 f8/rec) + no2 (6 f4/rec) over 3 records exercises it."""
    time = np.array([0.0, 1.0, 2.0])
    no2 = np.arange(18, dtype=np.float32).reshape(3, 2, 3)
    buf = write_classic(
        {"time": (time, {}), "no2": (no2, {"units": "ppb"})},
        dims=[("time", 0), ("y", 2), ("x", 3)],
        var_dims={"time": ["time"], "no2": ["time", "y", "x"]},
    )
    hdr = read_header(buf)
    assert hdr.numrecs == 3
    t, _ = read_variable(buf, "time")
    np.testing.assert_array_equal(t, time)
    v, _ = read_variable(buf, "no2")
    np.testing.assert_array_equal(v, no2)


def test_roundtrip_single_record_variable_unpadded():
    """With exactly one record variable the record slabs are packed
    without 4-byte padding (spec special case): int16 x 3 per record
    gives a 6-byte slab whose header vsize is 8."""
    data = np.arange(12, dtype=np.int16).reshape(4, 3)
    buf = write_classic(
        {"counts": (data, {})},
        dims=[("time", 0), ("x", 3)],
        var_dims={"counts": ["time", "x"]},
    )
    hdr = read_header(buf)
    assert hdr.variables["counts"].vsize == 8  # padded in header
    v, _ = read_variable(buf, "counts")
    np.testing.assert_array_equal(v, data)


def test_streaming_numrecs_sentinel_derived_from_file_size():
    time = np.array([0.0, 1.0, 2.0, 3.0])
    no2 = np.arange(8, dtype=np.float32).reshape(4, 2)
    buf = bytearray(
        write_classic(
            {"time": (time, {}), "no2": (no2, {})},
            dims=[("time", 0), ("x", 2)],
            var_dims={"time": ["time"], "no2": ["time", "x"]},
        )
    )
    buf[4:8] = b"\xff\xff\xff\xff"  # numrecs = STREAMING
    v, _ = read_variable(bytes(buf), "no2")
    np.testing.assert_array_equal(v, no2)
    t, _ = read_variable(bytes(buf), "time")
    np.testing.assert_array_equal(t, time)


def test_square_grid_dims_bind_by_name():
    """Two dims of equal size (square grid) are ambiguous under
    first-fit: rejected without var_dims, exact with var_dims."""
    grid = np.arange(16, dtype=np.float32).reshape(4, 4)
    with pytest.raises(ValueError, match="ambiguous"):
        write_classic(
            {"z": (grid, {})}, dims=[("lat", 4), ("lon", 4)]
        )
    buf = write_classic(
        {"z": (grid, {})},
        dims=[("lat", 4), ("lon", 4)],
        var_dims={"z": ["lat", "lon"]},
    )
    hdr = read_header(buf)
    assert [hdr.dims[d][0] for d in hdr.variables["z"].dimids] == ["lat", "lon"]
    v, _ = read_variable(buf, "z")
    np.testing.assert_array_equal(v, grid)


def test_reader_rejects_non_cdf_and_unknown_variable():
    buf, *_ = _sample_file()
    with pytest.raises(ValueError):
        read_header(b"NOTCDF__" + buf)
    with pytest.raises(KeyError):
        read_variable(buf, "missing_var")


def test_cogify_real_decode_from_classic_netcdf(tmp_path):
    """End-to-end without any stub: classic-netCDF bytes on disk ->
    variable + fill + coordinate bbox decoded for real -> byte-valid
    COG whose raster equals the source variable."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        _cogify_bytes,
    )
    from cloud_optimized_data_pipelines_spark.operators.geotiff import (
        read_tiff_meta,
    )

    buf, var, lat, lon = _sample_file()
    nc = tmp_path / "granule.nc"
    nc.write_bytes(buf)
    blob = _cogify_bytes(
        str(nc), "no2", None, x_variable="lon", y_variable="lat"
    )
    top = read_tiff_meta(blob)[0]
    np.testing.assert_array_equal(top["array"], var.astype(np.float32))
    assert top["nodata"] == ["-9999.0"]
    # bbox from the coordinate variables: x in [-100,-80], y in [10,40]
    assert top["tiepoint"][3:5] == [-100.0, 40.0]
    assert top["pixel_scale"][0] == pytest.approx(((-80.0) - (-100.0)) / 5)
    assert top["pixel_scale"][1] == pytest.approx((40.0 - 10.0) / 4)


def test_cogify_stage_runs_real_files(spark, tmp_path):
    """The mapInPandas stage decodes real local classic-netCDF granules
    (no stub involved) and rewrites output URLs without error."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        cogify_stage,
    )

    buf, *_ = _sample_file()
    paths = []
    for i in range(3):
        p = tmp_path / f"granule_{i}.nc"
        p.write_bytes(buf)
        paths.append(str(p))
    events = spark.createDataFrame(
        [("no2-monthly", p, True) for p in paths],
        "collection string, s3_filename string, cogify boolean",
    )
    config = spark.createDataFrame(
        [("no2-monthly", "no2", None, "lon", "lat", None, None)],
        "collection string, variable_name string, group string, "
        "x_variable string, y_variable string, src_crs string, "
        "affine_transformation string",
    )
    rows = cogify_stage(events, config).collect()
    assert len(rows) == 3
    assert all(r.cogify_error is None for r in rows)
    assert all(r.s3_filename.endswith(".tif") for r in rows)


def test_cdf5_roundtrip_64bit_types_and_records():
    """CDF-5 (magic CDF\\x05): 64-bit NON_NEGs everywhere and the
    unsigned / 64-bit integer types, with interleaved record vars."""
    time = np.array([10, 20, 30], dtype=np.int64)
    counts = np.arange(12, dtype=np.uint64).reshape(3, 4) * np.uint64(10**15)
    flags = np.array([1, 2, 250], dtype=np.uint8)
    buf = write_classic(
        {
            "time": (time, {}),
            "counts": (counts, {"_FillValue": np.uint64(0)}),
            "flags": (flags, {}),
        },
        dims=[("time", 0), ("x", 4), ("f", 3)],
        var_dims={"time": ["time"], "counts": ["time", "x"], "flags": ["f"]},
        version=5,
    )
    assert buf[:4] == b"CDF\x05"
    hdr = read_header(buf)
    assert hdr.version == 5 and hdr.numrecs == 3
    t, _ = read_variable(buf, "time")
    np.testing.assert_array_equal(t, time)
    assert t.dtype == np.int64
    c, fill = read_variable(buf, "counts")
    np.testing.assert_array_equal(c, counts)
    assert c.dtype == np.uint64 and fill == np.uint64(0)
    f, _ = read_variable(buf, "flags")
    np.testing.assert_array_equal(f, flags)


def test_cdf5_streaming_sentinel():
    data = np.arange(8, dtype=np.float64).reshape(4, 2)
    buf = bytearray(
        write_classic(
            {"v": (data, {})},
            dims=[("t", 0), ("x", 2)],
            var_dims={"v": ["t", "x"]},
            version=5,
        )
    )
    buf[4:12] = b"\xff" * 8  # 64-bit STREAMING numrecs
    v, _ = read_variable(bytes(buf), "v")
    np.testing.assert_array_equal(v, data)


def test_cdf5_rejects_unsigned_types_in_cdf1():
    with pytest.raises(KeyError):
        write_classic({"u": (np.array([1], dtype=np.uint32), {})})


def test_cf_packed_variable_unpacks_through_cogify(tmp_path):
    """CF scale_factor/add_offset packing (what netCDF4-python's auto
    mask-and-scale applies in the reference's Dataset reads): int16
    packed values unpack to scale*v + offset for valid cells while fill
    cells keep the RAW fill value as nodata."""
    from cloud_optimized_data_pipelines_spark.operators.cogify import (
        _cogify_bytes,
    )
    from cloud_optimized_data_pipelines_spark.operators.geotiff import (
        read_tiff_meta,
    )

    packed = np.array([[100, 200], [-32768, 400]], dtype=np.int16)
    buf = write_classic(
        {
            "t2m": (
                packed,
                {
                    "_FillValue": np.int16(-32768),
                    "scale_factor": np.float64(0.01),
                    "add_offset": np.float64(273.15),
                },
            )
        },
        dims=[("y", 2), ("x", 2)],
        var_dims={"t2m": ["y", "x"]},
    )
    p = tmp_path / "packed.nc"
    p.write_bytes(buf)
    blob = _cogify_bytes(str(p), "t2m", None)
    top = read_tiff_meta(blob)[0]
    got = top["array"]
    assert got[0, 0] == pytest.approx(274.15)  # 100*0.01 + 273.15
    assert got[0, 1] == pytest.approx(275.15)
    assert got[1, 1] == pytest.approx(277.15)
    assert got[1, 0] == np.float32(-32768.0)  # raw fill preserved
    assert top["nodata"] == ["-32768.0"]
