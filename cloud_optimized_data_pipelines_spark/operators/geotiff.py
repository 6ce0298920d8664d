"""Pure-numpy Cloud-Optimized GeoTIFF encoder (SURVEY K1/S6/C13).

The reference writes its COGs with rasterio's ``cog_translate``
(``lambdas/cogify/handler.py:133-159``): GTiff, float32, single band,
DEFLATE, tiled 256x256, overview blocksize 128
(``GDAL_TIFF_OVR_BLOCKSIZE=128``), EPSG:4326 unless a per-collection
affine override exists, nodata from the variable fill value.  GDAL is
not available in this container, so this module emits the same profile
from first principles: a classic little-endian TIFF with

- a full-resolution IFD: 256x256 deflate (zlib) tiles, float32
  samples (SampleFormat=IEEE), GeoTIFF georeferencing tags
  (ModelPixelScale + ModelTiepoint + GeoKeyDirectory for EPSG:4326)
  and the GDAL_NODATA ascii tag;
- COG-style 2x reduced overviews (NewSubfileType=ReducedImage) with
  128x128 tiles, built until the level fits in one tile;
- header-first IFD chain followed by tile data in IFD order — the
  cloud-optimized read pattern (metadata in the first bytes, then
  sequential tiles).

Everything is deterministic: same array + geotransform -> same bytes,
so tests pin golden md5s.  The encoder is self-contained numpy+zlib —
it runs inside the cogify ``mapInPandas`` stage on executors with no
native deps.  ``read_tiff_meta`` is a minimal structural parser used
by the tests (and any consumer that wants to verify outputs) to walk
the IFD chain and decode tiles back to arrays.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

TILE = 256
OVR_TILE = 128  # GDAL_TIFF_OVR_BLOCKSIZE=128 (cogify/handler.py:157)

# TIFF tag ids
_NEWSUBFILETYPE = 254
_IMAGEWIDTH = 256
_IMAGELENGTH = 257
_BITSPERSAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_SAMPLESPERPIXEL = 277
_PLANARCONFIG = 284
_TILEWIDTH = 322
_TILELENGTH = 323
_TILEOFFSETS = 324
_TILEBYTECOUNTS = 325
_SAMPLEFORMAT = 339
_MODELPIXELSCALE = 33550
_MODELTIEPOINT = 33922
_GEOKEYDIRECTORY = 34735
_GDAL_NODATA = 42113

_T_ASCII = 2
_T_SHORT = 3
_T_LONG = 4
_T_DOUBLE = 12

_TYPE_SIZE = {_T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}


@dataclass
class _Entry:
    tag: int
    typ: int
    values: list | bytes

    def count(self) -> int:
        if self.typ == _T_ASCII:
            return len(self.values)
        return len(self.values)

    def payload(self) -> bytes:
        if self.typ == _T_ASCII:
            return bytes(self.values)
        return struct.pack(
            "<" + _TYPE_FMT[self.typ] * len(self.values), *self.values
        )


@dataclass
class _Level:
    """One IFD: a resolution level with its tiles."""

    width: int
    height: int
    tile: int
    tiles: list[bytes]
    is_overview: bool
    entries: list[_Entry] = field(default_factory=list)


def _tile_grid(arr: np.ndarray, tile: int, fill: float) -> list[bytes]:
    """Split into full-size deflate tiles, row-major (TIFF tile order).
    Edge tiles are padded to tile x tile with the nodata fill, exactly
    like GDAL pads partial blocks."""
    h, w = arr.shape
    out = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = np.full((tile, tile), fill, dtype=arr.dtype)
            sub = arr[ty : ty + tile, tx : tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            out.append(zlib.compress(block.tobytes(), 6))
    return out


def _decimate(arr: np.ndarray) -> np.ndarray:
    """2x nearest-neighbour reduction (deterministic, GDAL 'nearest')."""
    return arr[::2, ::2]


def _geo_entries(
    geotransform: tuple[float, float, float, float, float, float],
    epsg: int,
    nodata: float | None,
) -> list[_Entry]:
    gx0, xres, _, gy0, _, yres = geotransform
    entries = [
        # north-up only (rotation terms unsupported, like cog_translate's
        # default path); pixel scale is (xres, |yres|, 0)
        _Entry(_MODELPIXELSCALE, _T_DOUBLE, [xres, abs(yres), 0.0]),
        _Entry(_MODELTIEPOINT, _T_DOUBLE, [0.0, 0.0, 0.0, gx0, gy0, 0.0]),
        _Entry(
            _GEOKEYDIRECTORY,
            _T_SHORT,
            # version 1.1.0, 3 keys: ModelType=Geographic(2),
            # RasterType=PixelIsArea(1), GeographicType=epsg
            [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, epsg],
        ),
    ]
    if nodata is not None:
        txt = (f"{nodata}").encode("ascii") + b"\x00"
        entries.append(_Entry(_GDAL_NODATA, _T_ASCII, txt))
    return entries


def encode_cog(
    array: np.ndarray,
    geotransform: tuple[float, float, float, float, float, float] | None = None,
    bbox: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    epsg: int = 4326,
    nodata: float | None = None,
) -> bytes:
    """Encode a 2-D array as a COG matching the reference profile.

    ``geotransform`` is GDAL order (x0, xres, 0, y0, 0, yres) — the
    reference's affine override path (``Affine.from_gdal(*eval(...))``,
    handler.py:130); when None it is derived from ``bbox`` the way
    ``to_cog`` derives the default global transform (handler.py:96-101).
    """
    if array.ndim != 2:
        raise ValueError(f"expected 2-D raster, got shape {array.shape}")
    data = np.ascontiguousarray(array, dtype="<f4")  # float32 (handler.py:154)
    h, w = data.shape
    if geotransform is None:
        xmin, ymin, xmax, ymax = bbox
        geotransform = (
            xmin,
            (xmax - xmin) / float(w),
            0.0,
            ymax,
            0.0,
            -(ymax - ymin) / float(h),
        )
    fill = float(nodata) if nodata is not None else 0.0

    levels = [
        _Level(w, h, TILE, _tile_grid(data, TILE, fill), is_overview=False)
    ]
    ovr = data
    # cog_translate default: overviews until the level fits one block
    while max(ovr.shape) > TILE and min(ovr.shape) >= 2:
        ovr = _decimate(ovr)
        levels.append(
            _Level(
                ovr.shape[1],
                ovr.shape[0],
                OVR_TILE,
                _tile_grid(ovr, OVR_TILE, fill),
                is_overview=True,
            )
        )

    for lv in levels:
        lv.entries = [
            _Entry(_NEWSUBFILETYPE, _T_LONG, [1 if lv.is_overview else 0]),
            _Entry(_IMAGEWIDTH, _T_LONG, [lv.width]),
            _Entry(_IMAGELENGTH, _T_LONG, [lv.height]),
            _Entry(_BITSPERSAMPLE, _T_SHORT, [32]),
            _Entry(_COMPRESSION, _T_SHORT, [8]),  # DEFLATE
            _Entry(_PHOTOMETRIC, _T_SHORT, [1]),  # BlackIsZero
            _Entry(_SAMPLESPERPIXEL, _T_SHORT, [1]),
            _Entry(_PLANARCONFIG, _T_SHORT, [1]),
            _Entry(_TILEWIDTH, _T_SHORT, [lv.tile]),
            _Entry(_TILELENGTH, _T_SHORT, [lv.tile]),
            _Entry(_TILEOFFSETS, _T_LONG, [0] * len(lv.tiles)),  # patched
            _Entry(_TILEBYTECOUNTS, _T_LONG, [len(t) for t in lv.tiles]),
            _Entry(_SAMPLEFORMAT, _T_SHORT, [3]),  # IEEE float
        ]
        if not lv.is_overview:
            lv.entries.extend(_geo_entries(geotransform, epsg, nodata))
        lv.entries.sort(key=lambda e: e.tag)

    # ---- layout pass: header | IFD chain (+ out-of-line values) | tiles
    pos = 8  # after header
    ifd_offsets = []
    for lv in levels:
        ifd_offsets.append(pos)
        pos += 2 + 12 * len(lv.entries) + 4
        for e in lv.entries:
            nbytes = e.count() * _TYPE_SIZE[e.typ]
            if nbytes > 4:
                pos += nbytes + (nbytes & 1)
    tile_offsets: list[list[int]] = []
    for lv in levels:
        offs = []
        for t in lv.tiles:
            offs.append(pos)
            pos += len(t) + (len(t) & 1)
        tile_offsets.append(offs)

    # ---- emit
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offsets[0])
    for i, lv in enumerate(levels):
        for e in lv.entries:
            if e.tag == _TILEOFFSETS:
                e.values = tile_offsets[i]
        assert len(out) == ifd_offsets[i]
        # out-of-line values land directly after this IFD block
        data_pos = ifd_offsets[i] + 2 + 12 * len(lv.entries) + 4
        ifd = struct.pack("<H", len(lv.entries))
        tail = bytearray()
        for e in lv.entries:
            payload = e.payload()
            if len(payload) <= 4:
                ifd += struct.pack(
                    "<HHI4s", e.tag, e.typ, e.count(), payload.ljust(4, b"\x00")
                )
            else:
                ifd += struct.pack(
                    "<HHII", e.tag, e.typ, e.count(), data_pos + len(tail)
                )
                tail += payload
                if len(payload) & 1:
                    tail += b"\x00"
        next_ifd = ifd_offsets[i + 1] if i + 1 < len(levels) else 0
        ifd += struct.pack("<I", next_ifd)
        out += ifd + tail
    for offs, lv in zip(tile_offsets, levels):
        for off, t in zip(offs, lv.tiles):
            assert len(out) == off
            out += t
            if len(t) & 1:
                out += b"\x00"
    return bytes(out)


def read_tiff_meta(buf: bytes) -> list[dict]:
    """Minimal structural TIFF reader: returns one dict per IFD with the
    raw tag values plus decoded tiles re-assembled into ``array``."""
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    out = []
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        tags: dict[int, list] = {}
        for i in range(n):
            tag, typ, cnt, raw = struct.unpack_from(
                "<HHI4s", buf, ifd_off + 2 + 12 * i
            )
            size = _TYPE_SIZE[typ] * cnt
            data = raw[:size] if size <= 4 else None
            if data is None:
                (off,) = struct.unpack_from("<I", raw)
                data = buf[off : off + size]
            if typ == _T_ASCII:
                tags[tag] = [data.rstrip(b"\x00").decode("ascii")]
            else:
                tags[tag] = list(
                    struct.unpack("<" + _TYPE_FMT[typ] * cnt, data)
                )
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)
        w, h = tags[_IMAGEWIDTH][0], tags[_IMAGELENGTH][0]
        # TileWidth and TileLength are independent tags (TIFF 6.0) —
        # this encoder emits square tiles, but decode any valid file
        tile = tags[_TILEWIDTH][0]
        tile_len = tags[_TILELENGTH][0]
        ncols = -(-w // tile)
        arr = np.zeros((h, w), dtype="<f4")
        for idx, (off, cnt) in enumerate(
            zip(tags[_TILEOFFSETS], tags[_TILEBYTECOUNTS])
        ):
            block = np.frombuffer(
                zlib.decompress(buf[off : off + cnt]), dtype="<f4"
            ).reshape(tile_len, tile)
            ty, tx = divmod(idx, ncols)
            y0, x0 = ty * tile_len, tx * tile
            arr[y0 : y0 + tile_len, x0 : x0 + tile] = block[
                : min(tile_len, h - y0), : min(tile, w - x0)
            ]
        out.append(
            {
                "width": w,
                "height": h,
                "tile": tile,
                "tile_length": tile_len,
                "is_overview": bool(tags.get(_NEWSUBFILETYPE, [0])[0] & 1),
                "compression": tags[_COMPRESSION][0],
                "sample_format": tags[_SAMPLEFORMAT][0],
                "bits_per_sample": tags[_BITSPERSAMPLE][0],
                "n_tiles": len(tags[_TILEOFFSETS]),
                "pixel_scale": tags.get(_MODELPIXELSCALE),
                "tiepoint": tags.get(_MODELTIEPOINT),
                "geokeys": tags.get(_GEOKEYDIRECTORY),
                "nodata": tags.get(_GDAL_NODATA),
                "array": arr,
            }
        )
    return out


def cog_stac_metadata(buf: bytes) -> dict:
    """Probe a COG the way ``rio_stac.stac.create_stac_item(...,
    with_proj=True, with_raster=True)`` does (the reference's STAC
    metadata source, ``lambdas/build-stac/utils/stac.py:32-48``):
    georeferencing from the GeoTIFF tags and band statistics from the
    decoded full-resolution raster with nodata cells excluded.

    Returns NUMERIC primitives only — dataset origin/scale, EPSG code,
    shape, nodata, and exact integer-safe stat accumulators (sum,
    sum-of-squares, valid count) — so the bbox / proj:transform /
    raster:bands assembly can happen JVM-side as column expressions
    and a SQL oracle can replay every derived value arithmetically.
    """
    meta = read_tiff_meta(buf)[0]
    scale = meta["pixel_scale"]
    tie = meta["tiepoint"]
    if scale is None or tie is None:
        raise ValueError("COG carries no ModelPixelScale/ModelTiepoint")
    sx, sy = float(scale[0]), float(scale[1])
    # ModelTiepoint (i, j, k, x, y, z): raster point -> model point
    x0 = float(tie[3]) - float(tie[0]) * sx
    y0 = float(tie[4]) + float(tie[1]) * sy
    epsg = 0
    keys = meta["geokeys"] or []
    for k in range(4, len(keys), 4):
        if keys[k] == 2048:  # GeographicTypeGeoKey
            epsg = int(keys[k + 3])
    nodata = float(meta["nodata"][0]) if meta["nodata"] else None
    arr = meta["array"].astype(np.float64)
    valid = arr[arr != nodata] if nodata is not None else arr.reshape(-1)
    n_valid = int(valid.size)
    return {
        "width": int(meta["width"]),
        "height": int(meta["height"]),
        "epsg": epsg,
        "x0": x0,
        "y0": y0,
        "sx": sx,
        "sy": sy,
        "nodata": nodata,
        "data_type": {1: "uint", 2: "int", 3: "float32"}.get(
            meta["sample_format"], "unknown"
        ),
        "vmin": float(valid.min()) if n_valid else None,
        "vmax": float(valid.max()) if n_valid else None,
        "vsum": float(valid.sum()),
        "vsumsq": float((valid * valid).sum()),
        "valid_count": n_valid,
        "n_cells": int(arr.size),
    }
