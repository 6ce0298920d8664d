"""Pure-numpy reader/writer for CLASSIC netCDF (CDF-1 / CDF-2 / CDF-5).

The reference's cogify stage reads one 2-D variable (+ optional x/y
coordinate vectors and a fill value) out of a netCDF file
(``lambdas/cogify/handler.py:81-103``).  netCDF4/HDF5 is not available
in this container, but the *classic* netCDF format (magic ``CDF\\x01``
/ ``CDF\\x02``, plus the PnetCDF 64-bit-data variant ``CDF\\x05``)
is a small, fully public binary layout (the NetCDF Classic Format
Specification and the NetCDF 64-bit Data Format Specification), so
this module implements it directly:

- :func:`read_header` parses dims / global attrs / variable metadata;
- :func:`read_variable` materializes a named variable as a numpy array
  (big-endian on disk, row-major; record variables stitched across
  records), with its ``_FillValue`` attribute when present;
- :func:`write_classic` emits a minimal standards-conforming CDF-1
  (or, with ``version=5``, CDF-5) file so tests can round-trip real
  bytes without any external library.

CDF-5 per the spec: every NON_NEG field (counts, name lengths, dim
sizes, dimids, vsize, numrecs) widens to 64 bits, offsets are 64-bit,
and the unsigned / 64-bit integer types (NC_UBYTE..NC_UINT64) become
available.

HDF5-backed netCDF-4 files still require the real libraries and stay
behind the import-try in ``operators/cogify.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC1 = b"CDF\x01"
_MAGIC2 = b"CDF\x02"
_MAGIC5 = b"CDF\x05"

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype (big-endian), size)
_TYPES = {
    1: ("i1", 1),  # NC_BYTE
    2: ("S1", 1),  # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
    # CDF-5 only:
    7: ("u1", 1),  # NC_UBYTE
    8: (">u2", 2),  # NC_USHORT
    9: (">u4", 4),  # NC_UINT
    10: (">i8", 8),  # NC_INT64
    11: (">u8", 8),  # NC_UINT64
}
_INV_TYPES = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}
_INV_TYPES_V5 = {
    **_INV_TYPES,
    "uint8": 7,
    "uint16": 8,
    "uint32": 9,
    "int64": 10,
    "uint64": 11,
}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


@dataclass
class NcVar:
    name: str
    dimids: list[int]
    nc_type: int
    vsize: int
    begin: int
    attrs: dict = field(default_factory=dict)


@dataclass
class NcHeader:
    version: int
    numrecs: int
    dims: list[tuple[str, int]]
    gatts: dict
    variables: dict[str, NcVar]

    def shape(self, var: NcVar) -> tuple[int, ...]:
        return tuple(self.dims[d][1] for d in var.dimids)


class _Reader:
    def __init__(self, buf: bytes, version: int = 1):
        self.buf = buf
        self.pos = 0
        self.version = version

    def nn(self) -> int:
        """NON_NEG per spec: 32-bit in CDF-1/2, 64-bit in CDF-5."""
        return self.u64() if self.version == 5 else self.u32()

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.nn()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n + _pad4(n)
        return s

    def values(self, nc_type: int, nelems: int):
        dt, sz = _TYPES[nc_type]
        nbytes = sz * nelems
        raw = self.buf[self.pos : self.pos + nbytes]
        self.pos += nbytes + _pad4(nbytes)
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=dt).tolist()

    def att_list(self) -> dict:
        tag = self.u32()
        count = self.nn()
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        out = {}
        for _ in range(count):
            nm = self.name()
            t = self.u32()
            n = self.nn()
            vals = self.values(t, n)
            out[nm] = vals if isinstance(vals, str) or len(vals) != 1 else vals[0]
        return out


def read_header(buf: bytes) -> NcHeader:
    if buf[:4] not in (_MAGIC1, _MAGIC2, _MAGIC5):
        raise ValueError("not a classic netCDF (CDF-1/CDF-2/CDF-5) file")
    version = buf[3]
    r = _Reader(buf, version)
    r.pos = 4
    numrecs = r.nn()  # all-ones = STREAMING
    # dim_list
    tag, count = r.u32(), r.nn()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(count):
            dims.append((r.name(), r.nn()))
    elif not (tag == 0 and count == 0):
        raise ValueError(f"bad dim-list tag 0x{tag:x}")
    gatts = r.att_list()
    # var_list
    tag, count = r.u32(), r.nn()
    variables: dict[str, NcVar] = {}
    if tag == _NC_VARIABLE:
        for _ in range(count):
            nm = r.name()
            ndims = r.nn()
            dimids = [r.nn() for _ in range(ndims)]
            vatts = r.att_list()
            nc_type = r.u32()
            vsize = r.nn()
            begin = r.u64() if version in (2, 5) else r.u32()
            variables[nm] = NcVar(nm, dimids, nc_type, vsize, begin, vatts)
    elif not (tag == 0 and count == 0):
        raise ValueError(f"bad var-list tag 0x{tag:x}")
    return NcHeader(version, numrecs, dims, gatts, variables)


def _record_layout(hdr: NcHeader) -> tuple[list[NcVar], int]:
    """Record variables (header order) and the per-record stride.

    Per the NetCDF Classic Format Specification, records of ALL record
    variables are interleaved: record r holds one slab of each record
    variable, so the stride between consecutive records of one variable
    is the SUM of the (4-byte padded) vsize over every record variable.
    Special case from the spec: with exactly ONE record variable the
    slabs are packed without padding, so the stride is the unpadded
    slab size.
    """
    rec_vars = [
        v
        for v in hdr.variables.values()
        if v.dimids and hdr.dims[v.dimids[0]][1] == 0
    ]
    if len(rec_vars) == 1:
        v = rec_vars[0]
        _, sz = _TYPES[v.nc_type]
        n_per = 1
        for d in v.dimids[1:]:
            n_per *= hdr.dims[d][1]
        return rec_vars, n_per * sz
    return rec_vars, sum(v.vsize for v in rec_vars)


def _resolve_numrecs(hdr: NcHeader, buf: bytes) -> int:
    """numrecs, deriving it from the file size when the header carries
    the 0xFFFFFFFF STREAMING sentinel (writer didn't know the count)."""
    sentinel = 0xFFFFFFFFFFFFFFFF if hdr.version == 5 else 0xFFFFFFFF
    if hdr.numrecs != sentinel:
        return hdr.numrecs
    rec_vars, recsize = _record_layout(hdr)
    if not rec_vars or recsize == 0:
        return 0
    first = min(v.begin for v in rec_vars)
    return (len(buf) - first) // recsize


class NcReader:
    """Parse-once reader: the header (dims / attrs / variable table) is
    decoded a single time, after which any number of ``read``/``attrs``
    calls reuse it — the decode chain reads data + x/y coordinates +
    attributes from one granule, and re-parsing the header per call is
    wasted work on large files."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.hdr = read_header(buf)

    def _var(self, name: str) -> NcVar:
        if name not in self.hdr.variables:
            raise KeyError(
                f"variable {name!r} not in file "
                f"(has {sorted(self.hdr.variables)})"
            )
        return self.hdr.variables[name]

    def attrs(self, name: str) -> dict:
        return dict(self._var(name).attrs)

    def read(self, name: str):
        """(numpy array in native byte order, fill_value | None)."""
        buf, hdr = self.buf, self.hdr
        var = self._var(name)
        dt, sz = _TYPES[var.nc_type]
        shape = hdr.shape(var)
        is_record = bool(var.dimids) and hdr.dims[var.dimids[0]][1] == 0
        if is_record:
            # record dim (size 0): numrecs interleaved slabs apart
            _, recsize = _record_layout(hdr)
            numrecs = _resolve_numrecs(hdr, buf)
            per_rec = tuple(hdr.dims[d][1] for d in var.dimids[1:])
            n_per = int(np.prod(per_rec)) if per_rec else 1
            if numrecs == 0:
                arr = np.zeros((0,) + per_rec, dtype=dt)
            else:
                recs = []
                for rec in range(numrecs):
                    off = var.begin + rec * recsize
                    recs.append(
                        np.frombuffer(buf, dtype=dt, count=n_per, offset=off)
                    )
                arr = np.stack(recs).reshape((numrecs,) + per_rec)
        else:
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=n, offset=var.begin)
            arr = arr.reshape(shape)
        fill = var.attrs.get("_FillValue")
        return np.ascontiguousarray(arr).astype(dt.lstrip(">")), fill


def read_attrs(buf: bytes, name: str) -> dict:
    """Per-variable attributes (e.g. _FillValue, CF scale_factor /
    add_offset) — same contract as ``hdf5_lite.read_attrs``."""
    return NcReader(buf).attrs(name)


def read_variable(buf: bytes, name: str):
    """Return (numpy array in native byte order, fill_value | None)."""
    return NcReader(buf).read(name)


def write_classic(
    variables: dict[str, tuple[np.ndarray, dict]],
    dims: list[tuple[str, int]] | None = None,
    gatts: dict | None = None,
    var_dims: dict[str, list[str]] | None = None,
    version: int = 1,
) -> bytes:
    """Minimal CDF-1 writer: each entry is ``name -> (array, attrs)``;
    dims are derived from array shapes when not given.  A dim of size 0
    is the record (UNLIMITED) dimension; variables whose first dim is
    the record dim are record variables and their first axis length is
    the record count (records are interleaved per the spec).  Pass
    ``var_dims`` (variable -> list of dim names) to bind axes by name;
    without it axes bind by first-fit on size, which is rejected as
    ambiguous when two supplied dims share a size.  Used by tests to
    produce REAL classic-netCDF bytes for the decode path.
    ``version=5`` emits CDF-5 (64-bit NON_NEGs and offsets, unsigned /
    64-bit integer dtypes)."""
    if version not in (1, 5):
        raise ValueError("version must be 1 (CDF-1) or 5 (CDF-5)")
    P = ">Q" if version == 5 else ">I"  # NON_NEG width
    inv_types = _INV_TYPES_V5 if version == 5 else _INV_TYPES
    arrays = {n: np.asarray(a) for n, (a, _) in variables.items()}
    if dims is None:
        dims = []
        seen = {}
        for n, a in arrays.items():
            for ax, size in enumerate(a.shape):
                key = (n, ax)
                seen[key] = len(dims)
                dims.append((f"{n}_d{ax}", size))
        dimids = {n: [seen[(n, ax)] for ax in range(arrays[n].ndim)] for n in arrays}
    elif var_dims is not None:
        # unambiguous: bind each axis to a named dim
        by_name = {nm: i for i, (nm, _) in enumerate(dims)}
        dimids = {}
        for n, a in arrays.items():
            ids = [by_name[nm] for nm in var_dims[n]]
            for ax, i in enumerate(ids):
                size = dims[i][1]
                want = a.shape[ax]
                if size != want and not (size == 0 and ax == 0):
                    raise ValueError(
                        f"{n}: axis {ax} has length {want}, dim "
                        f"{dims[i][0]!r} has size {size}"
                    )
            dimids[n] = ids
    else:
        # match dims by size, first fit — ambiguous with repeated sizes
        sizes = [s for _, s in dims]
        if len(set(sizes)) != len(sizes):
            raise ValueError(
                "dims with repeated sizes are ambiguous under first-fit "
                "matching; pass var_dims to bind axes by name"
            )
        dimids = {}
        for n, a in arrays.items():
            ids = []
            for size in a.shape:
                ids.append(next(i for i, (_, s) in enumerate(dims) if s == size))
            dimids[n] = ids

    rec_names = [
        n
        for n in variables
        if dimids[n] and dims[dimids[n][0]][1] == 0
    ]
    numrecs = 0
    if rec_names:
        counts = {arrays[n].shape[0] for n in rec_names}
        if len(counts) != 1:
            raise ValueError(
                f"record variables disagree on record count: {counts}"
            )
        numrecs = counts.pop()

    def enc_name(s: str) -> bytes:
        b = s.encode()
        return struct.pack(P, len(b)) + b + b"\x00" * _pad4(len(b))

    def enc_values(vals) -> tuple[int, bytes]:
        if isinstance(vals, str):
            b = vals.encode()
            return 2, struct.pack(P, len(b)) + b + b"\x00" * _pad4(len(b))
        arr = np.asarray(vals)
        t = inv_types[str(arr.dtype)]
        dt, sz = _TYPES[t]
        raw = arr.astype(dt).tobytes()
        return t, struct.pack(P, arr.size) + raw + b"\x00" * _pad4(len(raw))

    def enc_attrs(attrs: dict) -> bytes:
        if not attrs:
            return struct.pack(">I", 0) + struct.pack(P, 0)
        out = struct.pack(">I", _NC_ATTRIBUTE) + struct.pack(P, len(attrs))
        for k, v in attrs.items():
            t, payload = enc_values(v)
            out += enc_name(k) + struct.pack(">I", t) + payload
        return out

    header = (_MAGIC5 if version == 5 else _MAGIC1) + struct.pack(P, numrecs)
    header += struct.pack(">I", _NC_DIMENSION) + struct.pack(P, len(dims))
    for nm, size in dims:
        header += enc_name(nm) + struct.pack(P, size)
    header += enc_attrs(gatts or {})

    # variable metadata needs data offsets — two passes
    # entries: (name, dimids, attrs, nc_type, vsize, nbytes, arr, is_rec)
    var_meta = []
    for n, (a, attrs) in variables.items():
        arr = arrays[n]
        t = inv_types[str(arr.dtype)]
        dt, sz = _TYPES[t]
        is_rec = n in rec_names
        if is_rec:
            n_per = int(np.prod(arr.shape[1:])) if arr.ndim > 1 else 1
            nbytes = n_per * sz  # one record's slab
        else:
            nbytes = arr.size * sz
        vsize = nbytes + _pad4(nbytes)
        var_meta.append((n, dimids[n], attrs, t, vsize, nbytes, arr.astype(dt), is_rec))

    def var_entry(n, ids, attrs, t, vsize, begin) -> bytes:
        out = enc_name(n) + struct.pack(P, len(ids))
        out += b"".join(struct.pack(P, i) for i in ids)
        out += enc_attrs(attrs)
        out += struct.pack(">I", t) + struct.pack(P, vsize)
        out += struct.pack(">Q" if version == 5 else ">I", begin)
        return out

    # sizing pass with begin=0, then real pass
    probe = (
        struct.pack(">I", _NC_VARIABLE) + struct.pack(P, len(var_meta))
    ) + b"".join(
        var_entry(n, ids, attrs, t, vsize, 0)
        for n, ids, attrs, t, vsize, _, _, _ in var_meta
    )
    data_start = len(header) + len(probe)
    single_rec = len(rec_names) == 1
    begins = [0] * len(var_meta)
    off = data_start
    for i, (_, _, _, _, vsize, _, _, is_rec) in enumerate(var_meta):
        if not is_rec:
            begins[i] = off
            off += vsize
    # record vars: begin = their slab's offset within record 0
    for i, (_, _, _, _, vsize, nbytes, _, is_rec) in enumerate(var_meta):
        if is_rec:
            begins[i] = off
            off += nbytes if single_rec else vsize
    body = (
        struct.pack(">I", _NC_VARIABLE) + struct.pack(P, len(var_meta))
    ) + b"".join(
        var_entry(n, ids, attrs, t, vsize, begin)
        for (n, ids, attrs, t, vsize, _, _, _), begin in zip(var_meta, begins)
    )
    out = bytearray(header + body)
    for (_, _, _, _, _, _, arr, is_rec), begin in zip(var_meta, begins):
        if is_rec:
            continue
        raw = arr.tobytes()
        assert len(out) == begin
        out += raw + b"\x00" * _pad4(len(raw))
    # record section: records of ALL record variables interleaved; with
    # exactly one record variable the slabs are packed unpadded (spec)
    rec_metas = [m for m in var_meta if m[7]]
    for rec in range(numrecs):
        for _, _, _, _, _, _, arr, _ in rec_metas:
            # slice (not index) so 1-D arrays keep their big-endian
            # byte order — arr[rec] would be a native-endian scalar
            raw = arr[rec : rec + 1].tobytes()
            out += raw
            if not single_rec:
                out += b"\x00" * _pad4(len(raw))
    return bytes(out)
