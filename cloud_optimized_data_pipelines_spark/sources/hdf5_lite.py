"""Pure-numpy reader (and minimal writer) for HDF5 — the container
format behind netCDF-4.

The reference's cogify stage reads gridded variables out of HDF5-backed
netCDF-4 / HDF-EOS5 granules, addressed by group path + variable name
(``lambdas/cogify/handler.py:81-93``; group paths configured per
collection, e.g. ``example.ini:13-24``).  The container has no
h5py/netCDF4, but the HDF5 File Format Specification is public, so this
module decodes the subset those granules actually use, the same
first-principles way ``netcdf_classic.py`` decodes CDF-1/2:

reader (:func:`read_variable`, :func:`read_attrs`, :func:`list_children`)
- superblock v0/v1 and v2/v3 (8-byte offsets/lengths);
- version 1 object headers (with continuation blocks) and version 2
  ``OHDR`` headers (with ``OCHK`` continuations);
- all three group storage flavors: "old-style" (Symbol Table message
  -> v1 B-tree -> SNOD nodes -> local heap names), "new-style" compact
  (Link messages), and DENSE (Link Info -> managed-object fractal heap
  + v2 B-tree name index, the layout HDF-EOS5 granules use once a
  group outgrows the compact-link threshold; v2 metadata checksums and
  link-name hashes are verified with a real Jenkins lookup3);
- datasets: dataspace v1/v2, fixed-point / float / string datatypes in
  either byte order, fill value v1/v2/v3, layout v3 contiguous and
  chunked (v1 B-tree chunk index) plus layout v4's latest-format chunk
  indexes (single-chunk, implicit, non-paged fixed array), filter
  pipeline v1/v2 with deflate, shuffle, fletcher32, n-bit (atomic
  numeric datatypes) and szip (CCSDS-121 extended-Rice via
  operators/rice_codec.py, H5Zszip framing — the HDF-EOS compression;
  24-bit samples and partial-block scanlines raise named errors);
- attributes v1 and v3 (scalar + simple arrays), e.g. ``_FillValue``.

writer (:func:`write_hdf5`) — fixture generator emitting a minimal
standards-conforming v0-superblock file (symbol-table groups, v1
object headers, contiguous or chunked+deflate datasets, v1 attributes)
so the reader is exercised against REAL bytes without any external
library.  Group paths like ``"Grid/precip"`` create nested groups; a
group with more than 8 children switches to dense link storage
(fractal heap + v2 name-index B-tree with real lookup3 checksums).

HDF5 is self-describing with explicit addresses, so round-tripping
through this writer plus the independent structural checks in tests
(signatures at declared offsets, chunk alignment, libhdf5 defaults)
keep the two sides honest.  The netCDF4-library fast path stays ahead
of this module behind an import-try in ``operators/cogify.py``.
"""

from __future__ import annotations

import itertools
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# low-level reading
# ---------------------------------------------------------------------------


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


@dataclass
class _Dtype:
    kind: str  # "int" | "uint" | "float" | "string"
    size: int
    big_endian: bool

    def numpy(self) -> np.dtype:
        if self.kind == "string":
            return np.dtype(f"S{self.size}")
        code = {"int": "i", "uint": "u", "float": "f"}[self.kind]
        return np.dtype(("{}" + code + "{}").format(">" if self.big_endian else "<", self.size))


@dataclass
class _Dataset:
    dims: tuple[int, ...]
    dtype: _Dtype
    layout_class: int  # 1 contiguous, 2 chunked
    data_addr: int = UNDEF
    data_size: int = 0
    chunk_dims: tuple[int, ...] = ()
    btree_addr: int = UNDEF
    # layout v4 (latest-format) chunk indexes: 0 = v1 B-tree (layout
    # v3), else the v4 chunk index type (1 single, 2 implicit, 3 fixed
    # array)
    chunk_index_type: int = 0
    single_chunk_size: int = 0
    single_chunk_mask: int = 0
    filters: list[tuple[int, tuple[int, ...]]] = field(default_factory=list)
    fill: bytes | None = None
    attrs: dict = field(default_factory=dict)


def superblock(buf: bytes) -> tuple[int, int]:
    """Return (version, root object header address)."""
    if buf[:8] != MAGIC:
        raise ValueError("not an HDF5 file (bad signature)")
    version = buf[8]
    if version in (0, 1):
        if buf[13] != 8 or buf[14] != 8:
            raise ValueError("only 8-byte offsets/lengths supported")
        # root group symbol table entry at 56 (v0); v1 adds 4 bytes
        ste = 56 if version == 0 else 60
        return version, _u(buf, ste + 8, 8)
    if version in (2, 3):
        if buf[9] != 8 or buf[10] != 8:
            raise ValueError("only 8-byte offsets/lengths supported")
        return version, _u(buf, 36, 8)
    raise ValueError(f"unsupported superblock version {version}")


def _parse_dataspace(b: bytes) -> tuple[int, ...]:
    version = b[0]
    ndim = b[1]
    if version == 1:
        off = 8
    elif version == 2:
        off = 4
    else:
        raise ValueError(f"dataspace version {version}")
    return tuple(_u(b, off + 8 * i, 8) for i in range(ndim))


def _parse_datatype(b: bytes) -> _Dtype:
    cls = b[0] & 0x0F
    bits0 = b[1]
    size = _u(b, 4, 4)
    big = bool(bits0 & 0x01)
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        return _Dtype("int" if signed else "uint", size, big)
    if cls == 1:  # floating-point
        return _Dtype("float", size, big)
    if cls == 3:  # string
        return _Dtype("string", size, False)
    raise ValueError(f"unsupported datatype class {cls}")


def _parse_fill(b: bytes) -> bytes | None:
    version = b[0]
    if version in (1, 2):
        defined = b[3]
        if version == 1 or defined:
            n = _u(b, 4, 4)
            return bytes(b[8 : 8 + n]) if n else None
        return None
    if version == 3:
        flags = b[1]
        if flags & 0x20:
            n = _u(b, 2, 4)
            return bytes(b[6 : 6 + n]) if n else None
        return None
    raise ValueError(f"fill value version {version}")


def _parse_filters(b: bytes) -> list[tuple[int, tuple[int, ...]]]:
    version = b[0]
    nf = b[1]
    out = []
    if version == 1:
        off = 8
        for _ in range(nf):
            fid = _u(b, off, 2)
            namelen = _u(b, off + 2, 2)
            ncv = _u(b, off + 6, 2)
            off += 8 + namelen
            cvs = tuple(_u(b, off + 4 * i, 4) for i in range(ncv))
            off += 4 * ncv
            if ncv % 2:
                off += 4
            out.append((fid, cvs))
        return out
    if version == 2:
        off = 2
        for _ in range(nf):
            fid = _u(b, off, 2)
            off += 2
            namelen = 0
            if fid >= 256:
                namelen = _u(b, off, 2)
                off += 2
            off += 4  # flags + ncv
            ncv = _u(b, off - 2, 2)
            off += namelen
            cvs = tuple(_u(b, off + 4 * i, 4) for i in range(ncv))
            off += 4 * ncv
            out.append((fid, cvs))
        return out
    raise ValueError(f"filter pipeline version {version}")


def _parse_attr(b: bytes) -> tuple[str, object]:
    version = b[0]
    if version == 1:
        name_size = _u(b, 2, 2)
        dt_size = _u(b, 4, 2)
        ds_size = _u(b, 6, 2)
        off = 8
        name = bytes(b[off : off + name_size]).split(b"\x00")[0].decode()
        off += (name_size + 7) // 8 * 8
        dt = _parse_datatype(b[off : off + dt_size])
        off += (dt_size + 7) // 8 * 8
        dims = _parse_dataspace(b[off : off + ds_size])
        off += (ds_size + 7) // 8 * 8
    elif version == 3:
        name_size = _u(b, 2, 2)
        dt_size = _u(b, 4, 2)
        ds_size = _u(b, 6, 2)
        off = 9
        name = bytes(b[off : off + name_size]).split(b"\x00")[0].decode()
        off += name_size
        dt = _parse_datatype(b[off : off + dt_size])
        off += dt_size
        dims = _parse_dataspace(b[off : off + ds_size])
        off += ds_size
    else:
        raise ValueError(f"attribute version {version}")
    n = int(np.prod(dims)) if dims else 1
    if dt.kind == "string":
        return name, bytes(b[off : off + dt.size]).split(b"\x00")[0].decode()
    arr = np.frombuffer(b, dtype=dt.numpy(), count=n, offset=off)
    if not dims:
        return name, arr[0]
    return name, arr.reshape(dims)


def _messages_v1(buf: bytes, addr: int):
    """Yield (type, body) from a version-1 object header incl.
    continuations."""
    nmsgs = _u(buf, addr + 2, 2)
    blocks = [(addr + 16, _u(buf, addr + 8, 4))]
    seen = 0
    while blocks and seen < nmsgs:
        off, size = blocks.pop(0)
        end = off + size
        while off + 8 <= end and seen < nmsgs:
            mtype = _u(buf, off, 2)
            msize = _u(buf, off + 2, 2)
            body = buf[off + 8 : off + 8 + msize]
            off += 8 + msize
            seen += 1
            if mtype == 0x0010:  # continuation
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            else:
                yield mtype, body


def _messages_v2(buf: bytes, addr: int):
    if buf[addr : addr + 4] != b"OHDR":
        raise ValueError("bad v2 object header signature")
    flags = buf[addr + 5]
    off = addr + 6
    if flags & 0x20:
        off += 16  # times
    if flags & 0x10:
        off += 4  # max compact / min dense
    size0 = _u(buf, off, 1 << (flags & 0x03))
    off += 1 << (flags & 0x03)
    creation_tracked = bool(flags & 0x04)
    # "size of chunk 0" covers messages + gap, NOT the prefix/checksum;
    # a continuation message's length covers the whole OCHK block
    # (signature + messages + gap + checksum)
    blocks = [(off, size0, False)]
    while blocks:
        off, size, chk = blocks.pop(0)
        if chk:
            if buf[off : off + 4] != b"OCHK":
                raise ValueError("bad OCHK signature")
            off += 4
            size -= 8  # signature + trailing checksum
        end = off + size
        while off + 4 <= end:
            mtype = buf[off]
            msize = _u(buf, off + 1, 2)
            off += 4
            if creation_tracked:
                off += 2
            if msize == 0 and mtype == 0:
                break
            body = buf[off : off + msize]
            off += msize
            if mtype == 0x10:
                blocks.append((_u(body, 0, 8), _u(body, 8, 8), True))
            else:
                yield mtype, body


def _messages(buf: bytes, addr: int):
    if buf[addr : addr + 4] == b"OHDR":
        yield from _messages_v2(buf, addr)
    elif buf[addr] == 1:
        yield from _messages_v1(buf, addr)
    else:
        raise ValueError(f"unsupported object header at {addr}")


def _rot32(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins' public-domain lookup3 ``hashlittle`` — the hash HDF5
    uses both for v2 metadata checksums and for dense-storage link-name
    index keys (HDF5 File Format Spec; lookup3.c self-test vectors
    pinned in tests).  The tail switch of the reference implementation
    is equivalent to a zero-padded little-endian word read, which is
    what this does."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & 0xFFFFFFFF
    off = 0
    while length > 12:
        a = (a + int.from_bytes(data[off : off + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[off + 4 : off + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[off + 8 : off + 12], "little")) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot32(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot32(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot32(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot32(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot32(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot32(b, 4); b = (b + a) & 0xFFFFFFFF
        off += 12
        length -= 12
    if length == 0:
        return c
    t = data[off:] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(t[0:4], "little")) & 0xFFFFFFFF
    b = (b + int.from_bytes(t[4:8], "little")) & 0xFFFFFFFF
    c = (c + int.from_bytes(t[8:12], "little")) & 0xFFFFFFFF
    c ^= b; c = (c - _rot32(b, 14)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot32(c, 11)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot32(a, 25)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot32(b, 16)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot32(c, 4)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot32(a, 14)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot32(b, 24)) & 0xFFFFFFFF
    return c


def _parse_link_msg(body: bytes) -> tuple[str, int] | None:
    """Decode a Link message (type 0x0006) body -> (name, header addr),
    or None for soft/external links."""
    flags = body[1]
    off = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[off]
        off += 1
    if flags & 0x04:
        off += 8  # creation order
    if flags & 0x10:
        off += 1  # charset
    nlen = _u(body, off, 1 << (flags & 0x03))
    off += 1 << (flags & 0x03)
    name = bytes(body[off : off + nlen]).decode()
    off += nlen
    if ltype == 0:  # hard link
        return name, _u(body, off, 8)
    return None


class _FractalHeap:
    """Managed-object fractal heap (HDF5 spec III.G) — the storage
    behind dense group links.  Parses the FRHP header and builds the
    heap-offset -> file-address map from the doubling table: root
    either a single direct block (curr_rows == 0) or a root indirect
    block (FHIB) whose rows hold direct blocks of doubling sizes.
    Nested indirect blocks (multi-GB heaps) raise — far beyond any
    granule's link list."""

    def __init__(self, buf: bytes, addr: int):
        if buf[addr : addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap signature")
        self.buf = buf
        self.id_len = _u(buf, addr + 5, 2)
        filt_len = _u(buf, addr + 7, 2)
        self.flags = buf[addr + 9]
        self.max_managed = _u(buf, addr + 10, 4)
        # fixed-width fields up to the table section
        o = addr + 10 + 4 + 8 + 8 + 8 + 8 + 8 + 8 + 8 + 8 + 8 + 8 + 8 + 8
        self.width = _u(buf, o, 2)
        self.start_size = _u(buf, o + 2, 8)
        self.max_direct = _u(buf, o + 10, 8)
        self.max_heap_bits = _u(buf, o + 18, 2)
        o += 20 + 2  # + starting # rows
        self.root_addr = _u(buf, o, 8)
        self.curr_rows = _u(buf, o + 8, 2)
        if filt_len:
            raise ValueError("filtered fractal heap blocks not supported")
        hdr_end = o + 10
        if lookup3(bytes(buf[addr:hdr_end])) != _u(buf, hdr_end, 4):
            raise ValueError("fractal heap header checksum mismatch")
        self.off_size = (self.max_heap_bits + 7) // 8
        self.len_size = max(1, (self.max_managed.bit_length() + 7) // 8)
        # (heap_offset, file_addr, size) per direct block, offset-sorted
        self.blocks: list[tuple[int, int, int]] = []
        if self.curr_rows == 0:
            self._check_dblock(self.root_addr, 0)
            self.blocks.append((0, self.root_addr, self.start_size))
        else:
            self._parse_indirect(self.root_addr, self.curr_rows)

    def _row_size(self, row: int) -> int:
        return self.start_size * (1 << max(0, row - 1))

    def _check_dblock(self, addr: int, expect_off: int) -> None:
        if self.buf[addr : addr + 4] != b"FHDB":
            raise ValueError(f"bad fractal-heap direct block at {addr}")
        got = _u(self.buf, addr + 13, self.off_size)
        if got != expect_off:
            raise ValueError(
                f"direct block offset {got} != expected {expect_off}"
            )

    def _parse_indirect(self, addr: int, nrows: int) -> None:
        if self.buf[addr : addr + 4] != b"FHIB":
            raise ValueError(f"bad fractal-heap indirect block at {addr}")
        max_direct_rows = (
            self.max_direct.bit_length() - self.start_size.bit_length()
        ) + 2
        o = addr + 4 + 1 + 8 + self.off_size
        heap_off = 0
        for row in range(nrows):
            size = self._row_size(row)
            for _ in range(self.width):
                if row >= max_direct_rows:
                    raise ValueError(
                        "nested indirect fractal-heap blocks not supported"
                    )
                child = _u(self.buf, o, 8)
                o += 8
                if child != UNDEF:
                    self._check_dblock(child, heap_off)
                    self.blocks.append((heap_off, child, size))
                heap_off += size
        self.blocks.sort()

    def read_object(self, heap_id: bytes) -> bytes:
        flags = heap_id[0]
        if (flags >> 6) & 0x03:
            raise ValueError(f"heap ID version {(flags >> 6) & 3}")
        htype = (flags >> 4) & 0x03
        if htype == 2:  # tiny: payload embedded in the ID
            n = (flags & 0x0F) + 1
            return bytes(heap_id[1 : 1 + n])
        if htype != 0:
            raise ValueError("huge fractal-heap objects not supported")
        off = _u(heap_id, 1, self.off_size)
        length = _u(heap_id, 1 + self.off_size, self.len_size)
        for blk_off, blk_addr, blk_size in reversed(self.blocks):
            if blk_off <= off < blk_off + blk_size:
                a = blk_addr + (off - blk_off)
                return bytes(self.buf[a : a + length])
        raise ValueError(f"heap offset {off} outside any direct block")


def _v2_btree_records(buf: bytes, addr: int) -> list[bytes]:
    """All records of a version-2 B-tree (BTHD/BTIN/BTLF), depth <= 1.
    Leaf-node checksums are verified (Jenkins lookup3, as the spec
    requires for v2 metadata)."""
    if buf[addr : addr + 4] != b"BTHD":
        raise ValueError("bad v2 B-tree header signature")
    node_size = _u(buf, addr + 6, 4)
    rec_size = _u(buf, addr + 10, 2)
    depth = _u(buf, addr + 12, 2)
    root_addr = _u(buf, addr + 16, 8)
    root_nrec = _u(buf, addr + 24, 2)

    def leaf(a: int, nrec: int) -> list[bytes]:
        if buf[a : a + 4] != b"BTLF":
            raise ValueError("bad v2 B-tree leaf signature")
        used = 6 + nrec * rec_size
        want = _u(buf, a + used, 4)
        if lookup3(bytes(buf[a : a + used])) != want:
            raise ValueError("v2 B-tree leaf checksum mismatch")
        return [
            bytes(buf[a + 6 + i * rec_size : a + 6 + (i + 1) * rec_size])
            for i in range(nrec)
        ]

    if depth == 0:
        return leaf(root_addr, root_nrec)
    if depth == 1:
        if buf[root_addr : root_addr + 4] != b"BTIN":
            raise ValueError("bad v2 B-tree internal signature")
        max_leaf_rec = (node_size - 10) // rec_size
        nrec_size = max(1, (max_leaf_rec.bit_length() + 7) // 8)
        # the internal node stores real records BETWEEN child pointers
        # (B-tree, not B+-tree): collect children and separators both
        out: list[bytes] = []
        o = root_addr + 6 + root_nrec * rec_size
        for _ in range(root_nrec + 1):
            child = _u(buf, o, 8)
            child_n = _u(buf, o + 8, nrec_size)
            out.extend(leaf(child, child_n))
            o += 8 + nrec_size
        for i in range(root_nrec):
            out.append(
                bytes(
                    buf[
                        root_addr + 6 + i * rec_size : root_addr
                        + 6
                        + (i + 1) * rec_size
                    ]
                )
            )
        return out
    raise ValueError(f"v2 B-tree depth {depth} not supported")


def _dense_links(buf: bytes, fheap_addr: int, btree_addr: int) -> dict[str, int]:
    """Enumerate a dense-storage group: every record of the link-name
    v2 B-tree (type 5: 4-byte lookup3 name hash + fractal-heap ID) is
    resolved through the heap to a serialized Link message."""
    heap = _FractalHeap(buf, fheap_addr)
    out: dict[str, int] = {}
    for rec in _v2_btree_records(buf, btree_addr):
        link = _parse_link_msg(heap.read_object(rec[4:]))
        if link is not None:
            name, hdr = link
            if lookup3(name.encode()) != _u(rec, 0, 4):
                raise ValueError(f"link name hash mismatch for {name!r}")
            out[name] = hdr
    return out


def _heap_name(buf: bytes, heap_addr: int, name_off: int) -> str:
    if buf[heap_addr : heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    data_addr = _u(buf, heap_addr + 24, 8)
    end = buf.index(b"\x00", data_addr + name_off)
    return buf[data_addr + name_off : end].decode()


def _walk_group_btree(buf: bytes, btree_addr: int, heap_addr: int, out: dict):
    if buf[btree_addr : btree_addr + 4] == b"SNOD":
        n = _u(buf, btree_addr + 6, 2)
        off = btree_addr + 8
        for _ in range(n):
            name_off = _u(buf, off, 8)
            header = _u(buf, off + 8, 8)
            out[_heap_name(buf, heap_addr, name_off)] = header
            off += 40
        return
    if buf[btree_addr : btree_addr + 4] != b"TREE":
        raise ValueError("bad group B-tree signature")
    n = _u(buf, btree_addr + 6, 2)
    off = btree_addr + 24  # past sibling pointers
    for i in range(n):
        child = _u(buf, off + 8, 8)  # key_i (8) then child_i
        _walk_group_btree(buf, child, heap_addr, out)
        off += 16


def list_children(buf: bytes, header_addr: int) -> dict[str, int]:
    """name -> object header address for a group object.  All three
    group storage flavors: symbol-table (old-style), compact (Link
    messages), and dense (Link Info -> fractal heap + v2 B-tree name
    index — what HDF-EOS5 granules use once a group outgrows the
    compact-link threshold)."""
    out: dict[str, int] = {}
    for mtype, body in _messages(buf, header_addr):
        if mtype == 0x0011:  # symbol table
            _walk_group_btree(buf, _u(body, 0, 8), _u(body, 8, 8), out)
        elif mtype == 0x0006:  # link message
            link = _parse_link_msg(body)
            if link is not None:
                out[link[0]] = link[1]
        elif mtype == 0x0002:  # link info
            off = 2 + (8 if body[1] & 0x01 else 0)
            fheap_addr = _u(body, off, 8)
            btree_addr = _u(body, off + 8, 8)
            if fheap_addr != UNDEF:
                out.update(_dense_links(buf, fheap_addr, btree_addr))
    return out


def _resolve(buf: bytes, path: str) -> int:
    _, addr = superblock(buf)
    for part in [p for p in path.split("/") if p]:
        children = list_children(buf, addr)
        if part not in children:
            raise KeyError(
                f"{part!r} not found (has {sorted(children)})"
            )
        addr = children[part]
    return addr


def _parse_dataset(buf: bytes, header_addr: int) -> _Dataset:
    ds = _Dataset(dims=(), dtype=_Dtype("uint", 1, False), layout_class=1)
    for mtype, body in _messages(buf, header_addr):
        if mtype == 0x0001:
            ds.dims = _parse_dataspace(body)
        elif mtype == 0x0003:
            ds.dtype = _parse_datatype(body)
        elif mtype == 0x0005:
            ds.fill = _parse_fill(body)
        elif mtype == 0x0008:
            if body[0] == 3:
                ds.layout_class = body[1]
                if ds.layout_class == 0:  # compact
                    ds.data_size = _u(body, 2, 2)
                    ds.data_addr = -1  # inline; stored in message body
                    ds._compact = bytes(body[4 : 4 + ds.data_size])
                elif ds.layout_class == 1:
                    ds.data_addr = _u(body, 2, 8)
                    ds.data_size = _u(body, 10, 8)
                elif ds.layout_class == 2:
                    nd = body[2]
                    ds.btree_addr = _u(body, 3, 8)
                    ds.chunk_dims = tuple(
                        _u(body, 11 + 4 * i, 4) for i in range(nd - 1)
                    )
                else:
                    raise ValueError(f"layout class {ds.layout_class}")
            elif body[0] == 4:
                # latest-format layout: v4 chunked with the new chunk
                # index family (libhdf5 H5F_LIBVER_LATEST output)
                ds.layout_class = body[1]
                if ds.layout_class != 2:
                    raise ValueError("layout v4 only supported for chunked")
                flags = body[2]
                nd = body[3]
                enc = body[4]
                dims = tuple(_u(body, 5 + enc * i, enc) for i in range(nd))
                # libhdf5 stores rank+1 dims with the element size last
                ds.chunk_dims = dims[:-1] if nd > 1 else dims
                off = 5 + enc * nd
                ds.chunk_index_type = body[off]
                off += 1
                if ds.chunk_index_type == 1:  # single chunk
                    if flags & 0x02:  # filtered single chunk
                        ds.single_chunk_size = _u(body, off, 8)
                        off += 8
                        ds.single_chunk_mask = _u(body, off, 4)
                        off += 4
                    ds.btree_addr = _u(body, off, 8)
                elif ds.chunk_index_type == 2:  # implicit
                    ds.btree_addr = _u(body, off, 8)
                elif ds.chunk_index_type == 3:  # fixed array
                    off += 1  # page bits
                    ds.btree_addr = _u(body, off, 8)
                else:
                    raise ValueError(
                        "extensible-array / v2-btree chunk indexes not "
                        f"supported (type {ds.chunk_index_type})"
                    )
            else:
                raise ValueError(f"layout version {body[0]} (need v3/v4)")
        elif mtype == 0x000B:
            ds.filters = _parse_filters(body)
        elif mtype == 0x000C:
            k, v = _parse_attr(body)
            ds.attrs[k] = v
    return ds


def _walk_chunk_btree(buf: bytes, addr: int, ndim: int, out: list):
    if buf[addr : addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    level = buf[addr + 5]
    n = _u(buf, addr + 6, 2)
    key_size = 8 + 8 * (ndim + 1)
    off = addr + 24
    for _ in range(n):
        size = _u(buf, off, 4)
        mask = _u(buf, off + 4, 4)
        coords = tuple(_u(buf, off + 8 + 8 * i, 8) for i in range(ndim))
        child = _u(buf, off + key_size, 8)
        if level == 0:
            out.append((coords, size, mask, child))
        else:
            _walk_chunk_btree(buf, child, ndim, out)
        off += key_size + 8


def _read_fixed_array(
    buf: bytes, hdr_addr: int, coords_list: list, raw_chunk: int
) -> list:
    """Fixed Array chunk index (latest-format, layout v4 type 3):
    FAHD header -> FADB data block holding one element per chunk in
    row-major grid order (address, plus size+filter-mask when the
    client type says chunks are filtered)."""
    if buf[hdr_addr : hdr_addr + 4] != b"FAHD":
        raise ValueError("bad fixed-array header signature")
    client = buf[hdr_addr + 5]
    entry_size = buf[hdr_addr + 6]
    page_bits = buf[hdr_addr + 7]
    nmax = _u(buf, hdr_addr + 8, 8)
    if nmax > (1 << page_bits):
        raise ValueError("paged fixed-array chunk index not supported")
    db = _u(buf, hdr_addr + 16, 8)
    if buf[db : db + 4] != b"FADB":
        raise ValueError("bad fixed-array data block signature")
    off = db + 14  # sig(4) + version(1) + client(1) + header addr(8)
    out = []
    for i, coords in enumerate(coords_list):
        base = off + i * entry_size
        addr = _u(buf, base, 8)
        if addr == UNDEF:
            continue
        if client == 0:
            out.append((coords, raw_chunk, 0, addr))
        else:
            size = _u(buf, base + 8, entry_size - 12)
            mask = _u(buf, base + entry_size - 4, 4)
            out.append((coords, size, mask, addr))
    return out


def _chunk_entries(buf: bytes, ds: _Dataset, dt: np.dtype) -> list:
    """(coords, stored_size, filter_mask, address) per existing chunk,
    across the v1-B-tree (layout v3) and v4 chunk index families."""
    if ds.chunk_index_type == 0:
        out: list = []
        if ds.btree_addr != UNDEF:
            _walk_chunk_btree(buf, ds.btree_addr, len(ds.dims), out)
        return out
    if ds.btree_addr == UNDEF:
        return []
    grid = [range(0, d, c) for d, c in zip(ds.dims, ds.chunk_dims)]
    coords_list = list(itertools.product(*grid))
    raw_chunk = int(np.prod(ds.chunk_dims)) * dt.itemsize
    if ds.chunk_index_type == 1:  # single chunk
        size = ds.single_chunk_size or raw_chunk
        return [(coords_list[0], size, ds.single_chunk_mask, ds.btree_addr)]
    if ds.chunk_index_type == 2:  # implicit: contiguous, unfiltered
        return [
            (c, raw_chunk, 0, ds.btree_addr + i * raw_chunk)
            for i, c in enumerate(coords_list)
        ]
    return _read_fixed_array(buf, ds.btree_addr, coords_list, raw_chunk)


def _nbit_decode(raw: bytes, cvs: tuple[int, ...]) -> bytes:
    """HDF5 n-bit filter (id 5) decode for ATOMIC numeric datatypes.

    Client-data layout (H5Znbit set_local, public file-format
    behavior): cd[0]=valid parameter count, cd[1]=need-not-compress
    flag (set -> chunk stored verbatim), cd[2]=elements per chunk,
    then the datatype description — for an atomic type the 5-tuple
    (tag=1, size_bytes, byte order 0=LE/1=BE, precision_bits,
    offset_bits).  Packed stream = each element's ``precision``-bit
    field appended MSB-first, zero-padded to a byte.  Decode restores
    the field at ``offset`` in a zeroed ``size``-byte integer — no
    sign extension, exactly like the library (precision is a datatype
    property; bits above it are definitionally zero).

    ARRAY/COMPOUND/VL datatype trees raise a named error (read those
    via h5py/netCDF4)."""
    if len(cvs) < 4:
        raise ValueError("n-bit filter: malformed client data (need >= 4 values)")
    if cvs[1]:  # need-not-compress: stored verbatim
        return raw
    n = cvs[2]
    if cvs[3] != 1:  # H5Z_NBIT_ATOMIC
        raise ValueError(
            f"n-bit filter: datatype description tag {cvs[3]} (array/"
            "compound/no-op tree) not supported by the pure-numpy reader; "
            "read this granule via h5py/netCDF4"
        )
    if len(cvs) < 8:
        raise ValueError("n-bit filter: truncated atomic datatype description")
    size, order, precision, offset = cvs[4], cvs[5], cvs[6], cvs[7]
    if size not in (1, 2, 4, 8) or precision + offset > size * 8 or precision == 0:
        raise ValueError(
            f"n-bit filter: bad atomic parms size={size} precision="
            f"{precision} offset={offset}"
        )
    if precision == size * 8 and offset == 0:
        return raw
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
    if len(bits) < n * precision:
        raise ValueError("n-bit filter: packed stream shorter than chunk")
    b = bits[: n * precision].reshape(n, precision).astype(np.uint64)
    weights = np.uint64(1) << np.arange(
        precision - 1, -1, -1, dtype=np.uint64
    )
    vals = (b * weights).sum(axis=1, dtype=np.uint64) << np.uint64(offset)
    dt = np.dtype(("<" if order == 0 else ">") + f"u{size}")
    return vals.astype(dt).tobytes()


def _nbit_encode(block: np.ndarray, precision: int, offset: int) -> bytes:
    """Inverse of :func:`_nbit_decode` for the fixture writer: pack
    each element's ``precision``-bit field at ``offset`` MSB-first."""
    size = block.dtype.itemsize
    if block.dtype.kind not in "iu":
        raise ValueError("n-bit fixture writer supports integer dtypes only")
    u = np.ascontiguousarray(block).reshape(-1).view(
        np.dtype(block.dtype.str.replace("i", "u"))
    ).astype(np.uint64)
    field = (u >> np.uint64(offset)) & np.uint64((1 << precision) - 1)
    bits = (
        (field[:, None] >> np.arange(precision - 1, -1, -1, dtype=np.uint64))
        & np.uint64(1)
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _apply_filters(
    raw: bytes, filters, mask: int, elem_size: int
) -> bytes:
    # pipeline runs in reverse on read; skip filters flagged in mask
    for i in range(len(filters) - 1, -1, -1):
        fid, cvs = filters[i]
        if mask & (1 << i):
            continue
        if fid == 1:  # deflate
            raw = zlib.decompress(raw)
        elif fid == 2:  # shuffle
            n = cvs[0] if cvs else elem_size
            if n > 1:
                a = np.frombuffer(raw, dtype=np.uint8)
                raw = (
                    a.reshape(n, len(raw) // n).T.reshape(-1).tobytes()
                )
        elif fid == 3:  # fletcher32 checksum: strip trailing 4 bytes
            raw = raw[:-4]
        elif fid == 4:  # szip: CCSDS-121 extended-Rice (H5Zszip framing)
            from cloud_optimized_data_pipelines_spark.operators.rice_codec import (
                rice_decode,
            )

            if len(cvs) < 4:
                raise ValueError("szip: malformed client data (need 4 values)")
            # H5Zszip layout: [options_mask, bits_per_pixel,
            # pixels_per_block, pixels_per_scanline]; compressed chunk =
            # 4-byte LE uncompressed byte count + raw rice stream
            # (H5Z always sets SZ_RAW, so no szip stream header)
            opts, bpp, ppb, pps = cvs[0], cvs[1], cvs[2], cvs[3]
            if not (opts & 0x80):  # SZ_RAW_OPTION_MASK
                raise ValueError(
                    "szip: non-raw stream (szip header present) "
                    "unsupported — H5Zszip always writes raw streams"
                )
            (orig,) = struct.unpack("<I", raw[:4])
            width = (bpp + 7) // 8
            if width == 3:
                raise ValueError(
                    "szip: 24-bit samples unsupported (8/16/32-bit only)"
                )
            if orig % width:
                raise ValueError("szip: stored size not a sample multiple")
            nn = bool(opts & 0x20)  # SZ_NN_OPTION_MASK (else EC)
            samples = rice_decode(
                raw[4:], orig // width, bpp, ppb, pps, nn=nn
            )
            order = ">" if opts & 0x10 else "<"  # SZ_MSB else LSB
            raw = samples.astype(np.dtype(f"{order}u{width}")).tobytes()
        elif fid == 5:  # n-bit
            raw = _nbit_decode(raw, cvs)
        else:
            raise ValueError(f"unsupported filter id {fid}")
    return raw


class H5Reader:
    """Parse-once reader: group resolution and dataset object headers
    are cached per path, so reading data + x/y coordinates + attrs from
    one granule walks the container structure once per object instead
    of once per call."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self._datasets: dict[str, _Dataset] = {}

    def _dataset(self, name: str, group: str | None) -> _Dataset:
        path = f"{group.rstrip('/')}/{name}" if group else name
        ds = self._datasets.get(path)
        if ds is None:
            ds = _parse_dataset(self.buf, _resolve(self.buf, path))
            self._datasets[path] = ds
        return ds

    def attrs(self, name: str, group: str | None = None) -> dict:
        return dict(self._dataset(name, group).attrs)

    def read(self, name: str, group: str | None = None):
        """(numpy array in native byte order, fill_value | None)."""
        return _materialize(self.buf, self._dataset(name, group))


def read_attrs(buf: bytes, name: str, group: str | None = None) -> dict:
    path = f"{group.rstrip('/')}/{name}" if group else name
    return _parse_dataset(buf, _resolve(buf, path)).attrs


def list_datasets(buf: bytes, group: str | None = None) -> list[str]:
    addr = _resolve(buf, group or "/")
    return sorted(list_children(buf, addr))


def read_variable(buf: bytes, name: str, group: str | None = None):
    """Return (numpy array in native byte order, fill_value | None) —
    the same contract as ``netcdf_classic.read_variable``, with netCDF-4
    group addressing."""
    path = f"{group.rstrip('/')}/{name}" if group else name
    return _materialize(buf, _parse_dataset(buf, _resolve(buf, path)))


def _materialize(buf: bytes, ds: _Dataset):
    dt = ds.dtype.numpy()
    n = int(np.prod(ds.dims)) if ds.dims else 1
    if ds.layout_class == 0:
        arr = np.frombuffer(ds._compact, dtype=dt, count=n).reshape(ds.dims)
    elif ds.layout_class == 1:
        if ds.data_addr == UNDEF:
            arr = np.full(ds.dims, 0, dtype=dt)
            if ds.fill is not None:
                arr = np.frombuffer(
                    ds.fill * n, dtype=dt, count=n
                ).reshape(ds.dims)
        else:
            arr = np.frombuffer(
                buf, dtype=dt, count=n, offset=ds.data_addr
            ).reshape(ds.dims)
    else:
        chunks = _chunk_entries(buf, ds, dt)
        if ds.fill is not None and len(ds.fill) == dt.itemsize:
            arr = np.full(
                ds.dims, np.frombuffer(ds.fill, dtype=dt)[0], dtype=dt
            )
        else:
            arr = np.zeros(ds.dims, dtype=dt)
        for coords, size, mask, addr in chunks:
            raw = _apply_filters(
                bytes(buf[addr : addr + size]), ds.filters, mask, dt.itemsize
            )
            chunk = np.frombuffer(raw, dtype=dt).reshape(ds.chunk_dims)
            sel = tuple(
                slice(c, min(c + cd, d))
                for c, cd, d in zip(coords, ds.chunk_dims, ds.dims)
            )
            chunk_sel = tuple(
                slice(0, s.stop - s.start) for s in sel
            )
            arr[sel] = chunk[chunk_sel]
    fill = None
    if "_FillValue" in ds.attrs:
        v = ds.attrs["_FillValue"]
        fill = v if np.isscalar(v) or isinstance(v, str) else v.reshape(-1)[0]
    elif ds.fill is not None and len(ds.fill) == dt.itemsize:
        fill = np.frombuffer(ds.fill, dtype=dt)[0]
    out = np.ascontiguousarray(arr)
    if out.dtype.byteorder == ">":
        out = out.astype(out.dtype.newbyteorder("="))
    return out, fill


# ---------------------------------------------------------------------------
# minimal writer (fixtures)
# ---------------------------------------------------------------------------


class _Arena:
    def __init__(self):
        self.buf = bytearray()

    def alloc(self, data: bytes, align: int = 8) -> int:
        while len(self.buf) % align:
            self.buf += b"\x00"
        addr = len(self.buf)
        self.buf += data
        return addr

    def patch(self, addr: int, data: bytes) -> None:
        self.buf[addr : addr + len(data)] = data


def _dt_message(dtype: np.dtype) -> bytes:
    dtype = np.dtype(dtype)
    big = dtype.byteorder == ">"
    if dtype.kind in "iu":
        bits0 = (0x01 if big else 0) | (0x08 if dtype.kind == "i" else 0)
        head = bytes([0x10 | 0, bits0, 0, 0]) + struct.pack("<I", dtype.itemsize)
        return head + struct.pack("<HH", 0, dtype.itemsize * 8)
    if dtype.kind == "f":
        # IEEE: bit field byte0 = byte order | implied-msb normalization
        # (0x20), byte1 = sign bit location (31 / 63)
        bits0 = (0x01 if big else 0) | 0x20
        sign_loc = 31 if dtype.itemsize == 4 else 63
        head = bytes([0x10 | 1, bits0, sign_loc, 0]) + struct.pack(
            "<I", dtype.itemsize
        )
        if dtype.itemsize == 4:
            prop = struct.pack("<HHBBBBi", 0, 32, 23, 8, 0, 23, 127)
        elif dtype.itemsize == 8:
            prop = struct.pack("<HHBBBBi", 0, 64, 52, 11, 0, 52, 1023)
        else:
            raise ValueError("only f4/f8 supported")
        return head + prop
    if dtype.kind == "S":
        head = bytes([0x10 | 3, 0, 0, 0]) + struct.pack("<I", dtype.itemsize)
        return head
    raise ValueError(f"unsupported dtype {dtype}")


def _ds_message(shape: tuple[int, ...]) -> bytes:
    out = bytes([1, len(shape), 0, 0, 0, 0, 0, 0])
    for d in shape:
        out += struct.pack("<Q", d)
    return out


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _attr_message(name: str, value) -> bytes:
    if isinstance(value, str):
        data = value.encode() + b"\x00"
        dt = np.dtype(f"S{len(data)}")
        arr = np.frombuffer(data, dtype=dt)
        dims: tuple[int, ...] = ()
    else:
        arr = np.atleast_1d(np.asarray(value))
        dt = arr.dtype
        dims = () if np.isscalar(value) or np.asarray(value).ndim == 0 else arr.shape
    nameb = name.encode() + b"\x00"
    dtm = _dt_message(dt)
    dsm = _ds_message(dims)
    body = struct.pack("<BBHHH", 1, 0, len(nameb), len(dtm), len(dsm))
    body += _pad8(nameb) + _pad8(dtm) + _pad8(dsm) + arr.tobytes()
    return body


def _object_header_v1(messages: list[tuple[int, bytes]]) -> bytes:
    block = b""
    for mtype, body in messages:
        body = _pad8(body)
        block += struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body
    return (
        struct.pack("<BBHII", 1, 0, len(messages), 1, len(block))
        + b"\x00" * 4
        + block
    )


def _emit_dense_group(arena: "_Arena", children: dict[str, int]) -> int:
    """Emit a dense-storage group: serialized Link messages in a
    fractal heap (single root direct block), a v2 B-tree name index
    (single leaf, node size grown to fit — a creation parameter, so
    spec-legal), and an object header carrying the Link Info message.
    All v2 metadata checksums are real Jenkins lookup3."""
    objs: dict[str, bytes] = {}
    for name, addr in children.items():
        nameb = name.encode()
        if len(nameb) > 255:
            raise ValueError(f"link name too long: {name!r}")
        objs[name] = (
            bytes([1, 0, len(nameb)]) + nameb + struct.pack("<Q", addr)
        )

    off_size, len_size = 4, 2  # max heap size 32 bits, max managed 4096
    dblk_hdr = 4 + 1 + 8 + off_size
    total = dblk_hdr + sum(len(b) for b in objs.values())
    block_size = 1 << max(9, (total - 1).bit_length())

    frhp_len = 146  # fixed-width FRHP incl. checksum, no filters
    frhp_addr = arena.alloc(b"\x00" * frhp_len)

    dblk = bytearray(b"FHDB")
    dblk += bytes([0]) + struct.pack("<Q", frhp_addr)
    dblk += (0).to_bytes(off_size, "little")  # block offset in heap
    heap_ids: dict[str, bytes] = {}
    for name in sorted(objs):
        off_in_heap = len(dblk)
        dblk += objs[name]
        heap_ids[name] = (
            bytes([0x00])  # version 0, managed
            + off_in_heap.to_bytes(off_size, "little")
            + len(objs[name]).to_bytes(len_size, "little")
        )
    dblk += b"\x00" * (block_size - len(dblk))
    dblk_addr = arena.alloc(bytes(dblk))

    frhp = bytearray(b"FRHP")
    frhp += bytes([0])  # version
    frhp += struct.pack("<H", 1 + off_size + len_size)  # heap ID length
    frhp += struct.pack("<H", 0)  # I/O filters encoded length
    frhp += bytes([0])  # flags
    frhp += struct.pack("<I", 4096)  # max size of managed objects
    frhp += struct.pack("<Q", 0)  # next huge object id
    frhp += struct.pack("<Q", UNDEF)  # huge-object v2 B-tree
    frhp += struct.pack("<Q", block_size - total)  # free space
    frhp += struct.pack("<Q", UNDEF)  # free-space manager
    frhp += struct.pack("<Q", block_size)  # managed space
    frhp += struct.pack("<Q", block_size)  # allocated managed space
    frhp += struct.pack("<Q", total)  # direct-block iterator offset
    frhp += struct.pack("<Q", len(objs))  # managed objects
    frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes+counts
    frhp += struct.pack("<H", 4)  # table width
    frhp += struct.pack("<Q", block_size)  # starting block size
    frhp += struct.pack("<Q", block_size)  # max direct block size
    frhp += struct.pack("<H", 32)  # max heap size (bits)
    frhp += struct.pack("<H", 1)  # starting rows in root indirect
    frhp += struct.pack("<Q", dblk_addr)  # root block (direct)
    frhp += struct.pack("<H", 0)  # current rows (0 = root is direct)
    frhp += struct.pack("<I", lookup3(bytes(frhp)))
    assert len(frhp) == frhp_len
    arena.patch(frhp_addr, bytes(frhp))

    rec_size = 4 + 1 + off_size + len_size
    recs = sorted((lookup3(n.encode()), heap_ids[n]) for n in objs)
    leaf = bytearray(b"BTLF") + bytes([0, 5])  # version, type 5 (links)
    for h, hid in recs:
        leaf += struct.pack("<I", h) + hid
    leaf += struct.pack("<I", lookup3(bytes(leaf)))
    leaf_addr = arena.alloc(bytes(leaf))

    node_size = 1 << max(9, (10 + len(recs) * rec_size - 1).bit_length())
    bthd = bytearray(b"BTHD") + bytes([0, 5])
    bthd += struct.pack("<I", node_size)
    bthd += struct.pack("<H", rec_size)
    bthd += struct.pack("<H", 0)  # depth
    bthd += bytes([100, 40])  # split / merge percent
    bthd += struct.pack("<Q", leaf_addr)
    bthd += struct.pack("<H", len(recs))
    bthd += struct.pack("<Q", len(recs))
    bthd += struct.pack("<I", lookup3(bytes(bthd)))
    bthd_addr = arena.alloc(bytes(bthd))

    link_info = bytes([0, 0]) + struct.pack("<QQ", frhp_addr, bthd_addr)
    return arena.alloc(_object_header_v1([(0x0002, link_info)]))


def _fill_message(fill: bytes | None) -> bytes:
    if fill is None:
        return struct.pack("<BBBB", 2, 2, 2, 0)
    return struct.pack("<BBBB", 2, 2, 2, 1) + struct.pack("<I", len(fill)) + fill


def write_hdf5(
    variables: dict[str, tuple[np.ndarray, dict]],
    chunks: dict[str, tuple[int, ...]] | None = None,
    compress: bool = True,
    nbit: dict[str, tuple[int, int]] | None = None,
    extra_filters: dict[str, list[tuple[int, tuple[int, ...]]]] | None = None,
    szip: dict[str, tuple[int, int]] | None = None,
) -> bytes:
    """Emit a minimal v0-superblock HDF5 file.  ``variables`` maps a
    path (``"name"`` or ``"group/sub/name"``) to (array, attrs); paths
    create intermediate groups.  Datasets listed in ``chunks`` are
    written chunked (+deflate when ``compress``), others contiguous.
    ``nbit`` maps a chunked path to (precision_bits, offset_bits): its
    chunks are n-bit packed (filter id 5) BEFORE deflate, exercising
    multi-filter reverse-order decode.  ``extra_filters`` records
    additional filter ids in the pipeline message WITHOUT transforming
    bytes — fixture-only, for proving named unsupported-filter errors
    on the read path.  ``szip`` maps a chunked path to
    (pixels_per_block, pixels_per_scanline): its chunks are compressed
    with the CCSDS-121 extended-Rice coder (filter id 4, H5Zszip
    framing, NN+LSB+RAW options) INSTEAD of deflate — bits_per_pixel =
    the dtype width, covering the 8/16/32-bit integer and f32 NASA
    granule forms.  Fixture-scoped: one SNOD per group
    (<= 8 entries, the v0 leaf-k bound) and a single-leaf chunk B-tree
    per dataset."""
    chunks = chunks or {}
    nbit = nbit or {}
    extra_filters = extra_filters or {}
    szip = szip or {}
    arena = _Arena()
    arena.alloc(b"\x00" * 96)  # superblock placeholder

    # group tree from paths
    tree: dict = {}
    for path, payload in variables.items():
        parts = [p for p in path.split("/") if p]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"{path}: {p} is both dataset and group")
        node[parts[-1]] = payload

    def emit_dataset(path: str, arr: np.ndarray, attrs: dict) -> int:
        arr = np.ascontiguousarray(arr)
        msgs = [
            (0x0001, _ds_message(arr.shape)),
            (0x0003, _dt_message(arr.dtype)),
            (0x0005, _fill_message(None)),
        ]
        cdims = chunks.get(path)
        if cdims is None:
            data_addr = arena.alloc(arr.tobytes())
            layout = struct.pack(
                "<BBQQ", 3, 1, data_addr, arr.nbytes
            )
            msgs.append((0x0008, layout))
        else:
            if len(cdims) != arr.ndim:
                raise ValueError(f"{path}: chunk rank != array rank")
            nb = nbit.get(path)
            entries = []
            grid = [
                range(0, d, c) for d, c in zip(arr.shape, cdims)
            ]
            for coords in itertools.product(*grid):
                sel = tuple(
                    slice(c, min(c + cd, d))
                    for c, cd, d in zip(coords, cdims, arr.shape)
                )
                block = np.zeros(cdims, dtype=arr.dtype)
                blocksel = tuple(
                    slice(0, s.stop - s.start) for s in sel
                )
                block[blocksel] = arr[sel]
                raw = block.tobytes()
                if nb is not None:
                    raw = _nbit_encode(block, nb[0], nb[1])
                sz = szip.get(path)
                if sz is not None:
                    from cloud_optimized_data_pipelines_spark.operators.rice_codec import (  # noqa: E501
                        rice_encode,
                    )

                    width = arr.dtype.itemsize
                    samples = np.frombuffer(
                        raw, dtype=np.dtype(f"<u{width}")
                    ).astype(np.int64)
                    enc = rice_encode(samples, 8 * width, sz[0], sz[1])
                    raw = struct.pack("<I", len(raw)) + enc
                elif compress:
                    raw = zlib.compress(raw, 6)
                addr = arena.alloc(raw)
                entries.append((coords, len(raw), addr))
            # single leaf chunk-index B-tree node
            ndim = arr.ndim
            key_size = 8 + 8 * (ndim + 1)
            node = b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
            node += struct.pack("<QQ", UNDEF, UNDEF)
            for coords, size, addr in entries:
                node += struct.pack("<II", size, 0)
                for c in coords:
                    node += struct.pack("<Q", c)
                node += struct.pack("<Q", 0)  # elem-offset key slot
                node += struct.pack("<Q", addr)
            # final key (past-the-end)
            node += struct.pack("<II", 0, 0)
            for d in arr.shape:
                node += struct.pack("<Q", d)
            node += struct.pack("<Q", 0)
            btree_addr = arena.alloc(node)
            layout = struct.pack("<BBB", 3, 2, ndim + 1) + struct.pack(
                "<Q", btree_addr
            )
            for c in cdims:
                layout += struct.pack("<I", c)
            layout += struct.pack("<I", arr.dtype.itemsize)
            msgs.append((0x0008, layout))
            fentries: list[tuple[int, int, tuple[int, ...]]] = []
            for efid, ecvs in extra_filters.get(path, []):
                fentries.append((efid, 0, tuple(ecvs)))
            if nb is not None:
                # H5Znbit atomic client data: valid count, skip flag,
                # elements/chunk, ATOMIC tag, size, LE order,
                # precision, offset
                order = 1 if arr.dtype.byteorder == ">" else 0
                fentries.append(
                    (
                        5,
                        0,
                        (
                            8,
                            0,
                            int(np.prod(cdims)),
                            1,
                            arr.dtype.itemsize,
                            order,
                            nb[0],
                            nb[1],
                        ),
                    )
                )
            sz = szip.get(path)
            if sz is not None:
                # options = SZ_NN | SZ_LSB | SZ_RAW = 0x20 | 0x08 | 0x80
                fentries.append(
                    (4, 0, (0xA8, 8 * arr.dtype.itemsize, sz[0], sz[1]))
                )
            elif compress:
                fentries.append((1, 1, (6,)))
            if fentries:
                body = struct.pack("<BBHI", 1, len(fentries), 0, 0)
                for ffid, fflags, fcvs in fentries:
                    body += struct.pack(
                        "<HHHH", ffid, 0, fflags, len(fcvs)
                    )
                    for cv in fcvs:
                        body += struct.pack("<I", cv)
                    if len(fcvs) % 2:
                        body += struct.pack("<I", 0)
                msgs.append((0x000B, body))
        for k, v in attrs.items():
            msgs.append((0x000C, _attr_message(k, v)))
        return arena.alloc(_object_header_v1(msgs))

    def emit_group(node: dict, path: str) -> int:
        children: dict[str, int] = {}
        for name, payload in node.items():
            sub = f"{path}/{name}" if path else name
            if isinstance(payload, dict):
                children[name] = emit_group(payload, sub)
            else:
                arr, attrs = payload
                children[name] = emit_dataset(sub, np.asarray(arr), attrs)
        if len(children) > 8:
            # past the v0 single-SNOD bound: emit DENSE link storage
            # (fractal heap + v2 name-index B-tree) — the layout real
            # HDF-EOS5 granules use for link-heavy groups
            header_addr = _emit_dense_group(arena, children)
            if path == "":
                emit_group.root = (header_addr, UNDEF, UNDEF)
            return header_addr
        # local heap: offset 0 reserved for the empty string
        heap_data = bytearray(b"\x00" * 8)
        name_offs = {}
        for name in sorted(children):
            name_offs[name] = len(heap_data)
            heap_data += name.encode() + b"\x00"
            while len(heap_data) % 8:
                heap_data += b"\x00"
        heap = (
            b"HEAP"
            + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", len(heap_data), UNDEF, 0)
        )
        heap_addr = arena.alloc(heap)
        seg_addr = arena.alloc(bytes(heap_data))
        arena.patch(heap_addr + 24, struct.pack("<Q", seg_addr))
        # SNOD with entries sorted by name
        snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(children))
        for name in sorted(children):
            snod += struct.pack(
                "<QQII", name_offs[name], children[name], 0, 0
            )
            snod += b"\x00" * 16
        snod_addr = arena.alloc(snod)
        # B-tree: one leaf entry
        bt = b"TREE" + struct.pack("<BBH", 0, 0, 1)
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        last = max(name_offs.values()) if name_offs else 0
        bt += struct.pack("<QQQ", 0, snod_addr, last)
        btree_addr = arena.alloc(bt)
        header = _object_header_v1(
            [(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
        )
        header_addr = arena.alloc(header)
        if path == "":
            emit_group.root = (header_addr, btree_addr, heap_addr)
        return header_addr

    emit_group(tree, "")
    root_header, root_btree, root_heap = emit_group.root

    sb = MAGIC
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, len(arena.buf), UNDEF)
    # root group symbol table entry (cache type 1 caches the btree/heap
    # addrs; a dense root has neither -> cache type 0, zero scratch)
    if root_btree == UNDEF:
        sb += struct.pack("<QQII", 0, root_header, 0, 0)
        sb += struct.pack("<QQ", 0, 0)
    else:
        sb += struct.pack("<QQII", 0, root_header, 1, 0)
        sb += struct.pack("<QQ", root_btree, root_heap)
    assert len(sb) == 96
    arena.patch(0, sb)
    return bytes(arena.buf)
