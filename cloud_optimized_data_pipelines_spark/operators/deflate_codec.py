"""Pure-python DEFLATE / gzip / zlib codec — RFC 1951/1952/1950 from
the public spec text, with an IN-CONTAINER conformance cross-check
(stdlib ``zlib`` is the canonical implementation, so unlike the other
codec modules this one is verified against the reference coder in both
directions — the strongest conformance story in the repo).

Why this exists: web-crawl corpora — the dominant LLM training input —
ship as WARC.gz (ISO 28500 records, one gzip MEMBER per record, the
Common Crawl layout).  ``sources/warc.py`` builds on this module to
split members and parse records entirely inside Arrow batches; this
module owns the byte-level formats.

Everything here is DERIVED, not transcribed, where the RFC permits:

- canonical Huffman codes from code lengths (RFC 1951 3.2.2 — the
  published two-step algorithm, itself a derivation rule);
- the fixed-Huffman code lengths (3.2.6: 8 bits for literals 0-143,
  9 for 144-255, 7 for 256-279, 8 for 280-287; distances all 5);
- the length-code table (codes 257-285 -> base length / extra bits)
  and distance-code table (0-29 -> base distance / extra bits) are
  built by ACCUMULATION from their extra-bit progression (extra =
  (code-261)//4 for 265<=code<285, (code-2)//2 for dist codes >= 4),
  which reproduces every row of the RFC 3.2.5 tables;
- CRC-32 (poly 0xEDB88320, reflected, table built at import) and
  Adler-32 (mod 65521) from their definitions — both asserted against
  ``zlib.crc32`` / ``zlib.adler32`` in tests.

The one transcribed constant is the code-length-code ORDER
(16 17 18 0 8 7 9 6 10 5 11 4 12 3 13 2 14 1 15, RFC 1951 3.2.7) —
a fixed permutation with no closed form.

Decoder: all three block types (stored / fixed / dynamic), flat
lookup-table Huffman decode (2^maxbits entries, one peek per symbol),
full 32 KiB back-reference window across block boundaries.

Encoder: greedy hash-chain LZ77 (3-byte insert hash, 32 KiB window,
matches 3..258) into fixed-Huffman blocks, with a stored-block
fallback when incompressible; the output is standard DEFLATE any
inflater accepts (``zlib.decompressobj(-15)`` round-trips it in the
tests).  Greedy-without-lazy is a documented ratio tradeoff, not a
conformance one.

gzip (RFC 1952): member encode/decode incl. FNAME/FCOMMENT/FEXTRA/
FHCRC parsing, CRC-32 + ISIZE trailer verification, and the
MULTI-MEMBER walk (``gzip_members``) that the WARC.gz record split
rides — each member's (offset, compressed size, payload) comes back
so callers can index records inside a crawl file without decompressing
the whole object.

zlib (RFC 1950): 2-byte header + Adler-32 trailer around the same
deflate body.

No reference-repo counterpart (the reference shells out to runtime
layers for IO); this is extension surface for the training-data
pipeline, like the other codec modules.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

# ---------------------------------------------------------------------------
# CRC-32 / Adler-32 (derived; asserted against stdlib zlib in tests)
# ---------------------------------------------------------------------------

_CRC_POLY = 0xEDB88320


def _crc_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(_CRC_POLY), t >> 1)
    return t


_CRC_TABLE = _crc_table()


def crc32(data: bytes, crc: int = 0) -> int:
    """Reflected CRC-32 (IEEE 802.3 polynomial), byte-table driven."""
    c = np.uint32(crc ^ 0xFFFFFFFF)
    for b in np.frombuffer(data, dtype=np.uint8):
        c = _CRC_TABLE[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint8(8))
    return int(c ^ np.uint32(0xFFFFFFFF))


def adler32(data: bytes, value: int = 1) -> int:
    """Adler-32 (RFC 1950 8.2): s1/s2 mod 65521, vectorized via the
    prefix identity s2 = n*s1_0 + sum((n-i)*d_i)."""
    s1 = value & 0xFFFF
    s2 = (value >> 16) & 0xFFFF
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    # Chunk so the weighted sum stays far from int64 overflow.
    step = 1 << 20
    for off in range(0, len(arr), step):
        d = arr[off : off + step]
        n = len(d)
        w = np.arange(n, 0, -1, dtype=np.int64)
        s2 = (s2 + n * s1 + int(np.dot(w, d))) % 65521
        s1 = (s1 + int(d.sum())) % 65521
    return (s2 << 16) | s1


# ---------------------------------------------------------------------------
# RFC 1951 tables, derived by accumulation
# ---------------------------------------------------------------------------


def _length_table() -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(base_length, extra_bits) for length codes 257..285."""
    bases, extras = [], []
    length = 3
    for code in range(257, 285):
        extra = 0 if code < 265 else (code - 261) // 4
        bases.append(length)
        extras.append(extra)
        length += 1 << extra
    bases.append(258)  # code 285: maximum match, no extra bits
    extras.append(0)
    return tuple(bases), tuple(extras)


def _distance_table() -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(base_distance, extra_bits) for distance codes 0..29."""
    bases, extras = [], []
    dist = 1
    for code in range(30):
        extra = 0 if code < 4 else (code - 2) // 2
        bases.append(dist)
        extras.append(extra)
        dist += 1 << extra
    return tuple(bases), tuple(extras)


LENGTH_BASE, LENGTH_EXTRA = _length_table()
DIST_BASE, DIST_EXTRA = _distance_table()

# RFC 1951 3.2.7: the one fixed permutation with no closed form.
CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
             14, 1, 15)

# Fixed-Huffman code lengths (RFC 1951 3.2.6), derived from the spans.
FIXED_LIT_LENGTHS = tuple(
    8 if s < 144 else 9 if s < 256 else 7 if s < 280 else 8
    for s in range(288)
)
FIXED_DIST_LENGTHS = (5,) * 30


# ---------------------------------------------------------------------------
# Canonical Huffman (RFC 1951 3.2.2)
# ---------------------------------------------------------------------------


def canonical_codes(lengths) -> list[tuple[int, int]]:
    """(code, nbits) per symbol from code lengths — the RFC's two-step
    construction.  Codes are MSB-first integers (as the RFC writes
    them); the bitstream packs them most-significant-bit first within
    the LSB-first byte stream (RFC 1951 3.1.1)."""
    lengths = list(lengths)
    maxbits = max(lengths) if lengths else 0
    bl_count = [0] * (maxbits + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxbits + 1)
    for bits in range(1, maxbits + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = []
    for ln in lengths:
        if ln:
            out.append((next_code[ln], ln))
            next_code[ln] += 1
        else:
            out.append((0, 0))
    return out


def _decode_table(lengths) -> tuple[np.ndarray, int]:
    """Flat (sym << 4 | len) lookup table of size 2^maxbits, indexed
    by maxbits REVERSED-peeked bits: Huffman codes enter the stream
    MSB-first, so a natural LSB-first peek sees them bit-reversed —
    the table is built on the reversed index so decode is one peek +
    one load per symbol."""
    maxbits = max(lengths)
    if maxbits == 0:
        raise ValueError("deflate: empty Huffman alphabet")
    size = 1 << maxbits
    table = np.zeros(size, dtype=np.int64)
    for sym, (code, nbits) in enumerate(canonical_codes(lengths)):
        if not nbits:
            continue
        rev = int(f"{code:0{nbits}b}"[::-1], 2)
        step = 1 << nbits
        entry = (sym << 4) | nbits
        table[rev:size:step] = entry
    return table, maxbits


# ---------------------------------------------------------------------------
# INFLATE
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader with multi-bit peek (RFC 1951 3.1.1).

    Over-peek past the end of ``data`` is allowed (virtual zero
    padding — any valid stream's symbols end on real bits), and
    ``virt`` tracks those padding bytes so :meth:`byte_pos` reports
    the EXACT consumed-bit boundary: a final end-of-block code may
    end anywhere inside the last byte, and the container (gzip
    trailer, next member) resumes at the next byte boundary after
    the last CONSUMED bit — not after the last buffered byte."""

    __slots__ = ("data", "pos", "virt", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.virt = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self, need: int) -> None:
        while self.bitcnt < need:
            if self.pos >= len(self.data):
                self.virt += 1
                self.bitcnt += 8
                continue
            self.bitbuf |= self.data[self.pos] << self.bitcnt
            self.pos += 1
            self.bitcnt += 8

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.bitbuf & ((1 << n) - 1)

    def drop(self, n: int) -> None:
        self.bitbuf >>= n
        self.bitcnt -= n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.drop(n)
        return v

    def byte_pos(self) -> int:
        """First byte at/after the last consumed bit (ceil to a byte
        boundary).  Exact even when the bit buffer holds real or
        virtual look-ahead."""
        consumed_bits = (self.pos + self.virt) * 8 - self.bitcnt
        return (consumed_bits + 7) // 8


def _read_dynamic_header(br: _BitReader) -> tuple[list[int], list[int]]:
    hlit = br.read(5) + 257
    hdist = br.read(5) + 1
    hclen = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[CLC_ORDER[i]] = br.read(3)
    cl_table, cl_max = _decode_table(cl_lengths)
    mask = (1 << cl_max) - 1
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        entry = int(cl_table[br.peek(cl_max) & mask])
        nbits = entry & 15
        if not nbits:
            raise ValueError("deflate: invalid code-length code")
        br.drop(nbits)
        sym = entry >> 4
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("deflate: repeat with no prior length")
            lengths.extend([lengths[-1]] * (3 + br.read(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:
            lengths.extend([0] * (11 + br.read(7)))
    if len(lengths) != hlit + hdist:
        raise ValueError("deflate: code-length overrun")
    return lengths[:hlit], lengths[hlit:]


def inflate(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode one raw DEFLATE stream starting at byte ``pos``.

    Returns ``(payload, end_pos)`` where ``end_pos`` is the first byte
    after the stream (the final block is byte-align-rounded), so
    callers can walk concatenated streams (gzip members).
    """
    br = _BitReader(data, pos)
    out = bytearray()
    while True:
        bfinal = br.read(1)
        btype = br.read(2)
        if btype == 0:  # stored
            p = br.byte_pos()
            if p + 4 > len(data):
                raise ValueError("deflate: truncated stored header")
            ln, nln = struct.unpack_from("<HH", data, p)
            if ln ^ nln != 0xFFFF:
                raise ValueError("deflate: stored LEN/NLEN mismatch")
            if p + 4 + ln > len(data):
                raise ValueError("deflate: truncated stored block")
            out += data[p + 4 : p + 4 + ln]
            br = _BitReader(data, p + 4 + ln)
        elif btype in (1, 2):
            if btype == 1:
                lit_len = FIXED_LIT_LENGTHS
                dist_len = FIXED_DIST_LENGTHS
            else:
                lit_len, dist_len = _read_dynamic_header(br)
            lit_table, lit_max = _decode_table(lit_len)
            # A block may use length codes only (dist alphabet of one
            # zero-length entry is legal when no matches occur).
            have_dist = any(dist_len)
            if have_dist:
                dist_table, dist_max = _decode_table(dist_len)
            while True:
                entry = int(lit_table[br.peek(lit_max)])
                nbits = entry & 15
                if not nbits:
                    raise ValueError("deflate: invalid literal code")
                br.drop(nbits)
                sym = entry >> 4
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError("deflate: bad length code")
                    idx = sym - 257
                    length = LENGTH_BASE[idx] + br.read(LENGTH_EXTRA[idx])
                    if not have_dist:
                        raise ValueError(
                            "deflate: match with empty distance alphabet"
                        )
                    dentry = int(dist_table[br.peek(dist_max)])
                    dbits = dentry & 15
                    if not dbits:
                        raise ValueError("deflate: invalid distance code")
                    br.drop(dbits)
                    dsym = dentry >> 4
                    if dsym > 29:
                        raise ValueError("deflate: bad distance code")
                    dist = DIST_BASE[dsym] + br.read(DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("deflate: distance before start")
                    start = len(out) - dist
                    if dist >= length:
                        out += out[start : start + length]
                    else:  # overlapping copy: byte-serial semantics
                        for i in range(length):
                            out.append(out[start + i])
        else:
            raise ValueError("deflate: reserved block type 3")
        if bfinal:
            break
    return bytes(out), br.byte_pos()


# ---------------------------------------------------------------------------
# DEFLATE encode: greedy hash-chain LZ77 -> fixed-Huffman / stored
# ---------------------------------------------------------------------------

_MIN_MATCH = 3
_MAX_MATCH = 258
_WINDOW = 32768
_MAX_CHAIN = 64


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, value: int, n: int) -> None:
        """LSB-first field (extra bits, block headers)."""
        self.bitbuf |= value << self.bitcnt
        self.bitcnt += n
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8

    def code(self, code: int, n: int) -> None:
        """Huffman codeword: MSB of the code enters the stream first."""
        rev = int(f"{code:0{n}b}"[::-1], 2) if n else 0
        self.bits(rev, n)

    def align(self) -> None:
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.bitcnt = 0


def _length_code(length: int) -> tuple[int, int, int]:
    """(code, extra_value, extra_bits) for a match length 3..258."""
    if length == 258:
        return 285, 0, 0
    # Invert the accumulation: find the span containing `length`.
    for idx in range(28):
        if LENGTH_BASE[idx] <= length < LENGTH_BASE[idx] + (
            1 << LENGTH_EXTRA[idx]
        ):
            return 257 + idx, length - LENGTH_BASE[idx], LENGTH_EXTRA[idx]
    raise ValueError(f"deflate: bad match length {length}")


def _dist_code(dist: int) -> tuple[int, int, int]:
    for idx in range(30):
        if DIST_BASE[idx] <= dist < DIST_BASE[idx] + (1 << DIST_EXTRA[idx]):
            return idx, dist - DIST_BASE[idx], DIST_EXTRA[idx]
    raise ValueError(f"deflate: bad match distance {dist}")


def _lz77(data: bytes, window: int = _WINDOW,
          max_match: int = _MAX_MATCH) -> list[tuple[int, int]]:
    """Greedy tokenization: (literal_byte, 0) or (length, distance).
    ``window``/``max_match`` default to the DEFLATE limits; the zstd
    path passes its larger block-sized window and unbounded match
    cap."""
    n = len(data)
    head: dict[int, list[int]] = {}
    tokens: list[tuple[int, int]] = []
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + _MIN_MATCH <= n:
            key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            chain = head.get(key)
            if chain:
                floor = i - window
                tried = 0
                for j in reversed(chain):
                    if j < floor or tried >= _MAX_CHAIN:
                        break
                    tried += 1
                    limit = min(max_match, n - i)
                    m = 0
                    while m < limit and data[j + m] == data[i + m]:
                        m += 1
                    if m > best_len:
                        best_len, best_dist = m, i - j
                        if m == max_match:
                            break
            head.setdefault(key, []).append(i)
        if best_len >= _MIN_MATCH:
            tokens.append((best_len, best_dist))
            # Insert hash entries inside the match (sparse: every
            # position, capped lists keep memory linear).
            for p in range(i + 1, min(i + best_len, n - _MIN_MATCH + 1)):
                k = data[p] | (data[p + 1] << 8) | (data[p + 2] << 16)
                lst = head.setdefault(k, [])
                lst.append(p)
                if len(lst) > 4 * _MAX_CHAIN:
                    del lst[: 2 * _MAX_CHAIN]
            i += best_len
        else:
            tokens.append((data[i], 0))
            i += 1
    return tokens


def deflate(data: bytes) -> bytes:
    """Encode to a raw DEFLATE stream (fixed-Huffman single block,
    with a stored-block fallback when that would be smaller)."""
    lit_codes = canonical_codes(FIXED_LIT_LENGTHS)
    dist_codes = canonical_codes(FIXED_DIST_LENGTHS)
    bw = _BitWriter()
    bw.bits(1, 1)  # BFINAL
    bw.bits(1, 2)  # fixed Huffman
    for a, b in _lz77(data):
        if b == 0:
            c, n = lit_codes[a]
            bw.code(c, n)
        else:
            lcode, lval, lbits = _length_code(a)
            c, n = lit_codes[lcode]
            bw.code(c, n)
            if lbits:
                bw.bits(lval, lbits)
            dcode, dval, dbits = _dist_code(b)
            c, n = dist_codes[dcode]
            bw.code(c, n)
            if dbits:
                bw.bits(dval, dbits)
    c, n = lit_codes[256]
    bw.code(c, n)
    bw.align()
    body = bytes(bw.out)
    stored = _deflate_stored(data)
    return stored if len(stored) < len(body) else body


def _deflate_stored(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while True:
        chunk = data[pos : pos + 0xFFFF]
        pos += len(chunk)
        final = 1 if pos >= n else 0
        out.append(final)  # BFINAL + BTYPE=00, byte-aligned
        out += struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
        out += chunk
        if final:
            break
    return bytes(out)


# ---------------------------------------------------------------------------
# gzip members (RFC 1952)
# ---------------------------------------------------------------------------

_GZ_MAGIC = b"\x1f\x8b"
_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def gzip_encode(payload: bytes, name: str | None = None,
                mtime: int = 0, engine: str = "c") -> bytes:
    """One gzip member (OS byte 255 = unknown, per the RFC's
    recommendation for portable writers).

    ``engine="c"`` (default) compresses the body with stdlib zlib —
    the hot path, same call png_codec.py makes for IDAT; ``"pure"``
    uses this module's from-scratch :func:`deflate`.  Both produce
    standard members any gunzip accepts; tests pin cross-engine
    decode equality."""
    flg = _FNAME if name else 0
    head = _GZ_MAGIC + bytes([8, flg]) + struct.pack("<I", mtime) + b"\x00\xff"
    if name:
        head += name.encode("latin-1") + b"\x00"
    if engine == "c":
        body = _zlib.compress(payload, 6)[2:-4]
        check = _zlib.crc32(payload)  # C CRC on the C path
    elif engine == "pure":
        body = deflate(payload)
        check = crc32(payload)
    else:
        raise ValueError(f"gzip: unknown engine {engine!r}")
    return (
        head
        + body
        + struct.pack("<II", check, len(payload) & 0xFFFFFFFF)
    )


def gzip_decode_member(data: bytes, pos: int = 0,
                       engine: str = "c") -> dict:
    """Decode ONE member at ``pos``; returns payload + header fields +
    ``end`` (offset after the trailer) for the multi-member walk.

    ``engine="c"`` (default) inflates with stdlib zlib (C speed — the
    100 TB ingest path; ~3 orders faster than symbol-at-a-time python
    and itself the RFC 1951 reference coder); ``"pure"`` uses this
    module's :func:`inflate`, proven byte-identical in tests."""
    if data[pos : pos + 2] != _GZ_MAGIC:
        raise ValueError("gzip: bad magic")
    if data[pos + 2] != 8:
        raise ValueError(f"gzip: unknown compression method {data[pos+2]}")
    flg = data[pos + 3]
    if flg & 0xE0:
        raise ValueError("gzip: reserved FLG bits set")
    (mtime,) = struct.unpack_from("<I", data, pos + 4)
    p = pos + 10
    if flg & _FEXTRA:
        (xlen,) = struct.unpack_from("<H", data, p)
        p += 2 + xlen
    name = None
    if flg & _FNAME:
        end = data.index(b"\x00", p)
        name = data[p:end].decode("latin-1")
        p = end + 1
    if flg & _FCOMMENT:
        p = data.index(b"\x00", p) + 1
    if flg & _FHCRC:
        (hcrc,) = struct.unpack_from("<H", data, p)
        if hcrc != (crc32(data[pos:p]) & 0xFFFF):
            raise ValueError("gzip: header CRC mismatch")
        p += 2
    if engine == "c":
        # Feed bounded chunks off a memoryview: slicing the whole
        # remaining buffer per member (and its unused_data echo)
        # makes the multi-member walk O(n^2) bytes copied — fatal on
        # a crawl file with tens of thousands of record members.
        o = _zlib.decompressobj(-15)
        view = memoryview(data)
        out = []
        q = p
        chunk_size = 1 << 18
        while not o.eof:
            if q >= len(data):
                raise ValueError("gzip: truncated deflate stream")
            chunk = view[q : q + chunk_size]
            out.append(o.decompress(chunk))
            q += len(chunk)
        payload = b"".join(out)
        dend = q - len(o.unused_data)
    elif engine == "pure":
        payload, dend = inflate(data, p)
    else:
        raise ValueError(f"gzip: unknown engine {engine!r}")
    if dend + 8 > len(data):
        raise ValueError("gzip: truncated trailer")
    want_crc, isize = struct.unpack_from("<II", data, dend)
    got_crc = _zlib.crc32(payload) if engine == "c" else crc32(payload)
    if want_crc != got_crc:
        raise ValueError("gzip: payload CRC mismatch")
    if isize != (len(payload) & 0xFFFFFFFF):
        raise ValueError("gzip: ISIZE mismatch")
    return {
        "payload": payload,
        "name": name,
        "mtime": mtime,
        "offset": pos,
        "comp_size": dend + 8 - pos,
        "end": dend + 8,
    }


def gzip_members(data: bytes, engine: str = "c") -> list[dict]:
    """Walk ALL members of a concatenated gzip object (the WARC.gz
    layout: one member per record, so (offset, comp_size) doubles as
    a record index)."""
    members = []
    pos = 0
    while pos < len(data):
        m = gzip_decode_member(data, pos, engine=engine)
        members.append(m)
        pos = m["end"]
    return members


def gzip_decode(data: bytes, engine: str = "c") -> bytes:
    """All members concatenated — stdlib ``gzip.decompress`` semantics."""
    return b"".join(m["payload"] for m in gzip_members(data, engine=engine))


# ---------------------------------------------------------------------------
# zlib wrapper (RFC 1950)
# ---------------------------------------------------------------------------


def zlib_encode(payload: bytes) -> bytes:
    # CMF: CM=8, CINFO=7 (32K window). FLG: FCHECK so CMF<<8|FLG ≡ 0
    # (mod 31), no preset dictionary, level bits 0.
    cmf = 0x78
    flg = (31 - (cmf << 8) % 31) % 31
    return (
        bytes([cmf, flg])
        + deflate(payload)
        + struct.pack(">I", adler32(payload))
    )


def zlib_decode(data: bytes) -> bytes:
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: unknown compression method")
    if (cmf << 8 | flg) % 31:
        raise ValueError("zlib: FCHECK failed")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary unsupported")
    payload, end = inflate(data, 2)
    (want,) = struct.unpack_from(">I", data, end)
    if want != adler32(payload):
        raise ValueError("zlib: Adler-32 mismatch")
    return payload
