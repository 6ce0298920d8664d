"""Pure-python LZ4 frame codec — the LZ4 Frame Format (v1.6.x,
magic 0x184D2204) and the LZ4 block format, from the public format
descriptions, conformance-checked against the in-container reference
``lz4`` CLI in both directions (tests/test_lz4_codec.py).

LZ4 rounds out the training-data compression suite (gzip/DEFLATE in
deflate_codec.py, zstd in zstd_codec.py): it is the common choice for
shuffle/cache intermediates and fast-path corpus shards where decode
speed beats ratio.

Format, from the spec:

- frame: magic, FLG byte (version=01, block-independence, block
  checksum, content-size, content-checksum, dict-id flags), BD byte
  (block max size code 4-7 -> 64 KiB..4 MiB), optional 8-byte content
  size, optional 4-byte dict id, HC byte = (XXH32(descriptor) >> 8)
  & 0xFF;
- data blocks: 4-byte LE size with bit 31 = "uncompressed" flag,
  0x00000000 = EndMark; optional per-block XXH32; then the optional
  4-byte content checksum (XXH32 of the DECODED payload, seed 0);
- block format: a sequence of [token | extended literal length |
  literals | 2-byte LE offset | extended match length] where both
  4-bit token nibbles saturate at 15 and extend by 255-valued bytes;
  match length is nibble + 4 (minmatch); the LAST sequence is
  literals-only (no offset), and the spec's end-of-block restrictions
  (final 5 literals, match start >= 12 bytes from end) are honored by
  the encoder and not required by the decoder;
- XXH32 (primes 2654435761 / 2246822519 / 3266489917 / 668265263 /
  374761393, seed 0) — derived like xxh64 in zstd_codec.py and proven
  against the CLI's frame checksums.

Encoder: greedy hash-table LZ77 over 4-byte prefixes (the reference
"fast" strategy's shape), independent blocks, content checksum on.
Skippable frames (magic 0x184D2A50-5F) are skipped; legacy frames
(0x184C2102) and dictionaries raise named errors.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MAGIC_LEGACY = 0x184C2102
_SKIP_MIN, _SKIP_MAX = 0x184D2A50, 0x184D2A5F

_M32 = (1 << 32) - 1
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    p = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while p + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, p + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            p += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while p + 4 <= n:
        (k,) = struct.unpack_from("<I", data, p)
        h = (h + k * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        p += 4
    while p < n:
        h = (h + data[p] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        p += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------


def lz4_block_decompress(data: bytes, max_out: int | None = None) -> bytes:
    out = bytearray()
    p = 0
    n = len(data)
    while p < n:
        token = data[p]
        p += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[p]
                p += 1
                lit_len += b
                if b != 255:
                    break
        out += data[p : p + lit_len]
        p += lit_len
        if p >= n:
            break  # last sequence: literals only
        (offset,) = struct.unpack_from("<H", data, p)
        p += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                b = data[p]
                p += 1
                match_len += b
                if b != 255:
                    break
        if offset > len(out):
            raise ValueError("lz4: offset beyond output start")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:  # overlapping: byte-serial
            for i in range(match_len):
                out.append(out[start + i])
        if max_out is not None and len(out) > max_out:
            raise ValueError("lz4: output exceeds declared size")
    return bytes(out)


_MIN_MATCH = 4


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy hash-table match finder (4-byte prefix key), honoring
    the end-of-block restrictions: the last 5 bytes are literals and
    no match starts within 12 bytes of the end."""
    n = len(data)
    out = bytearray()
    head: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 12  # last match must start before here (spec rule)

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        nonlocal out
        lit_len = lit_end - lit_start
        tok_lit = 15 if lit_len >= 15 else lit_len
        if mlen:
            ml = mlen - _MIN_MATCH
            tok_ml = 15 if ml >= 15 else ml
        else:
            tok_ml = 0
        out.append((tok_lit << 4) | tok_ml)
        rem = lit_len - 15
        while rem >= 0:
            out.append(255 if rem >= 255 else rem)
            rem -= 255
        out += data[lit_start:lit_end]
        if mlen:
            out += struct.pack("<H", offset)
            rem = (mlen - _MIN_MATCH) - 15
            while rem >= 0:
                out.append(255 if rem >= 255 else rem)
                rem -= 255

    while i < limit:
        key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (
            data[i + 3] << 24
        )
        j = head.get(key)
        head[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == data[i : i + 4]:
            mlen = 4
            # matches may not cover the final 5 literals
            cap = n - 5 - i
            while mlen < cap and data[j + mlen] == data[i + mlen]:
                mlen += 1
            if mlen >= _MIN_MATCH:
                emit(anchor, i, i - j, mlen)
                i += mlen
                anchor = i
                continue
        i += 1
    emit(anchor, n, 0, 0)  # trailing literals-only sequence
    return bytes(out)


# ---------------------------------------------------------------------------
# frame format
# ---------------------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_compress(payload: bytes, block_max: int = 1 << 20) -> bytes:
    bd_code = next(c for c, s in sorted(_BD_SIZES.items()) if s >= block_max)
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    flg = (1 << 6) | (1 << 5) | (1 << 2)  # v01, independent, content cksum
    desc = bytes([flg, bd_code << 4])
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bsize = _BD_SIZES[bd_code]
    for off in range(0, len(payload), bsize) or [0]:
        chunk = payload[off : off + bsize]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(payload))
    return bytes(out)


def lz4_frame_decompress(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    (magic,) = struct.unpack_from("<I", data, pos)
    if _SKIP_MIN <= magic <= _SKIP_MAX:
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        return b"", pos + 8 + sz
    if magic == _MAGIC_LEGACY:
        raise ValueError("lz4: legacy frame format not supported")
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad magic {magic:#x}")
    desc_start = pos + 4
    flg = data[desc_start]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    block_checksum = bool(flg & 0x10)
    content_size_flag = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    if flg & 0x01:
        raise ValueError("lz4: dictionaries not supported")
    if flg & 0x02:
        raise ValueError("lz4: reserved FLG bit set")
    bd = data[desc_start + 1]
    bd_code = (bd >> 4) & 7
    if bd_code not in _BD_SIZES or bd & 0x8F:
        raise ValueError("lz4: invalid BD byte")
    p = desc_start + 2
    content_size = None
    if content_size_flag:
        (content_size,) = struct.unpack_from("<Q", data, p)
        p += 8
    hc = data[p]
    if hc != (xxh32(data[desc_start:p]) >> 8) & 0xFF:
        raise ValueError("lz4: header checksum mismatch")
    p += 1
    out = bytearray()
    while True:
        (bsz,) = struct.unpack_from("<I", data, p)
        p += 4
        if bsz == 0:
            break
        uncompressed = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        if bsz > _BD_SIZES[bd_code]:
            raise ValueError("lz4: block exceeds declared max size")
        block = data[p : p + bsz]
        p += bsz
        if block_checksum:
            (want,) = struct.unpack_from("<I", data, p)
            p += 4
            if want != xxh32(block):
                raise ValueError("lz4: block checksum mismatch")
        if uncompressed:
            out += block
        else:
            out += lz4_block_decompress(block, _BD_SIZES[bd_code])
    if content_checksum:
        (want,) = struct.unpack_from("<I", data, p)
        p += 4
        if want != xxh32(bytes(out)):
            raise ValueError("lz4: content checksum mismatch")
    if content_size is not None and len(out) != content_size:
        raise ValueError("lz4: content size mismatch")
    return bytes(out), p


def lz4_decompress(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        payload, pos = lz4_frame_decompress(data, pos)
        out += payload
    return bytes(out)
