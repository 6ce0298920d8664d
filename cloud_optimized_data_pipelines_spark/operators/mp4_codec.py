"""ISO BMFF / MP4 container codec (ISO/IEC 14496-12) — pure python.

The container LAYER of crawl video is fully parseable from the public
spec even though H.264/H.265 PAYLOAD decode is not implementable here
(entropy-coded reference frames need a real video stack — named
error).  What a 100 TB training-data pipeline needs from MP4s before
any pixel work is exactly this layer: track metadata (duration,
timescale, dimensions, handler), sample tables (sizes, timing,
chunk layout) and per-sample byte extraction — enough for routing,
compressed-domain fingerprints (sample-size signatures), duration
screens, and frame-count estimates.

Implements:
- box walk: 32-bit sizes, ``size == 1`` largesize, ``size == 0``
  to-end-of-file, nested container boxes;
- ``moov``: mvhd (version 0/1 timescale + duration), per-``trak``
  tkhd (track id, width/height as 16.16 fixed point), mdhd
  (media timescale/duration), hdlr (handler fourcc), and the stbl
  sample tables: stsd (entry fourcc list), stts (decode deltas),
  stsz (sizes), stsc (chunk map), stco/co64 (chunk offsets);
- sample extraction: stsc runs resolved to per-sample (offset, size);
- a minimal writer (``encode_mp4``) producing spec-valid single-track
  files (ftyp + mdat + moov) used by the round-trip probes — sample
  payloads are caller-supplied opaque bytes under an ``raw `` /
  ``mp4v`` sample entry, NOT pretend H.264.

Reference parity note: the reference pipeline has no video surface at
all; this is extension surface (SURVEY §7.7 multimodal).
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta",
    b"mvex", b"moof", b"traf",
}


def _u32(b, o):
    return struct.unpack_from(">I", b, o)[0]


def _u64(b, o):
    return struct.unpack_from(">Q", b, o)[0]


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, header_size, body_start, body_end) for the boxes
    in ``data[start:end]``."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = _u32(data, pos)
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = _u64(data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"mp4: box {typ!r} at {pos} overruns its parent"
            )
        yield typ, hdr, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError(f"mp4: trailing garbage at {pos}")


def _full_box(data: bytes, body: int) -> tuple[int, int, int]:
    """(version, flags, first_payload_offset)."""
    vf = _u32(data, body)
    return vf >> 24, vf & 0xFFFFFF, body + 4


def parse_mp4(data: bytes) -> dict:
    """Parse the container: movie header + per-track metadata + sample
    tables.  Returns {brand, timescale, duration, tracks: [{id,
    handler, codec, width, height, timescale, duration, n_samples,
    sample_sizes, sample_deltas, samples: [(offset, size)]}]}."""
    out: dict = {"tracks": []}
    for typ, _hdr, a, b in iter_boxes(data):
        if typ == b"ftyp":
            out["brand"] = data[a:a + 4].decode("ascii", "replace")
        elif typ == b"moov":
            _parse_moov(data, a, b, out)
    if "timescale" not in out:
        raise ValueError("mp4: no moov/mvhd")
    return out


def _parse_moov(data, a, b, out):
    for typ, _h, c, d in iter_boxes(data, a, b):
        if typ == b"mvhd":
            ver, _fl, p = _full_box(data, c)
            if ver == 1:
                out["timescale"] = _u32(data, p + 16)
                out["duration"] = _u64(data, p + 20)
            else:
                out["timescale"] = _u32(data, p + 8)
                out["duration"] = _u32(data, p + 12)
        elif typ == b"trak":
            out["tracks"].append(_parse_trak(data, c, d))


def _parse_trak(data, a, b) -> dict:
    tr: dict = {}
    for typ, _h, c, d in iter_boxes(data, a, b):
        if typ == b"tkhd":
            ver, _fl, p = _full_box(data, c)
            tr["id"] = _u32(data, p + (16 if ver else 8))
            # width/height: last 8 bytes of the box, 16.16 fixed
            tr["width"] = _u32(data, d - 8) >> 16
            tr["height"] = _u32(data, d - 4) >> 16
        elif typ == b"mdia":
            _parse_mdia(data, c, d, tr)
    return tr


def _parse_mdia(data, a, b, tr):
    for typ, _h, c, d in iter_boxes(data, a, b):
        if typ == b"mdhd":
            ver, _fl, p = _full_box(data, c)
            if ver == 1:
                tr["timescale"] = _u32(data, p + 16)
                tr["duration"] = _u64(data, p + 20)
            else:
                tr["timescale"] = _u32(data, p + 8)
                tr["duration"] = _u32(data, p + 12)
        elif typ == b"hdlr":
            _v, _f, p = _full_box(data, c)
            tr["handler"] = data[p + 4:p + 8].decode("ascii", "replace")
        elif typ == b"minf":
            for t2, _h2, e, f in iter_boxes(data, c, d):
                if t2 == b"stbl":
                    _parse_stbl(data, e, f, tr)


def _parse_stbl(data, a, b, tr):
    stsc = []
    stco: list[int] = []
    for typ, _h, c, d in iter_boxes(data, a, b):
        _v, _f, p = _full_box(data, c) if typ != b"mdat" else (0, 0, c)
        if typ == b"stsd":
            n = _u32(data, p)
            codecs = []
            q = p + 4
            for _ in range(n):
                esz = _u32(data, q)
                codecs.append(data[q + 4:q + 8].decode("ascii", "replace"))
                q += esz
            tr["codec"] = codecs[0] if codecs else None
            tr["codecs"] = codecs
        elif typ == b"stts":
            n = _u32(data, p)
            deltas = []
            for i in range(n):
                cnt = _u32(data, p + 4 + 8 * i)
                dur = _u32(data, p + 8 + 8 * i)
                deltas += [dur] * cnt
            tr["sample_deltas"] = deltas
        elif typ == b"stsz":
            fixed = _u32(data, p)
            n = _u32(data, p + 4)
            tr["n_samples"] = n
            if fixed:
                tr["sample_sizes"] = [fixed] * n
            else:
                tr["sample_sizes"] = [
                    _u32(data, p + 8 + 4 * i) for i in range(n)
                ]
        elif typ == b"stsc":
            n = _u32(data, p)
            for i in range(n):
                first = _u32(data, p + 4 + 12 * i)
                spc = _u32(data, p + 8 + 12 * i)
                stsc.append((first, spc))
        elif typ == b"stco":
            n = _u32(data, p)
            stco = [_u32(data, p + 4 + 4 * i) for i in range(n)]
        elif typ == b"co64":
            n = _u32(data, p)
            stco = [_u64(data, p + 4 + 8 * i) for i in range(n)]
    # resolve stsc runs + chunk offsets + sizes -> (offset, size)
    if stco and stsc and "sample_sizes" in tr:
        sizes = tr["sample_sizes"]
        samples = []
        si = 0
        nchunks = len(stco)
        for ri, (first, spc) in enumerate(stsc):
            last = (
                stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else nchunks
            )
            for ch in range(first, last + 1):
                off = stco[ch - 1]
                for _ in range(spc):
                    if si >= len(sizes):
                        break
                    samples.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        tr["samples"] = samples


def extract_samples(data: bytes, track: dict) -> list[bytes]:
    """Per-sample payload bytes via the resolved sample table."""
    return [data[o:o + s] for o, s in track["samples"]]


def decode_mp4_video(data: bytes):  # pragma: no cover - named stub
    """H.264/H.265 payload decode needs a real video stack (entropy-
    coded inter-frame prediction); not implementable from-scratch in
    this container.  The CONTAINER layer above is fully supported."""
    raise NotImplementedError(
        "mp4: H.264/H.265 sample decode requires ffmpeg/libavcodec — "
        "container metadata and sample extraction ARE supported "
        "(parse_mp4/extract_samples)"
    )


# ---------------------------------------------------------------------------
# Minimal writer (single track, one chunk per sample group)
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, ver: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (ver << 24) | flags) + payload)


def encode_mp4(
    samples: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"raw ",
    handler: bytes = b"vide",
    samples_per_chunk: int = 4,
) -> bytes:
    """Spec-valid single-track MP4: ftyp + mdat + moov with full
    sample tables (stts/stsz/stsc/stco).  Payload bytes are opaque —
    the probes use deterministic formula payloads, NOT pretend H.264.
    Chunking: ``samples_per_chunk`` per chunk (exercises the stsc run
    resolution on the way back)."""
    n = len(samples)
    if n == 0:
        raise ValueError("mp4: no samples")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mdat follows ftyp; chunk offsets are absolute file offsets
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_start = len(ftyp) + 8
    sizes = [len(s) for s in samples]
    chunk_offs = []
    off = mdat_start
    for i in range(0, n, samples_per_chunk):
        chunk_offs.append(off)
        off += sum(sizes[i:i + samples_per_chunk])
    duration = sample_delta * n

    stsd_entry = (
        struct.pack(">I", 86) + codec + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta)
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", s) for s in sizes
        ),
    )
    last_chunk_samples = n - samples_per_chunk * (len(chunk_offs) - 1)
    if last_chunk_samples == samples_per_chunk or len(chunk_offs) == 1:
        stsc_rows = [(1, min(samples_per_chunk, n))]
    else:
        stsc_rows = [
            (1, samples_per_chunk),
            (len(chunk_offs), last_chunk_samples),
        ]
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_rows)) + b"".join(
            struct.pack(">III", first, spc, 1) for first, spc in stsc_rows
        ),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offs)) + b"".join(
            struct.pack(">I", o) for o in chunk_offs
        ),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1)
              + _full(b"url ", 0, 1, b"")),
    )
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + handler + b"\x00" * 12 + b"probe\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">III", 0, 0, 1) + struct.pack(">I", 0)
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
