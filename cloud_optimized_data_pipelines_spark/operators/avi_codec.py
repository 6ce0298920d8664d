"""Pure-numpy AVI (RIFF 'AVI ') video-container codec — the real video
path for the multimodal payload columns (operators/multimodal.py).

Implements the public Microsoft Video-for-Windows AVI RIFF layout from
first principles (the same approach as ``wav_codec.py``, which shares
the RIFF chunk grammar): stdlib ``struct`` + numpy only.

Supported:
- container walk: LIST 'hdrl' (avih + per-stream 'strl' with
  strh/strf), LIST 'movi' frame chunks, optional 'idx1' index (written
  on encode, ignored on decode — the movi walk is authoritative);
- uncompressed DIB video streams (biCompression = 0 / BI_RGB): 24-bit
  BGR and 32-bit BGRX, bottom-up (positive biHeight) and top-down
  (negative) row order, 4-byte row padding;
- Motion-JPEG ('MJPG') video streams: every frame chunk is a baseline
  JFIF payload, decoded through this repo's own
  :mod:`operators.jpeg_codec` — a real compressed video form with no
  external codec dependency;
- single video stream; non-video streams ('auds', 'txts') are skipped.

Unsupported (named errors): any other biCompression fourcc (cinepak,
DV, H.264... need a real codec library), multiple video streams,
AVIX/OpenDML extension lists.

Reference counterpart: the reference pipeline has no video path at all
(same modality gap as the GIF/JPEG codecs — see SURVEY.md 7.8); this
is part of the training-data extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi(
    frames: list[np.ndarray],
    fps: int = 10,
    codec: str = "raw",
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as a single-video-stream AVI.

    ``codec='raw'``: uncompressed 24-bit BI_RGB DIB frames (BGR,
    bottom-up, 4-byte row padding) in '00db' chunks.
    ``codec='mjpg'``: each frame baseline-JPEG-encoded (4:4:4, this
    repo's encoder) in '00dc' chunks — lossy, so round-trip equality
    only holds for DC-exact inputs (uniform even-valued 8x8 blocks,
    the _jpeg_variant construction).

    Writes the idx1 index (AVIF_HASINDEX) real players expect.
    """
    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("avi: frames must be uint8 (h, w, 3), same size")
    if codec == "raw":
        fourcc, handler, compression = b"00db", b"DIB ", 0
        row_bytes = (w * 3 + 3) & ~3
        payloads = []
        for f in frames:
            bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channel order
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            payloads.append(rows.tobytes())
        size_image = row_bytes * h
        bit_count = 24
    elif codec == "mjpg":
        from cloud_optimized_data_pipelines_spark.operators.jpeg_codec import (
            encode_jpeg,
        )

        fourcc, handler = b"00dc", b"MJPG"
        compression = struct.unpack("<I", b"MJPG")[0]
        payloads = [encode_jpeg(f) for f in frames]
        size_image = max(len(p) for p in payloads)
        bit_count = 24
    else:
        raise ValueError(f"avi: unknown codec {codec!r} (raw or mjpg)")

    usec = 1_000_000 // fps
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, max_bytes * fps, 0, _AVIF_HASINDEX, len(frames), 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            max_bytes, 0xFFFFFFFF, 0,
        )
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bit_count, compression, size_image,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    idx = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += fourcc + struct.pack(
            "<III", _AVIIF_KEYFRAME, 4 + len(movi_body), len(p)
        )
        movi_body += _chunk(fourcc, p)
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + csize > end:
            raise ValueError(f"avi: truncated {cid!r} chunk")
        yield cid, body_start, csize
        pos = body_start + csize + (csize % 2)


def decode_avi(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode an AVI to ((h, w, 3) uint8 RGB frame list, fps).

    Walks the RIFF tree for the first 'vids' stream; every '##db'/
    '##dc' movi chunk of that stream becomes one frame.  BI_RGB 24/32
    bit DIBs and MJPG payloads are supported; other compressions raise
    a NAMED NotImplementedError.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI stream")
    strh = strf = None
    movi_ranges: list[tuple[int, int]] = []
    fps = 10
    stream_no = None

    def walk_list(pos: int, end: int) -> None:
        nonlocal strh, strf, movi_ranges, fps, stream_no
        for cid, start, size in _walk_chunks(data, pos, end):
            if cid == b"LIST":
                kind = data[start : start + 4]
                if kind == b"movi":
                    movi_ranges.append((start + 4, start + size))
                else:
                    walk_list(start + 4, start + size)
            elif cid == b"strh" and strh is None:
                fcc_type = data[start : start + 4]
                if fcc_type == b"vids":
                    strh = data[start : start + size]
                    scale, rate = struct.unpack_from("<II", strh, 20)
                    if scale:
                        fps = max(1, rate // scale)
                    stream_no = len(seen_streams)
                seen_streams.append(fcc_type)
            elif cid == b"strh":
                seen_streams.append(data[start : start + 4])
            elif cid == b"strf" and strh is not None and strf is None:
                strf = data[start : start + size]

    seen_streams: list[bytes] = []
    walk_list(12, len(data))
    if strh is None or strf is None:
        raise ValueError("avi: no video ('vids') stream found")
    if not movi_ranges:
        raise ValueError("avi: no movi list")
    (
        _bi_size, w, h, _planes, bit_count, compression,
    ) = struct.unpack_from("<IiiHHI", strf, 0)
    top_down = h < 0
    h = abs(h)
    prefix = f"{stream_no:02d}".encode()

    frames: list[np.ndarray] = []
    for movi_start, movi_end in movi_ranges:
        for cid, start, size in _walk_chunks(data, movi_start, movi_end):
            if cid == b"LIST" and data[start : start + 4] == b"rec ":
                inner = list(_walk_chunks(data, start + 4, start + size))
            else:
                inner = [(cid, start, size)]
            for icid, istart, isize in inner:
                if icid[:2] != prefix or icid[2:4] not in (b"db", b"dc"):
                    continue
                body = data[istart : istart + isize]
                frames.append(
                    _decode_frame(body, w, h, bit_count, compression, top_down)
                )
    if not frames:
        raise ValueError("avi: video stream has no frame chunks")
    return frames, fps


def _decode_frame(
    body: bytes, w: int, h: int, bit_count: int, compression: int,
    top_down: bool,
) -> np.ndarray:
    if compression == 0:  # BI_RGB
        if bit_count == 24:
            row_bytes = (w * 3 + 3) & ~3
            rows = np.frombuffer(body[: row_bytes * h], np.uint8).reshape(
                h, row_bytes
            )
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            rgb = bgr[:, :, ::-1]
        elif bit_count == 32:
            rows = np.frombuffer(body[: w * h * 4], np.uint8).reshape(
                h, w, 4
            )
            rgb = rows[:, :, 2::-1]  # BGRX -> RGB
        else:
            raise NotImplementedError(
                f"avi: BI_RGB bit depth {bit_count} unsupported (24/32 only)"
            )
        return np.ascontiguousarray(rgb if top_down else rgb[::-1])
    if compression == struct.unpack("<I", b"MJPG")[0]:
        from cloud_optimized_data_pipelines_spark.operators.jpeg_codec import (
            decode_jpeg,
        )

        out = decode_jpeg(body)
        if out.ndim == 2:
            out = np.repeat(out[:, :, None], 3, axis=2)
        return out
    fourcc = struct.pack("<I", compression)
    raise NotImplementedError(
        f"avi: compression {fourcc!r} unsupported (BI_RGB and MJPG only; "
        "decode other codecs with ffmpeg)"
    )
