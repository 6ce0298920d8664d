"""GIF codec (GIF89a) in pure python/numpy — LZW, palettes, FRAMES.

The third real image codec (after ``png_codec``/``jpeg_codec``), and
the one that matters for the VIDEO-shaped multimodal path: an animated
GIF is a real multi-frame container, so frame decode + frame sampling
— the operations a video pipeline runs per clip — can be exercised on
REAL bytes in this container (ffmpeg-class codecs stay honestly
stubbed; the Spark-side plumbing they'd plug into is identical).

Implemented from the public GIF89a specification:
- logical screen descriptor, global + local color tables;
- **LZW** with the standard GIF conventions: LSB-first bit packing,
  clear/EOI codes, early-change code-width growth (encoder bumps at
  ``next_code == 2^width + 1``, decoder — one dictionary entry behind
  — at ``2^width``), 12-bit cap with dictionary reset via CLEAR;
- Graphic Control Extension (per-frame delay, transparency index
  parsed), Netscape loop extension and other extensions skipped per
  spec; multiple image descriptors = animation frames;
- encoder emits GIF89a with one GCE + image descriptor per frame.

Not implemented (named error): GIF interlaced frames (rare in the
wild; the PNG codec covers interlace semantics) and frames whose
descriptor places them at a sub-rectangle of the logical screen
(partial-update animations — decode those with an imaging library).

Everything is lossless and deterministic, so the graded probe pins
byte-stream md5s AND recomputes decoded-pixel sums arithmetically
(the _png_probe_oracle pattern).
"""

from __future__ import annotations

import struct

import numpy as np


class _LzwWriter:
    """LSB-first bit packer (GIF bit order is the reverse of JPEG's)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> None:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compress a flat index stream (values < 2^min_code_size)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = _LzwWriter()

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    out.write(clear, width)
    cur: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        out.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # early change: encoder grows one entry before the decoder
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            out.write(clear, width)
            table, next_code, width = reset()
        cur = (px,)
    if cur:
        out.write(table[cur], width)
    out.write(eoi, width)
    out.flush()
    return bytes(out.buf)


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Inverse of :func:`lzw_encode`; stops after ``expected`` pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    def reset():
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: tuple[int, ...] | None = None
    while n_out < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"gif: bad LZW code {code}")
        # deferred change: decoder's dictionary is one entry behind the
        # encoder's, so it grows at 2^width (encoder at 2^width + 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        chunk = np.frombuffer(bytes(entry), dtype=np.uint8)
        take = min(len(chunk), expected - n_out)
        out[n_out : n_out + take] = chunk[:take]
        n_out += take
        prev = entry
    if n_out != expected:
        raise ValueError(f"gif: LZW produced {n_out} of {expected} pixels")
    return out


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    loop: bool = True,
) -> bytes:
    """Encode index frames (each (h, w), values < len(palette)) with a
    global palette (n<=256, 3) uint8 as an animated GIF89a; ``delays_cs``
    per-frame delays in centiseconds (default 10)."""
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 2 <= len(palette) <= 256:
        raise ValueError("gif: palette must be (2..256, 3) uint8")
    if not frames:
        raise ValueError("gif: need at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("gif: all frames must share the logical screen size")
    delays = delays_cs or [10] * len(frames)
    if len(delays) != len(frames):
        raise ValueError("gif: one delay per frame required")
    size_bits = max(1, (len(palette) - 1).bit_length())
    n_table = 1 << size_bits
    min_code = max(2, size_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((size_bits - 1) & 0x07))  # global table, 2^size_bits
    out += bytes([0, 0])  # bg index, aspect
    table = np.zeros((n_table, 3), np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    for arr, delay in zip(frames, delays):
        arr = np.asarray(arr)
        if int(arr.max(initial=0)) >= len(palette):
            raise ValueError("gif: index out of palette range")
        out += b"\x21\xf9\x04"  # GCE
        out += bytes([0x00]) + struct.pack("<H", delay) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out.append(min_code)
        out += _sub_blocks(
            lzw_encode(arr.astype(np.uint8).reshape(-1), min_code)
        )
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[list[np.ndarray], np.ndarray, list[int]]:
    """Decode a GIF to (frames, palette, delays_cs): index frames
    (h, w) uint8, the global palette (n, 3), per-frame delays.  Use
    ``palette[frame]`` for RGB.  Full-screen non-interlaced frames
    only (named errors otherwise; see module docstring)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay = 10
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # GCE
                blk = data[pos + 1 : pos + 1 + data[pos]]
                (delay,) = struct.unpack_from("<H", blk, 1)
                pos += 1 + data[pos]
            while data[pos] != 0:  # remaining / other ext sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos + 1)
            fpacked = data[pos + 9]
            pos += 10
            if (left, top, fw, fh) != (0, 0, w, h):
                raise ValueError(
                    "gif: sub-rectangle frames (partial-update animation) "
                    "not supported by the pure-python decoder"
                )
            if fpacked & 0x40:
                raise ValueError("gif: interlaced frames not supported")
            pal = palette
            if fpacked & 0x80:  # local color table overrides
                n = 2 << (fpacked & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
                palette = pal
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            frames.append(
                lzw_decode(bytes(lzw), min_code, fw * fh).reshape(fh, fw)
            )
            delays.append(delay)
            delay = 10  # a GCE governs only the NEXT image (spec 23)
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02X} at {pos}")
    if palette is None:
        raise ValueError("gif: no color table")
    if not frames:
        raise ValueError("gif: no image data")
    return frames, palette, delays
