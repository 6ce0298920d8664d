"""ADTS (AAC transport stream) frame walk — compressed-domain metadata
and dedup fingerprints for the AAC share of a crawl's audio (podcast
feeds and radio rips ship .aac/ADTS alongside MP3; the MP4-boxed AAC
case is covered by ``mp4_codec``'s sample tables).

ISO/IEC 13818-7 §6.2 / 14496-3 §1.A.3.2 ADTS framing, public-spec
data only: 12-bit 0xFFF syncword, MPEG version bit, layer '00',
protection bit, 2-bit profile (AOT-1: Main/LC/SSR/LTP), 4-bit
sampling-frequency index, 3-bit channel configuration, 13-bit frame
length (header + optional CRC + payload), 11-bit buffer fullness,
2-bit (raw_data_blocks - 1).  Each raw data block is 1024 PCM samples
per channel.

Scope mirrors ``mpeg_audio.stream_info``: headers are walked exactly
(frame counts, exact sample counts, integer durations, VBR detection,
ID3v2/ID3v1 tag skip via the shared ``id3_bounds``), payload bytes
feed the tag-invariant dedup fingerprint, and AAC SPECTRAL decode is
a named error by design — Huffman codebooks + TNS + the MDCT are out
of scope the same way H.264 payloads are in ``mp4_codec``.  When
``protection_absent == 0`` the 16-bit CRC is SKIPPED, not verified
(the walk needs lengths, not integrity — documented limitation).
"""

from __future__ import annotations

import hashlib

from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
    id3_bounds,
)

SR_TABLE = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)
PROFILES = ("main", "lc", "ssr", "ltp")
_HDR = 7
_CRC = 2


def encode_adts_stream(
    payloads: list[bytes],
    profile: str = "lc",
    sr_index: int = 4,
    channels: int = 2,
    mpeg2: bool = False,
    protect: bool = False,
    blocks: int = 1,
) -> bytes:
    """Wrap raw AAC payload bytes in conformant ADTS frames (fixture
    builder: the payloads are opaque to the walk, exactly as real AAC
    spectral data is).  ``protect=True`` writes a placeholder CRC of
    0xFFFF (the walk skips it)."""
    if not 0 <= sr_index < len(SR_TABLE):
        raise ValueError(f"adts: bad sampling_frequency_index {sr_index}")
    if not 1 <= channels <= 7:
        raise ValueError(f"adts: bad channel_configuration {channels}")
    if not 1 <= blocks <= 4:
        raise ValueError(f"adts: raw_data_blocks must be 1..4")
    prof = PROFILES.index(profile)
    out = bytearray()
    for p in payloads:
        flen = _HDR + (_CRC if protect else 0) + len(p)
        if flen >= 1 << 13:
            raise ValueError(f"adts: frame too long ({flen} bytes)")
        h = bytearray(_HDR)
        h[0] = 0xFF
        h[1] = 0xF0 | (0x08 if mpeg2 else 0) | (0 if protect else 1)
        h[2] = (
            (prof << 6)
            | (sr_index << 2)
            | ((channels >> 2) & 1)
        )
        h[3] = ((channels & 3) << 6) | ((flen >> 11) & 3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 7) << 5) | 0x1F  # buffer fullness 0x7FF (VBR)
        h[6] = 0xFC | (blocks - 1)
        out += h
        if protect:
            out += b"\xff\xff"
        out += p
    return bytes(out)


def _parse_header(data: bytes, off: int) -> dict:
    if data[off] != 0xFF or (data[off + 1] & 0xF6) != 0xF0:
        raise ValueError(f"adts: lost sync at byte {off}")
    sr_index = (data[off + 2] >> 2) & 0xF
    if sr_index >= len(SR_TABLE):
        raise ValueError(f"adts: reserved sr index {sr_index} at {off}")
    flen = (
        ((data[off + 3] & 3) << 11)
        | (data[off + 4] << 3)
        | (data[off + 5] >> 5)
    )
    protect = not (data[off + 1] & 1)
    if flen < _HDR + (_CRC if protect else 0) + 1:
        raise ValueError(f"adts: frame length {flen} too short at {off}")
    return {
        "mpeg2": bool(data[off + 1] & 0x08),
        "protect": protect,
        "profile": PROFILES[data[off + 2] >> 6],
        "sr": SR_TABLE[sr_index],
        "channels": ((data[off + 2] & 1) << 2) | (data[off + 3] >> 6),
        "frame_bytes": flen,
        "blocks": (data[off + 6] & 3) + 1,
    }


def stream_info(data: bytes) -> dict:
    """Walk every ADTS frame header (ID3v2/v1 tags skipped via the
    shared bounds helper).  Raises named errors on lost sync,
    reserved fields, mid-stream parameter changes, and truncation —
    the crawl-robustness taxonomy, never a silent partial answer."""
    off, end, id3v2_bytes, has_id3v1 = id3_bounds(data)
    if end - off < _HDR:
        raise ValueError("adts: no room for a frame header")
    first = None
    n_frames = 0
    total_blocks = 0
    lengths: set[int] = set()
    pos = off
    while pos < end:
        if end - pos < _HDR:
            raise ValueError(
                f"adts: truncated header at byte {pos} ({end - pos} left)"
            )
        h = _parse_header(data, pos)
        if pos + h["frame_bytes"] > end:
            raise ValueError(
                f"adts: truncated final frame at byte {pos}: header"
                f" claims {h['frame_bytes']} bytes, {end - pos} remain"
            )
        if first is None:
            first = h
        elif (h["sr"], h["channels"], h["profile"], h["mpeg2"]) != (
            first["sr"], first["channels"], first["profile"],
            first["mpeg2"],
        ):
            raise ValueError(
                f"adts: stream parameters change at byte {pos}"
            )
        n_frames += 1
        total_blocks += h["blocks"]
        lengths.add(h["frame_bytes"])
        pos += h["frame_bytes"]
    total_samples = total_blocks * 1024
    return {
        "n_frames": n_frames,
        "total_blocks": total_blocks,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // first["sr"],
        "sample_rate": first["sr"],
        "channels": first["channels"],
        "profile": first["profile"],
        "mpeg_version": 2 if first["mpeg2"] else 4,
        "is_vbr": len(lengths) > 1,
        "stream_bytes": end - off,
        "id3v2_bytes": id3v2_bytes,
        "has_id3v1": bool(has_id3v1),
    }


def decode_aac(data: bytes):
    """AAC spectral decode is out of scope by design (Huffman
    codebooks + TNS + MDCT; the dedup/metadata paths never need it —
    same boundary as H.264 payloads in mp4_codec)."""
    raise NotImplementedError(
        "adts: AAC spectral decode is not implemented; use stream_info"
        " for metadata and fingerprint for dedup"
    )


def fingerprint(data: bytes, bits: int = 120) -> int:
    """Tag-invariant payload fingerprint for near-dup dedup: md5 over
    the concatenated raw PAYLOAD bytes (headers and CRC words
    excluded, ID3 tags excluded), folded to ``bits``.  Retagged or
    re-encapsulated copies of the same AAC stream collide exactly;
    headers (bitrate padding, buffer fullness) never perturb it."""
    off, end, _, _ = id3_bounds(data)
    md = hashlib.md5()
    pos = off
    while pos < end:
        if end - pos < _HDR:
            raise ValueError(f"adts: truncated header at byte {pos}")
        h = _parse_header(data, pos)
        if pos + h["frame_bytes"] > end:
            raise ValueError(f"adts: truncated final frame at byte {pos}")
        start = pos + _HDR + (_CRC if h["protect"] else 0)
        md.update(data[start : pos + h["frame_bytes"]])
        pos += h["frame_bytes"]
    return int.from_bytes(md.digest(), "big") >> (128 - bits)
