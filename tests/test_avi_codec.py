"""AVI (RIFF video) container codec tests — raw DIB + MJPG streams."""

import struct

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.operators.avi_codec import (
    decode_avi,
    encode_avi,
)


def _rand_frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]


def test_avi_raw_roundtrip_with_row_padding():
    """Odd widths force 4-byte DIB row padding; frames must round-trip
    pixel-exact and the container must carry the idx1 index."""
    frames = _rand_frames(5, 11, 13, seed=3)  # 13*3=39 -> padded to 40
    avi = encode_avi(frames, fps=25)
    assert b"idx1" in avi and b"movi" in avi and b"MJPG" not in avi
    dec, fps = decode_avi(avi)
    assert fps == 25 and len(dec) == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_avi_mjpg_roundtrip_dc_exact_frames():
    """MJPG frames (this repo's own JPEG codec inside the container)
    round-trip exactly for DC-exact inputs (uniform even 8x8 blocks)."""
    rng = np.random.RandomState(7)
    frames = []
    for f in range(4):
        blocks = (rng.randint(0, 128, (2, 2)) * 2).astype(np.uint8)
        gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        frames.append(np.stack([gray] * 3, axis=2))
    avi = encode_avi(frames, fps=5, codec="mjpg")
    assert b"MJPG" in avi
    dec, fps = decode_avi(avi)
    assert fps == 5 and len(dec) == 4
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_avi_top_down_and_32bit_dibs_decode():
    """Hand-mutated containers: negative biHeight (top-down rows) and
    32-bit BGRX payloads are both legal BI_RGB forms the decoder must
    handle (the encoder only ever writes bottom-up 24-bit)."""
    frames = _rand_frames(2, 8, 8, seed=11)
    avi = bytearray(encode_avi(frames, fps=10))
    # flip biHeight negative AND reverse each frame's stored rows ->
    # identical decoded pixels
    i = avi.find(b"strf") + 8
    w, h = struct.unpack_from("<ii", avi, i + 4)
    struct.pack_into("<i", avi, i + 8, -h)
    pos = avi.find(b"movi") + 4
    row_bytes = (w * 3 + 3) & ~3
    for _ in range(2):
        assert avi[pos : pos + 4] == b"00db"
        (sz,) = struct.unpack_from("<I", avi, pos + 4)
        body = np.frombuffer(
            bytes(avi[pos + 8 : pos + 8 + sz]), np.uint8
        ).reshape(h, row_bytes)
        avi[pos + 8 : pos + 8 + sz] = body[::-1].tobytes()
        pos += 8 + sz + (sz % 2)
    dec, _ = decode_avi(bytes(avi))
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)

    # 32-bit: rebuild the container by hand from the codec's privates
    from cloud_optimized_data_pipelines_spark.operators import avi_codec as C

    f = frames[0]
    bgrx = np.zeros((8, 8, 4), np.uint8)
    bgrx[:, :, :3] = f[::-1, :, ::-1]
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0, 1, 0, 1, 0, 8, 8,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, 8, 8))
    strf = struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 32, 0, 256, 0, 0, 0, 0)
    hdrl = C._list(b"hdrl", C._chunk(b"avih", avih)
                   + C._list(b"strl", C._chunk(b"strh", strh)
                             + C._chunk(b"strf", strf)))
    movi = C._list(b"movi", C._chunk(b"00db", bgrx.tobytes()))
    raw = b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) \
        + b"AVI " + hdrl + movi
    dec32, _ = decode_avi(raw)
    assert np.array_equal(dec32[0], f)


def test_avi_named_errors():
    frames = _rand_frames(1, 8, 8)
    avi = bytearray(encode_avi(frames))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    i = avi.find(b"strf") + 8
    struct.pack_into("<I", avi, i + 16, struct.unpack("<I", b"cvid")[0])
    with pytest.raises(NotImplementedError, match="cvid"):
        decode_avi(bytes(avi))
    with pytest.raises(ValueError, match="codec"):
        encode_avi(frames, codec="h264")
    with pytest.raises(ValueError, match="at least one"):
        encode_avi([])
    with pytest.raises(ValueError, match="same size"):
        encode_avi(_rand_frames(1, 8, 8) + _rand_frames(1, 8, 9))


def test_avi_skips_non_video_streams():
    """An audio 'strl' before the video stream must not confuse stream
    numbering: the video chunks are '01db' then."""
    from cloud_optimized_data_pipelines_spark.operators import avi_codec as C

    frames = _rand_frames(2, 8, 8, seed=13)
    base = encode_avi(frames, fps=10)
    # splice an audio strl in front of the video one, renumber chunks
    audio_strh = (b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 100, 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, 0, 0))
    audio_strl = C._list(b"strl", C._chunk(b"strh", audio_strh)
                         + C._chunk(b"strf", b"\x00" * 16))
    i = base.find(b"LIST", base.find(b"hdrl"))  # first strl LIST
    out = bytearray(base[:i] + audio_strl + base[i:])
    # grow the hdrl LIST size
    hd = out.find(b"hdrl") - 8
    (hsz,) = struct.unpack_from("<I", out, hd + 4)
    struct.pack_into("<I", out, hd + 4, hsz + len(audio_strl))
    # grow the RIFF size and renumber movi chunks 00db -> 01db
    (rsz,) = struct.unpack_from("<I", out, 4)
    struct.pack_into("<I", out, 4, rsz + len(audio_strl))
    out = bytearray(bytes(out).replace(b"00db", b"01db"))
    dec, _ = decode_avi(bytes(out))
    assert len(dec) == 2
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
