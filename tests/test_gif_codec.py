"""GIF codec tests (operators/gif_codec.py): LZW invariants (incl. the
KwKwK case and 12-bit dictionary reset), multi-frame round trips,
structural/named errors, probe parity, and hypothesis fuzz."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloud_optimized_data_pipelines_spark.operators.gif_codec import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_across_width_boundaries():
    rng = np.random.RandomState(1)
    for npal in (2, 3, 4, 7, 16, 64, 250, 256):
        mcs = max(2, (npal - 1).bit_length())
        for n in (1, 5, 100, 5000, 20000):
            idx = rng.randint(0, npal, n).astype(np.uint8)
            assert np.array_equal(
                lzw_decode(lzw_encode(idx, mcs), mcs, n), idx
            ), (npal, n)


def test_lzw_kwkwk_and_runs():
    """All-same-symbol streams hit the code==next_code (KwKwK) decoder
    branch on nearly every step; 4097+ runs also cross the 12-bit
    dictionary reset."""
    for run in (2, 3, 50, 4097, 9000):
        idx = np.zeros(run, np.uint8)
        assert np.array_equal(lzw_decode(lzw_encode(idx, 2), 2, run), idx)


def test_lzw_truncation_detected():
    idx = np.arange(100, dtype=np.uint8) % 4
    enc = lzw_encode(idx, 2)
    with pytest.raises(ValueError, match="truncated|pixels"):
        lzw_decode(enc[: len(enc) // 2], 2, 100)


def test_gif_multiframe_roundtrip_with_delays():
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames = [rng.randint(0, 16, (13, 17)).astype(np.uint8) for _ in range(5)]
    gif = encode_gif(frames, pal, delays_cs=[4, 8, 12, 16, 20])
    assert gif[:6] == b"GIF89a" and gif[-1:] == b"\x3b"
    assert b"NETSCAPE2.0" in gif  # loop extension on animations
    dfr, dpal, delays = decode_gif(gif)
    assert delays == [4, 8, 12, 16, 20]
    assert np.array_equal(dpal[:16], pal)
    assert all(np.array_equal(a, b) for a, b in zip(frames, dfr))


def test_gif_256_palette_dictionary_reset():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    big = rng.randint(0, 256, (80, 90)).astype(np.uint8)  # > 4096 entries
    f, p, _ = decode_gif(encode_gif([big], pal))
    assert np.array_equal(f[0], big)


def test_gif_named_errors():
    pal = np.zeros((4, 3), np.uint8)
    gif = bytearray(encode_gif([np.zeros((4, 6), np.uint8)], pal))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(gif[6:]))
    # flip the interlace bit in the image descriptor's packed byte
    desc = bytes(gif).find(b"\x2c")
    g2 = bytearray(gif)
    g2[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlace"):
        decode_gif(bytes(g2))
    # claim a sub-rectangle frame
    g3 = bytearray(gif)
    g3[desc + 1] = 1  # left = 1
    with pytest.raises(ValueError, match="sub-rectangle"):
        decode_gif(bytes(g3))
    with pytest.raises(ValueError, match="palette"):
        encode_gif([np.zeros((2, 2), np.uint8)], np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError, match="index"):
        encode_gif([np.full((2, 2), 9, np.uint8)], pal)


def test_gif_probe_matches_local_reference(spark):
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        _GIF_NPAL,
        _gif_variant,
        gif_probe_table,
    )

    got = {r.variant: r for r in gif_probe_table(spark, 8).collect()}
    assert len(got) == 8
    for v in range(8):
        ref = _gif_variant(v)
        assert got[v].gif_md5 == ref["gif_md5"]
        assert got[v].sampled_px_sum == ref["sampled_px_sum"]
        assert got[v].n_palette == _GIF_NPAL[v]
        assert got[v].n_frames == 6 and got[v].n_sampled == 3
    # non-circular: the arithmetic formula over sampled frames {0,2,4}
    for v in range(8):
        npal = _GIF_NPAL[v]
        expect = sum(
            (((k * (v + 1) + 7 * f) % npal) * 7 + 1) % 251
            + (((k * (v + 1) + 7 * f) % npal) * 11 + 3) % 251
            + (((k * (v + 1) + 7 * f) % npal) * 13 + 5) % 251
            for f in (0, 2, 4)
            for k in range(20 * 16)
        )
        assert got[v].sampled_px_sum == expect


def test_real_decode_dispatches_gif():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        real_decode,
    )

    pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    frames = [np.zeros((3, 4), np.uint8), np.ones((3, 4), np.uint8)]
    rgb = real_decode(encode_gif(frames, pal), "image/gif")
    assert rgb.shape == (2, 3, 4, 3)
    assert (rgb[0] == [10, 20, 30]).all() and (rgb[1] == [40, 50, 60]).all()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    npal=st.sampled_from([2, 4, 16, 256]),
    nframes=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_gif_roundtrip(h, w, npal, nframes, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    frames = [
        rng.randint(0, npal, (h, w)).astype(np.uint8) for _ in range(nframes)
    ]
    dfr, dpal, _ = decode_gif(encode_gif(frames, pal))
    assert len(dfr) == nframes
    assert all(np.array_equal(a, b) for a, b in zip(frames, dfr))


def test_gce_scope_is_one_frame():
    """A Graphic Control Extension governs only the image that follows
    it — a GCE-less later frame gets the default delay, not a stale
    one (spec section 23)."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    f = np.zeros((2, 2), np.uint8)
    gif = bytearray(encode_gif([f, f], pal, delays_cs=[77, 5], loop=False))
    # strip the SECOND frame's GCE block (0x21 0xF9 0x04 ... 0x00 = 8 bytes)
    first = bytes(gif).find(b"\x21\xf9")
    second = bytes(gif).find(b"\x21\xf9", first + 2)
    del gif[second : second + 8]
    _, _, delays = decode_gif(bytes(gif))
    assert delays == [77, 10]
