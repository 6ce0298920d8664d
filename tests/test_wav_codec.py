"""Pure-numpy RIFF/WAVE codec: round-trip, structural invariants, and
the real audio-decode multimodal path."""

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
    decode_wav,
    encode_wav,
)


def _rand(shape, dtype, seed):
    rng = np.random.RandomState(seed)
    if dtype == np.uint8:
        return rng.randint(0, 256, size=shape).astype(dtype)
    if dtype in (np.int16, np.int32):
        info = np.iinfo(dtype)
        return rng.randint(info.min, info.max, size=shape).astype(dtype)
    return rng.randn(*shape).astype(dtype) if isinstance(shape, tuple) else rng.randn(shape).astype(dtype)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64])
@pytest.mark.parametrize("ch", [1, 2, 4])
def test_round_trip_dtypes_and_channels(dtype, ch):
    a = _rand((201, ch), dtype, seed=ch)
    d, rate = decode_wav(encode_wav(a, 44100))
    assert rate == 44100 and d.dtype == a.dtype
    assert np.array_equal(d, a)


def test_mono_1d_input_and_odd_byte_padding():
    a = np.arange(7, dtype=np.uint8)  # 7 bytes -> odd data chunk
    wav = encode_wav(a, 8000)
    assert len(wav) % 2 == 0  # RIFF word alignment pad applied
    d, _ = decode_wav(wav)
    assert d.shape == (7, 1)
    assert np.array_equal(d[:, 0], a)


def test_header_layout():
    wav = encode_wav(np.zeros((10, 2), np.int16), 22050)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert wav[12:16] == b"fmt "
    tag, ch, rate, byte_rate, block, bits = struct.unpack("<HHIIHH", wav[20:36])
    assert (tag, ch, rate, bits) == (1, 2, 22050, 16)
    assert block == 4 and byte_rate == 22050 * 4
    assert wav[36:40] == b"data"


def test_unknown_chunks_skipped():
    wav = bytearray(encode_wav(np.arange(4, dtype=np.int16), 8000))
    # splice a LIST chunk between fmt and data
    insert = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data_at = bytes(wav).index(b"data")
    out = bytes(wav[:data_at]) + insert + bytes(wav[data_at:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    d, _ = decode_wav(out)
    assert np.array_equal(d[:, 0], np.arange(4, dtype=np.int16))


def test_24bit_pcm_decode_sign_extension():
    samples = [0x123456, -0x123456, 0, 8388607, -8388608]
    raw = b"".join((s & 0xFFFFFF).to_bytes(3, "little") for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    if len(raw) % 2:
        body += b"\x00"
    d, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert d[:, 0].tolist() == samples


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOPE" + b"\x00" * 64)
    wav = encode_wav(np.zeros(4, np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:20])
    # unsupported compressed format tag (0x55 = MP3-in-WAV; tag 2
    # MS-ADPCM decodes for real as of r10)
    bad = bytearray(wav)
    bad[20] = 0x55
    with pytest.raises(ValueError, match="compressed"):
        decode_wav(bytes(bad))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.sampled_from([1, 2, 3]),
    dt=st.sampled_from(["u1", "i2", "i4", "f4"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_fuzz(n, ch, dt, seed):
    dtype = {"u1": np.uint8, "i2": np.int16, "i4": np.int32, "f4": np.float32}[dt]
    a = _rand((n, ch), dtype, seed)
    d, _ = decode_wav(encode_wav(a, 16000))
    assert np.array_equal(d, a)


def test_wav_variant_deterministic():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        _wav_variant,
    )

    assert _wav_variant(2) == _wav_variant(2)
    v = _wav_variant(5)
    assert v["channels"] == 2 and v["bits"] == 32


def test_extract_audio_features_real_decode(spark):
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        extract_audio_features,
    )

    clips = {
        "m": _rand((400, 1), np.int16, seed=1),
        "s": _rand((250, 2), np.int16, seed=2),
    }
    rows = [(k, bytearray(encode_wav(v, 16000))) for k, v in clips.items()]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r.asset_id: r for r in extract_audio_features(df).collect()}
    for k, arr in clips.items():
        r = got[k]
        assert (r.n_frames, r.channels) == arr.shape
        assert r.sample_rate == 16000
        assert r.sample_sum == int(arr.sum(dtype=np.int64))
        f = arr.astype(np.float64)
        assert r.rms == pytest.approx(float(np.sqrt((f * f).mean())))
        assert r.wav_md5 == hashlib.md5(encode_wav(arr, 16000)).hexdigest()


def test_real_decode_wav_dispatch():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        real_decode,
    )

    a = _rand((50, 2), np.int16, seed=9)
    assert np.array_equal(real_decode(encode_wav(a, 8000), "audio/wav"), a)
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00", "video/mp4")


def test_g711_all_256_codes_roundtrip_and_canonical_values():
    """encode(decode(code)) == code for every A-law code and every
    mu-law code except 0x7F (mu-law negative zero, which decodes to the
    same linear 0 as 0xFF and canonically re-encodes to 0xFF) — the
    CCITT/Sun g711.c table semantics, plus spot values from the spec."""
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    rt = ulaw_encode(ulaw_decode(codes))
    (bad,) = np.nonzero(rt != codes)
    assert list(bad) == [0x7F] and rt[0x7F] == 0xFF
    assert ulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    # extreme magnitudes per the canonical tables
    assert int(ulaw_decode(codes).max()) == 32124
    assert int(ulaw_decode(codes).min()) == -32124
    assert int(alaw_decode(codes).max()) == 32256
    assert int(alaw_decode(codes).min()) == -32256
    # decoded values are symmetric under the sign bit (mu-law: code
    # 0x80+k is the negation of code k's value)
    u = ulaw_decode(codes)
    assert np.array_equal(u[:128], -u[128:])


def test_g711_wav_container_roundtrip_both_laws():
    """Telephony WAVs (format tags 6/7 + fact chunk) decode to int16
    linear; companding is idempotent after the first quantization."""
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.RandomState(21)
    pcm = rng.randint(-32000, 32000, (301, 2)).astype(np.int16)
    for law, tag in (("ulaw", 7), ("alaw", 6)):
        wav = encode_wav_g711(pcm, law=law, sample_rate=8000)
        (fmt_tag,) = struct.unpack("<H", wav[20:22])
        assert fmt_tag == tag
        assert b"fact" in wav
        dec, rate = decode_wav(wav)
        assert dec.shape == (301, 2) and dec.dtype == np.int16 and rate == 8000
        dec2, _ = decode_wav(encode_wav_g711(dec, law=law))
        assert np.array_equal(dec, dec2)
        # quantization error bounded by the largest mu-law/A-law step
        assert int(np.abs(dec.astype(np.int32) - pcm).max()) < 1024


def test_g711_rejects_bad_inputs():
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        encode_wav_g711,
    )

    with pytest.raises(ValueError, match="int16"):
        encode_wav_g711(np.zeros(4, np.float32))
    with pytest.raises(ValueError, match="companding law"):
        encode_wav_g711(np.zeros(4, np.int16), law="dpcm")


def test_ima_adpcm_core_matches_audioop():
    """The DVI/IMA nibble decoder must be bit-exact to stdlib audioop
    (an independent implementation of the same public spec), including
    with a non-zero initial (predictor, index) state."""
    audioop = pytest.importorskip("audioop")
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        ima_adpcm_decode,
    )

    rng = np.random.RandomState(17)
    for pred, index in ((0, 0), (1234, 30), (-20000, 70)):
        nibs = rng.randint(0, 16, 2000).tolist()
        packed = bytes(
            (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
        )  # audioop consumes the high nibble first
        ref = np.frombuffer(
            audioop.adpcm2lin(packed, 2, (pred, index))[0], np.int16
        )
        mine, _, _ = ima_adpcm_decode(nibs, pred, index)
        assert np.array_equal(ref, mine)


def test_ima_adpcm_wav_roundtrip_fixed_point():
    """Container round trip: mono int16 -> ADPCM WAV -> decode; the
    fact chunk crops padding, error is step-bounded, and one round
    trip is a fixed point (re-encode decodes identically)."""
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_adpcm,
    )

    rng = np.random.RandomState(19)
    pcm = (
        np.cumsum(rng.randint(-300, 301, 2777))
        .clip(-32000, 32000)
        .astype(np.int16)
    )
    wav = encode_wav_adpcm(pcm, 8000)
    (tag,) = struct.unpack("<H", wav[20:22])
    assert tag == 0x11 and b"fact" in wav
    out, rate = decode_wav(wav)
    assert out.shape == (2777, 1) and out.dtype == np.int16 and rate == 8000
    # first sample of each block is carried verbatim in the header
    assert out[0, 0] == pcm[0]
    assert int(np.abs(out[:, 0].astype(int) - pcm.astype(int)).max()) < 2000
    out2, _ = decode_wav(encode_wav_adpcm(out[:, 0], 8000))
    assert np.array_equal(out, out2)


def test_ima_adpcm_named_errors():
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_adpcm,
    )

    with pytest.raises(ValueError, match="int16"):
        encode_wav_adpcm(np.zeros((4, 2), np.float32))
    with pytest.raises(ValueError, match="odd"):
        encode_wav_adpcm(np.zeros(10, np.int16), block_samples=4)
    with pytest.raises(ValueError, match="8-nibble"):
        # multi-channel blocks rotate 8-nibble groups: (bs-1) % 8 != 0
        encode_wav_adpcm(np.zeros((20, 2), np.int16), block_samples=5)


def test_ima_adpcm_stereo_roundtrip_and_audioop_per_channel():
    """Multi-channel ADPCM (r8): per-channel block headers + the
    rotating 4-byte-group payload interleave; channels decode
    independently (each bit-exact to audioop on its de-rotated nibble
    stream), the fixed-point invariant holds, and headers carry each
    channel's first frame verbatim."""
    audioop = pytest.importorskip("audioop")
    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_adpcm,
        ima_adpcm_decode,
    )

    rng = np.random.RandomState(29)
    pcm = (
        np.cumsum(rng.randint(-200, 201, (1301, 2)), axis=0)
        .clip(-32000, 32000)
        .astype(np.int16)
    )
    wav = encode_wav_adpcm(pcm, 8000)
    out, rate = decode_wav(wav)
    assert out.shape == (1301, 2) and rate == 8000
    assert out[0, 0] == pcm[0, 0] and out[0, 1] == pcm[0, 1]
    assert int(np.abs(out.astype(int) - pcm.astype(int)).max()) < 2000
    out2, _ = decode_wav(encode_wav_adpcm(out, 8000))
    assert np.array_equal(out, out2)
    # per-channel audioop cross-check of the container payload
    data_off = wav.find(b"data") + 8
    (dsize,) = struct.unpack_from("<I", wav, data_off - 4)
    raw = wav[data_off : data_off + dsize]
    block_align = 4 * 2 + 504 * 2 // 2
    for lo in range(0, len(raw), block_align):
        blk = raw[lo : lo + block_align]
        if len(blk) < 8:
            break
        for c in range(2):
            pred, idx, _ = struct.unpack_from("<hBB", blk, 4 * c)
            nibs = []
            pay = blk[8:]
            for gi in range(0, len(pay), 4):
                if (gi // 4) % 2 != c:
                    continue
                for b in pay[gi : gi + 4]:
                    nibs += [b & 0x0F, b >> 4]
            packed = bytes(
                (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
            )
            ref = np.frombuffer(
                audioop.adpcm2lin(packed, 2, (pred, idx))[0], np.int16
            )
            mine, _, _ = ima_adpcm_decode(nibs, pred, idx)
            assert np.array_equal(ref, mine)


def test_ms_adpcm_golden_block_decode():
    """Hand-walked MS-ADPCM arithmetic on a tiny crafted state: every
    sample follows pred=(s1*c1+s2*c2)>>8, sample=clamp(pred+signed*d),
    d=max(16, adapt[nib]*d>>8) — computed here by hand, independent of
    the library loop."""
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        ms_adpcm_decode,
    )

    # coef pair 1 = (512, -256); start s1=100, s2=40, d=32
    # nib 3 (signed 3):  pred=(100*512-40*256)//256=160; s=160+96=256
    #                    d=max(16, 230*32//256)=28
    # nib 12 (signed -4): pred=(256*512-100*256)//256=412; s=412-112=300
    #                    d=max(16, 307*28//256)=33
    # nib 8 (signed -8): pred=(300*512-256*256)//256=344; s=344-264=80
    out, d, s1, s2 = ms_adpcm_decode([3, 12, 8], 1, 32, 100, 40)
    assert list(out) == [256, 300, 80]
    assert (s1, s2) == (80, 300)
    assert d == max(16, 768 * 33 // 256)
    # clamp rails: huge positive delta saturates at 32767
    out2, _, _, _ = ms_adpcm_decode([7], 0, 30000, 30000, 0)
    assert list(out2) == [32767]


def test_ms_adpcm_wav_roundtrip_and_same_header_reencode():
    """encode->decode: header samples verbatim, bounded tracking error
    on a band-limited signal, and the exact-inverse guard — re-encoding
    the DECODED samples with the SAME block headers reproduces every
    nibble (fixed-point via stored state; the header params themselves
    re-derive differently, which is why the IMA-style whole-file
    fixed-point claim is NOT made for MS)."""
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        _ms_adpcm_encode_channel,
        decode_wav,
        encode_wav_ms_adpcm,
    )

    rng = np.random.default_rng(11)
    for ch in (1, 2):
        n = 1237
        sig = np.clip(
            np.cumsum(rng.integers(-300, 301, (n, ch)), axis=0),
            -32768, 32767,
        ).astype(np.int16)
        wav = encode_wav_ms_adpcm(
            sig if ch > 1 else sig[:, 0], 8000, block_samples=128
        )
        dec, rate = decode_wav(wav)
        assert rate == 8000 and dec.shape == (n, ch)
        assert np.array_equal(dec[:2], sig[:2])  # header samples verbatim
        assert int(np.abs(dec.astype(np.int64) - sig.astype(np.int64)).max()) < 1500
        off = wav.find(b"data") + 8
        (dsize,) = struct.unpack_from("<I", wav, off - 4)
        raw = wav[off : off + dsize]
        foff = wav.find(b"fmt ") + 8
        _tag, nch, _r, _br, block_align, _bits = struct.unpack_from(
            "<HHIIHH", wav, foff
        )
        (spb,) = struct.unpack_from("<H", wav, foff + 18)
        # nAvgBytesPerSec covers ALL channels: block_align already
        # spans every channel of spb frames (r10 ADVICE: the old
        # //ch under-reported multichannel byte rate)
        assert _br == 8000 * block_align // spb
        for bi, lo in enumerate(range(0, len(raw), block_align)):
            blk = raw[lo : lo + block_align]
            preds = list(blk[:nch])
            deltas = struct.unpack_from(f"<{nch}h", blk, nch)
            dec_blk = dec[bi * spb : (bi + 1) * spb]
            nibs = []
            for b in blk[7 * nch :]:
                nibs += [b >> 4, b & 0x0F]
            for c in range(nch):
                want = nibs[c::nch][: max(0, len(dec_blk) - 2)]
                got = _ms_adpcm_encode_channel(
                    dec_blk[:, c].astype(np.int64), preds[c], deltas[c]
                )
                assert got == want[: len(got)]


def test_ms_adpcm_named_errors():
    import numpy as np
    import pytest

    from cloud_optimized_data_pipelines_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    with pytest.raises(ValueError, match="int16"):
        encode_wav_ms_adpcm(np.zeros(8, np.float32))
    with pytest.raises(ValueError, match="at least 2"):
        encode_wav_ms_adpcm(np.zeros(1, np.int16))
    wav = bytearray(
        encode_wav_ms_adpcm(np.arange(64, dtype=np.int16), 8000, 32)
    )
    # corrupt the first block's predictor byte past the coef table
    off = wav.find(b"data") + 8
    wav[off] = 9
    with pytest.raises(ValueError, match="predictor out of range"):
        decode_wav(bytes(wav))
