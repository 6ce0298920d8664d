"""FLAC codec (RFC 9639) tests: bit-exact round trips over every
subframe type / stereo mode / bit depth, CRC check values, the
UTF-8-style coded number, and hand-built LPC / wasted-bits
bitstreams decoded against a numpy reference."""

import struct

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.operators import flac_codec as fc


def _rt(samples, sr=44100, bits=16, bs=4096):
    s = np.asarray(samples)
    enc = fc.encode_flac(s, sr, bits=bits, block_size=bs)
    dec = fc.decode_flac(enc)
    s2 = s[:, None] if s.ndim == 1 else s
    assert dec["md5_ok"]
    assert np.array_equal(dec["samples"], s2)
    assert dec["sample_rate"] == sr
    assert dec["bits"] == bits
    assert dec["channels"] == s2.shape[1]
    assert dec["total_samples"] == len(s2)
    return enc, dec


# ---------------------------------------------------------------------------
# CRCs: published check values ("123456789")
# ---------------------------------------------------------------------------


def test_crc_check_values():
    # CRC-8 poly 0x07 init 0 (no reflection): check value 0xF4
    assert fc.crc8(b"123456789") == 0xF4
    # CRC-16 poly 0x8005 init 0 (no reflection, the UMTS/BUYPASS
    # parameterization FLAC frames use): check value 0xFEE8
    assert fc.crc16(b"123456789") == 0xFEE8


# ---------------------------------------------------------------------------
# coded number
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 0x3FFFFFF,
          0x7FFFFFFF, (1 << 36) - 1],
)
def test_coded_number_roundtrip(n):
    enc = fc.encode_coded_number(n)
    br = fc._BitReader(enc)
    assert fc.decode_coded_number(br) == n
    assert br.byte_pos() == len(enc)


def test_coded_number_ascii_range_matches_utf8():
    # below 0x80 and in the 2..4-byte ranges the coding IS UTF-8
    for n in [0x41, 0xE9, 0x20AC, 0x10348]:
        assert fc.encode_coded_number(n) == chr(n).encode("utf-8")


# ---------------------------------------------------------------------------
# fixed predictors: closed form
# ---------------------------------------------------------------------------


def test_fixed_coefs_closed_form():
    assert list(fc._fixed_coefs(1)) == [1]
    assert list(fc._fixed_coefs(2)) == [2, -1]
    assert list(fc._fixed_coefs(3)) == [3, -3, 1]
    assert list(fc._fixed_coefs(4)) == [4, -6, 4, -1]


def test_fixed_restore_inverts_diff():
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, 200)
    for order in range(5):
        res = fc._fixed_residual(x, order)
        back = fc._fixed_restore(res, x[:order], order)
        assert np.array_equal(back, x)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_roundtrip_predictable_mono():
    t = np.arange(10000)
    enc, dec = _rt((3000 * np.sin(t / 50)).astype(np.int64))
    assert len(enc) < 10000 * 2 // 4  # fixed predictors compress >4x
    assert dec["n_frames"] == 3  # 10000 / 4096


def test_roundtrip_constant_and_single():
    enc, _ = _rt(np.full(5000, 123))
    assert len(enc) < 100  # CONSTANT subframes
    _rt(np.array([42]))
    _rt(np.array([-1, 1]))


def test_roundtrip_noise_verbatim_bound():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32767, 6000)
    enc, _ = _rt(x)
    assert len(enc) < 6000 * 2 * 1.25  # never blows up past verbatim+rice


def test_roundtrip_stereo_modes():
    t = np.arange(8000)
    rng = np.random.default_rng(1)
    left = (2000 * np.sin(t / 30)).astype(np.int64)
    # correlated right channel: side-channel modes engage
    right = left + rng.integers(-40, 40, len(t))
    enc_corr, _ = _rt(np.stack([left, right], axis=1))
    # independent channels
    other = rng.integers(-5000, 5000, len(t))
    enc_ind, _ = _rt(np.stack([left, other], axis=1))
    assert len(enc_corr) < len(enc_ind)


def test_roundtrip_mid_side_odd_sums():
    # odd left+right exercises the dropped-LSB mid/side inversion
    left = np.array([1, 3, 5, 100, -101, 7] * 200)
    right = np.array([0, 2, 4, 99, -100, 8] * 200)
    _rt(np.stack([left, right], axis=1))


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim - 1, 3000)
    _rt(x, bits=bits)


def test_roundtrip_short_tail_blocks():
    t = np.arange(2500)
    _rt((500 * np.sin(t / 20)).astype(np.int64), bs=1000)  # tail 500


def test_streaminfo_fields():
    t = np.arange(5000)
    enc, dec = _rt((100 * np.sin(t / 9)).astype(np.int64), sr=22050,
                   bs=2048)
    # STREAMINFO: fixed-blocksize stream -> min == max == 2048; the
    # short tail block (904) is EXCLUDED per RFC 9639 §8.2
    br = fc._BitReader(enc[8:])
    assert br.read(16) == 2048
    assert br.read(16) == 2048
    assert dec["n_frames"] == 3


def test_streaminfo_block_fields_clamped():
    # a stream shorter than one block still writes >= 16 into both
    # 16-bit block fields (values below 16 are invalid per RFC 9639)
    enc = fc.encode_flac(np.arange(10), 44100, block_size=256)
    br = fc._BitReader(enc[8:])
    assert br.read(16) == 16
    assert br.read(16) == 16
    assert np.array_equal(
        fc.decode_flac(enc)["samples"][:, 0], np.arange(10)
    )


def test_high_sample_rates_roundtrip():
    # rates >= 65536 Hz must not be truncated in the 16-bit frame
    # header field: table form for 88200/96000/192000, daHz form for
    # 102400, kHz form for 256000
    x = (np.arange(700) % 97) - 48
    for sr in (88200, 96000, 192000, 102400, 256000):
        enc = fc.encode_flac(x, sr, block_size=256)
        dec = fc.decode_flac(enc)
        assert dec["sample_rate"] == sr
        assert np.array_equal(dec["samples"][:, 0], x)
    with pytest.raises(ValueError, match="no frame-header form"):
        fc.encode_flac(x, 65537, block_size=256)


def test_reserved_bits_code_named_error():
    # a frame header carrying the reserved bits-per-sample code 0b011
    # (valid CRC-8) raises the module's named ValueError, not KeyError
    bw = fc._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0b0001, 4)   # block size 192
    bw.write(0b1001, 4)   # 44100 Hz (table)
    bw.write(0, 4)        # mono
    bw.write(0b011, 3)    # RESERVED bits code
    bw.write(0, 1)
    for b in fc.encode_coded_number(0):
        bw.write(b, 8)
    hdr = bw.bytes()
    bw.write(fc.crc8(hdr), 8)
    with pytest.raises(ValueError, match="reserved bits-per-sample"):
        fc._decode_frame(bw.bytes(), 0, 16, 44100)


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------


def test_guards():
    x = np.arange(100)
    enc = fc.encode_flac(x, 44100)
    with pytest.raises(ValueError, match="bad magic"):
        fc.decode_flac(b"fLaX" + enc[4:])
    with pytest.raises(ValueError, match="exceed bit depth"):
        fc.encode_flac(np.array([40000]), 44100, bits=16)
    with pytest.raises(ValueError, match="unsupported bits"):
        fc.encode_flac(x, 44100, bits=13)
    # corrupt one frame body byte -> CRC-16 (or the resulting
    # desynced-length truncation guard) catches it
    bad = bytearray(enc)
    bad[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC|truncated"):
        fc.decode_flac(bytes(bad))
    # corrupt the stored PCM md5 -> decoder flags it
    bad = bytearray(enc)
    bad[8 + 18 + 3] ^= 0xFF  # inside STREAMINFO's 16-byte md5 field
    with pytest.raises(ValueError, match="MD5"):
        fc.decode_flac(bytes(bad))
    assert not fc.decode_flac(bytes(bad), verify_md5=False)["md5_ok"]


# ---------------------------------------------------------------------------
# decoder-only paths: hand-built LPC and wasted-bits subframes
# ---------------------------------------------------------------------------


def _frame_wrap(subframe_bits_fn, block_size, bits, sample_rate=44100):
    """Build a full mono frame around a hand-written subframe."""
    bw = fc._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)  # 16-bit block size
    bw.write(0b1101, 4)  # 16-bit sample rate
    bw.write(0, 4)  # mono
    bw.write(0b100, 3)  # 16 bits
    bw.write(0, 1)
    bw.write(0, 8)  # frame 0 coded number
    bw.write(block_size - 1, 16)
    bw.write(sample_rate, 16)
    bw.write(fc.crc8(bw.bytes()), 8)
    subframe_bits_fn(bw)
    bw.align()
    frame = bw.bytes()
    return frame + struct.pack(">H", fc.crc16(frame))


def test_lpc_subframe_decode():
    # order-2 LPC: coefs (3, -1), shift 1 -> pred = (3*x1 - x2) >> 1
    warm = [10, 14]
    coefs = [3, -1]
    shift = 1
    res = [1, -2, 0, 3, -1, 2, 0, 0, 1, -3]
    block_size = len(warm) + len(res)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b100000 | (2 - 1), 6)  # LPC order 2
        bw.write(0, 1)
        for v in warm:
            bw.write(v & 0xFFFF, 16)
        bw.write(14, 4)  # precision 15
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & 0x7FFF, 15)
        bw.write(0b00, 2)  # 4-bit rice
        bw.write(0, 4)  # partition order 0
        bw.write(2, 4)  # rice param 2
        for r in res:
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            bw.unary(u >> 2)
            bw.write(u & 3, 2)

    data = _frame_wrap(sub, block_size, 16)
    samples, frame_no, end = fc._decode_frame(data, 0, 16, 44100)
    # numpy reference
    ref = list(warm)
    for r in res:
        pred = (3 * ref[-1] - 1 * ref[-2]) >> shift
        ref.append(r + pred)
    assert list(samples[:, 0]) == ref
    assert frame_no == 0 and end == len(data)


def test_wasted_bits_decode():
    # CONSTANT subframe with 2 wasted bits: stored value 25 -> 100
    block_size = 16

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(1, 1)  # wasted-bits flag
        bw.unary(1)  # unary 1 -> wasted = 2
        bw.write(25 & 0x3FFF, 14)  # bits - wasted = 14

    data = _frame_wrap(sub, block_size, 16)
    samples, _, _ = fc._decode_frame(data, 0, 16, 44100)
    assert (samples[:, 0] == 100).all()
