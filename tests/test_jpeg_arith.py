"""Arithmetic-coded JPEG (T.81 Annex D QM-coder + Annex F models).

The decisive guard is IMPLEMENTATION DIVERSITY: this container ships
the real libjpeg-turbo, whose arithmetic decoder is an independent
implementation of the same public spec.  The Huffman and arithmetic
encoders here share the exact coefficient pipeline, so libjpeg must
decode both files of the same image to IDENTICAL pixels — any
deviation in the QM-coder, the byte stuffing/carry logic, or the
DC/AC statistical models breaks that equality.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.operators.jpeg_arith import (
    ArithDecoder,
    ArithEncoder,
    QE_TABLE,
    decode_jpeg_arith,
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
)
from cloud_optimized_data_pipelines_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)

_LIBJPEG = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"

_HARNESS = r'''
import ctypes, sys, hashlib
lib = ctypes.CDLL(%r)
path, h, w, ncomp = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
data = open(path, "rb").read()
jerr = ctypes.create_string_buffer(2048)
cinfo = ctypes.create_string_buffer(2048)
lib.jpeg_std_error.restype = ctypes.c_void_p
errp = lib.jpeg_std_error(jerr)
ctypes.memmove(cinfo, ctypes.pointer(ctypes.c_void_p(errp)), 8)
lib.jpeg_CreateDecompress(cinfo, 62, 632)
buf = ctypes.create_string_buffer(data, len(data))
lib.jpeg_mem_src(cinfo, buf, ctypes.c_ulong(len(data)))
lib.jpeg_read_header(cinfo, 1)
lib.jpeg_start_decompress(cinfo)
row = ctypes.create_string_buffer(w * ncomp)
rowp = (ctypes.c_void_p * 1)(ctypes.cast(row, ctypes.c_void_p))
out = bytearray()
for _ in range(h):
    assert lib.jpeg_read_scanlines(cinfo, rowp, 1) == 1
    out += row.raw
lib.jpeg_finish_decompress(cinfo)
lib.jpeg_destroy_decompress(cinfo)
print(hashlib.md5(bytes(out)).hexdigest())
''' % _LIBJPEG


def _libjpeg_md5(path: str, h: int, w: int, ncomp: int) -> str:
    r = subprocess.run(
        [sys.executable, "-c", _HARNESS, path, str(h), str(w), str(ncomp)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-300:]
    return r.stdout.strip()


def test_qe_table_shape_and_spec_anchors():
    """Table D.3 invariants: 114 rows; every NMPS/NLPS is a valid
    index; the spec's published anchor rows hold; the equiprobable
    state 113 is a fixed point of the estimator."""
    assert len(QE_TABLE) == 114
    for qe, nmps, nlps, sw in QE_TABLE:
        assert 0 < qe < 0x8000 or qe in (0x5A1D, 0x5A7F, 0x5AE1, 0x5B12)
        assert 0 <= nmps <= 113 and 0 <= nlps <= 113 and sw in (0, 1)
    assert QE_TABLE[0] == (0x5A1D, 1, 1, 1)
    assert QE_TABLE[113] == (0x5A1D, 113, 113, 0)
    assert QE_TABLE[14][0] == 0x5A7F and QE_TABLE[14][3] == 1


def test_raw_coder_round_trip_and_carry():
    """Random decision streams over shared adapting contexts round-trip
    exactly; an all-MPS-then-LPS pattern stresses renormalization and
    the carry/stuffing paths (long runs drive C toward overflow)."""
    rng = np.random.default_rng(7)
    for trial, bits in enumerate([
        rng.integers(0, 2, 4000).tolist(),
        [0] * 900 + [1] + [0] * 900 + [1, 1, 1],
        [1] * 500 + [0] * 500,
        rng.integers(0, 2, 64).tolist(),
        [1],
        [0],
    ]):
        enc = ArithEncoder()
        st = bytearray(8)
        for i, b in enumerate(bits):
            enc.encode(st, i % 8, b)
        payload = enc.getvalue()
        # every 0xFF in the stream must be followed by a stuffed 0x00
        for i, b in enumerate(payload[:-1]):
            if b == 0xFF:
                assert payload[i + 1] == 0x00, (trial, i)
        dec = ArithDecoder(payload + b"\xff\xd9", 0)
        st2 = bytearray(8)
        got = [dec.decode(st2, i % 8) for i in range(len(bits))]
        assert got == bits, f"trial {trial}"


def test_arith_file_round_trip_matches_huffman_twin():
    """decode(arith file) == decode(huffman file) for the same image —
    the two entropy layers carry identical quantized coefficients
    through the identical IDCT."""
    rng = np.random.default_rng(11)
    cases = [
        (rng.integers(0, 256, (24, 32), dtype=np.uint8), "444"),
        (rng.integers(0, 256, (17, 23), dtype=np.uint8), "444"),
        (rng.integers(0, 256, (24, 32, 3), dtype=np.uint8), "444"),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8), "420"),
        (rng.integers(0, 256, (16, 18, 3), dtype=np.uint8), "422"),
        (np.zeros((8, 8), dtype=np.uint8), "444"),
        (np.full((8, 16), 255, dtype=np.uint8), "444"),
    ]
    for img, sub in cases:
        huff = (
            encode_jpeg(img, subsampling=sub)
            if img.ndim == 3
            else encode_jpeg(img)
        )
        arith = encode_jpeg_arith(img, subsampling=sub)
        assert len(arith) < len(huff)  # entropy win is the point
        out = decode_jpeg_arith(arith)
        ref = decode_jpeg(huff)
        assert np.array_equal(out, ref), (img.shape, sub)
        # the generic decoder dispatches SOF9
        assert np.array_equal(decode_jpeg(arith), ref)


@pytest.mark.skipif(
    not Path(_LIBJPEG).exists(), reason="libjpeg-turbo not present"
)
def test_libjpeg_independently_decodes_arith_files():
    """The container's REAL libjpeg (an independent implementation of
    T.81) must decode this encoder's arithmetic files to the exact
    pixels it produces for the Huffman twins."""
    rng = np.random.default_rng(3)
    cases = [
        (rng.integers(0, 256, (24, 32), dtype=np.uint8), "444", 0),
        (rng.integers(0, 256, (24, 32, 3), dtype=np.uint8), "444", 0),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8), "420", 0),
        (
            (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(
                np.uint8
            ),
            "444",
            0,
        ),
        # restart-interval files through the independent decoder too
        (rng.integers(0, 256, (24, 32), dtype=np.uint8), "444", 2),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8), "420", 2),
    ]
    for img, sub, ri in cases:
        h, w = img.shape[:2]
        nc = 3 if img.ndim == 3 else 1
        huff = (
            encode_jpeg(img, subsampling=sub, restart_interval=ri)
            if nc == 3
            else encode_jpeg(img, restart_interval=ri)
        )
        arith = encode_jpeg_arith(
            img, subsampling=sub, restart_interval=ri
        )
        open("/tmp/_ta_h.jpg", "wb").write(huff)
        open("/tmp/_ta_a.jpg", "wb").write(arith)
        mh = _libjpeg_md5("/tmp/_ta_h.jpg", h, w, nc)
        ma = _libjpeg_md5("/tmp/_ta_a.jpg", h, w, nc)
        assert mh == ma, (img.shape, sub)


def test_arith_restart_intervals():
    """DRI + RSTn with arithmetic coding: each interval flushes the
    coder and re-initializes coder state, statistics and DC
    predictors — decode of the restart file equals the Huffman twin's
    decode (same coefficients) for gray/color/subsampled shapes, and
    libjpeg independently agrees (covered in the cross-check test)."""
    rng = np.random.default_rng(9)
    for shape, sub, ri in [
        ((24, 32), "444", 2),
        ((48, 64), "444", 3),
        ((33, 41, 3), "420", 2),
        ((24, 32, 3), "444", 1),
    ]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        arith = encode_jpeg_arith(img, subsampling=sub, restart_interval=ri)
        huff = (
            encode_jpeg(img, restart_interval=ri, subsampling=sub)
            if img.ndim == 3
            else encode_jpeg(img, restart_interval=ri)
        )
        assert np.array_equal(decode_jpeg_arith(arith), decode_jpeg(huff))
    # a corrupted interval boundary raises a named error
    blob = bytearray(
        encode_jpeg_arith(
            rng.integers(0, 256, (24, 32), dtype=np.uint8),
            restart_interval=2,
        )
    )
    i = blob.find(b"\xff\xd0")
    if i < 0:
        i = next(
            j for j in range(len(blob) - 1)
            if blob[j] == 0xFF and 0xD0 <= blob[j + 1] <= 0xD7
        )
    blob[i + 1] = 0xD9  # turn the first RSTn into EOI
    with pytest.raises(ValueError, match="RSTn expected"):
        decode_jpeg_arith(bytes(blob))


def test_arith_named_errors():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg_arith(img.astype(np.int16))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_arith(img, subsampling="411")


def test_progressive_arith_matches_sequential_pixels():
    """SOF10 progressive carries the SAME quantized coefficients as
    SOF9 sequential, so both decodes must be pixel-identical — for
    grayscale and 4:4:4 color, via the public dispatcher."""
    rng = np.random.default_rng(7)
    g = (
        np.cumsum(rng.integers(-3, 4, (40, 56)), axis=1) % 200 + 20
    ).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=2)
    for img in (g, rgb):
        seq = decode_jpeg_arith(encode_jpeg_arith(img))
        pro = decode_jpeg_arith(encode_jpeg_arith_progressive(img))
        assert np.array_equal(seq, pro), img.shape
    # non-multiple-of-8 dims + noise (exercises edge padding + every
    # magnitude path)
    noisy = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_arith(encode_jpeg_arith(noisy)),
        decode_jpeg_arith(encode_jpeg_arith_progressive(noisy)),
    )


def test_progressive_arith_named_errors():
    import pytest

    from cloud_optimized_data_pipelines_spark.operators.jpeg_arith import (
        _decode_arith_progressive,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    pro = bytearray(encode_jpeg_arith_progressive(img))
    # forge a subsampled component spec in SOF10 -> named error
    i = pro.find(b"\xff\xca")
    sof_body = i + 4
    hv_off = sof_body + 6 + 1  # first component's HV byte
    pro[hv_off] = 0x22
    with pytest.raises(NotImplementedError, match="subsampled"):
        _decode_arith_progressive(bytes(pro))


@pytest.mark.skipif(
    not Path(_LIBJPEG).exists(), reason="libjpeg-turbo not present"
)
def test_libjpeg_independently_decodes_progressive_arith():
    """The container's real libjpeg must decode this encoder's SOF10
    progressive arithmetic files to the exact pixels of their SOF9
    sequential twins (same coefficients, different scan script)."""
    rng = np.random.default_rng(9)
    cases = [
        rng.integers(0, 256, (24, 32), dtype=np.uint8),
        rng.integers(0, 256, (33, 41, 3), dtype=np.uint8),
        (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(
            np.uint8
        ),
    ]
    for img in cases:
        h, w = img.shape[:2]
        nc = 3 if img.ndim == 3 else 1
        seq = encode_jpeg_arith(img)
        pro = encode_jpeg_arith_progressive(img)
        open("/tmp/_ta_s.jpg", "wb").write(seq)
        open("/tmp/_ta_p.jpg", "wb").write(pro)
        ms = _libjpeg_md5("/tmp/_ta_s.jpg", h, w, nc)
        mp = _libjpeg_md5("/tmp/_ta_p.jpg", h, w, nc)
        assert ms == mp, img.shape
