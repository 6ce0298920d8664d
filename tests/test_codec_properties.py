"""Hypothesis property tests for the r11 codec family: arbitrary
inputs must round-trip bit-exactly through every from-scratch
encode/decode pair, and (where the reference coder is in-container)
through the cross-implementation legs too.

Kept to modest example counts — the dedicated test modules carry the
structured conformance matrices; these guard the arbitrary-input
corners (empty, tiny, high-entropy, pathological runs) against
regressions."""

import shutil
import subprocess
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cloud_optimized_data_pipelines_spark.operators import (
    deflate_codec as dc,
)
from cloud_optimized_data_pipelines_spark.operators import lz4_codec as L
from cloud_optimized_data_pipelines_spark.operators import zstd_codec as Z
from cloud_optimized_data_pipelines_spark.operators import flac_codec as fc
from cloud_optimized_data_pipelines_spark.sources import webdataset as WD

_payload = st.binary(min_size=0, max_size=4000)


@settings(max_examples=40, deadline=None)
@given(_payload)
def test_deflate_roundtrip_property(data):
    enc = dc.deflate(data)
    out, end = dc.inflate(enc)
    assert out == data and end == len(enc)
    assert zlib.decompressobj(-15).decompress(enc) == data


@settings(max_examples=40, deadline=None)
@given(_payload)
def test_inflate_decodes_zlib_property(data):
    raw = zlib.compress(data, 6)[2:-4]
    out, end = dc.inflate(raw)
    assert out == data and end == len(raw)


@settings(max_examples=30, deadline=None)
@given(_payload)
def test_gzip_engines_roundtrip_property(data):
    for enc_engine in ("c", "pure"):
        g = dc.gzip_encode(data, engine=enc_engine)
        for dec_engine in ("c", "pure"):
            m = dc.gzip_decode_member(g, engine=dec_engine)
            assert m["payload"] == data and m["end"] == len(g)


@settings(max_examples=30, deadline=None)
@given(_payload)
def test_zstd_compress_roundtrip_property(data):
    enc = Z.zstd_compress(data)
    assert Z.zstd_decompress(enc) == data


@settings(max_examples=30, deadline=None)
@given(_payload)
def test_lz4_roundtrip_property(data):
    enc = L.lz4_frame_compress(data)
    assert L.lz4_decompress(enc) == data


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=2000,
    ),
    st.sampled_from([1, 2]),
)
def test_flac_roundtrip_property(samples, channels):
    x = np.array(samples, dtype=np.int64)
    if channels == 2:
        if len(x) % 2:
            x = x[:-1]
        x = x.reshape(-1, 2)
    enc = fc.encode_flac(x, 32000, bits=16, block_size=256)
    dec = fc.decode_flac(enc)
    want = x[:, None] if x.ndim == 1 else x
    assert np.array_equal(dec["samples"], want)
    assert dec["md5_ok"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,4}){0,2}",
                          fullmatch=True),
            st.binary(min_size=0, max_size=600),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_tar_roundtrip_property(members):
    tar = WD.encode_tar(members)
    parsed = WD.parse_tar(tar)
    assert [(m["name"], m["payload"]) for m in parsed] == members


_HAVE_ZSTD = shutil.which("zstd") is not None


@pytest.mark.skipif(not _HAVE_ZSTD, reason="zstd CLI not present")
@settings(max_examples=15, deadline=None)
@given(_payload)
def test_zstd_cli_accepts_property(data):
    enc = Z.zstd_compress(data)
    r = subprocess.run(["zstd", "-d", "-c"], input=enc,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data


# --- r12: MP3 Layer III -----------------------------------------------------

from cloud_optimized_data_pipelines_spark.operators import (  # noqa: E402
    mp3_layer3 as M3,
)


@st.composite
def _mp3_spectrum(draw, nmax=3):
    """A legal spectrum for the shipped-table alphabet: a big-values
    prefix in [-nmax, nmax] (r13 widened to 15 — the encoder
    auto-selects among pair tables 1-15), a count1 region in [-1, 1],
    zero tail."""
    n_big = draw(st.integers(0, 240)) * 2
    # quads tile from n_big in steps of 4 up to the last FULL quad;
    # the tail past it is rzero by construction
    max_quads = (576 - n_big) // 4
    n_quad = draw(st.integers(0, min(max_quads, 84))) * 4
    big = draw(st.lists(st.integers(-nmax, nmax),
                        min_size=n_big, max_size=n_big))
    quad = draw(st.lists(st.integers(-1, 1), min_size=n_quad,
                         max_size=n_quad))
    out = np.zeros(576, np.int64)
    out[:n_big] = big
    out[n_big : n_big + n_quad] = quad
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(_mp3_spectrum(), min_size=1, max_size=4),
    st.integers(0, 7),
    st.booleans(),
    st.booleans(),
)
def test_mp3_roundtrip_property(spectra, scf_seed, c1b, reservoir):
    from hypothesis import assume

    spectra = np.stack(spectra)
    n = len(spectra)
    g = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(21, dtype=np.int64)[None, :]
    scf = (3 * j + 5 * g + scf_seed) % 8
    try:
        enc = M3.encode_mp3(
            spectra,
            scalefactors=scf,
            scalefac_compress=13,
            count1table_select=int(c1b),
            use_reservoir=reservoir,
            bitrate_kbps=320,
        )
    except ValueError as exc:
        # dense max-entropy spectra can legitimately exceed even the
        # top CBR frame budget — the named capacity error, not a bug
        assume("frame budget" not in str(exc))
        raise
    frames = M3.decode_mp3(enc)
    got = np.vstack([
        gg["samples"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ])[:n]
    got_scf = np.vstack([
        gg["scalefactors"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ])[:n]
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(_mp3_spectrum(nmax=15), min_size=1, max_size=4),
    st.integers(0, 7),
    st.booleans(),
)
def test_mp3_roundtrip_property_full_alphabet(spectra, scf_seed, c1b):
    """r13: the encoder auto-selects among pair tables 1-15 for
    big-region magnitudes up to |15|; every shipped table's codewords
    must survive the round trip on arbitrary legal spectra."""
    from hypothesis import assume

    spectra = np.stack(spectra)
    n = len(spectra)
    g = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(21, dtype=np.int64)[None, :]
    scf = (3 * j + 5 * g + scf_seed) % 8
    try:
        enc = M3.encode_mp3(
            spectra,
            scalefactors=scf,
            scalefac_compress=13,
            count1table_select=int(c1b),
            bitrate_kbps=320,
        )
    except ValueError as exc:
        # |15| values at max entropy can exceed even the top CBR
        # frame budget — the named capacity error, not a bug
        assume("frame budget" not in str(exc))
        raise
    frames = M3.decode_mp3(enc)
    got = np.vstack([
        gg["samples"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ])[:n]
    assert np.array_equal(got, spectra)
    # the selected table covers the big region per granule
    sides = [
        gg["side"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ][:n]
    for k, s in enumerate(sides):
        bv2 = s["big_values"] * 2
        if bv2:
            sel = s["table_select"][0]
            assert sel != 0
            assert int(np.abs(spectra[k][:bv2]).max()) < M3.pair_table(
                sel
            )["n"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_mp3_spectrum(nmax=5), min_size=2, max_size=4),
    st.integers(0, 7),
)
def test_mp3_roundtrip_property_mixed_blocks(spectra, scf_seed):
    """r13: MIXED short/long granules (35 scalefactors, fixed 36-line
    region0) round-trip on arbitrary legal spectra."""
    from hypothesis import assume

    spectra = np.stack(spectra)
    n = len(spectra)
    g = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(35, dtype=np.int64)[None, :]
    scf = (3 * j + 5 * g + scf_seed) % 8
    try:
        enc = M3.encode_mp3(
            spectra,
            scalefactors=scf,
            scalefac_compress=13,
            block_type=2,
            mixed_block=True,
            bitrate_kbps=320,
        )
    except ValueError as exc:
        assume("frame budget" not in str(exc))
        raise
    frames = M3.decode_mp3(enc)
    got = np.vstack([
        gg["samples"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ])[:n]
    got_scf = np.vstack([
        gg["scalefactors"] for fr in frames for chs in fr["granules"]
        for gg in chs
    ])[:n]
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)
