"""MP3 Layer III compressed-domain codec (operators/mp3_layer3.py)."""

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.operators import mp3_layer3 as M
from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import _BR, _BW


# ---------------------------------------------------------------------------
# structural proofs for every shipped Huffman table
# ---------------------------------------------------------------------------


def _check_complete_prefix_free(pairs, label):
    """pairs: list of (len, code).  Kraft sum must be exactly 1 and
    no code may prefix another — the two structural properties every
    ISO Layer III Huffman table has."""
    kraft = sum(2 ** -ln for ln, _ in pairs)
    assert kraft == 1.0, f"{label}: Kraft sum {kraft}"
    bitstrings = [format(code, f"0{ln}b") for ln, code in pairs]
    assert len(set(bitstrings)) == len(bitstrings), f"{label}: dup code"
    for a in bitstrings:
        for b in bitstrings:
            if a is not b:
                assert not b.startswith(a), f"{label}: {a} prefixes {b}"


def test_pair_tables_complete_and_prefix_free():
    for t, tab in M.HUFF_PAIR.items():
        pairs = [
            (tab["lens"][x][y], tab["codes"][x][y])
            for x in range(tab["n"])
            for y in range(tab["n"])
        ]
        _check_complete_prefix_free(pairs, f"table {t}")


def test_count1_tables_complete_and_prefix_free():
    for t, tab in M.COUNT1.items():
        _check_complete_prefix_free(
            list(zip(tab["lens"], tab["codes"])), f"count1 {t}"
        )


def test_sfb_long_tables_cover_576():
    for rate, bounds in M.SFB_LONG.items():
        assert bounds[0] == 0 and bounds[-1] == 576, rate
        assert len(bounds) == 23, rate
        assert all(b < a for b, a in zip(bounds, bounds[1:])), rate


def test_slen_table_shape():
    assert len(M.SLEN) == 16
    assert M.SLEN[0] == (0, 0) and M.SLEN[15] == (4, 3)


# ---------------------------------------------------------------------------
# fixture spectra
# ---------------------------------------------------------------------------


def _spectrum(seed, n_big=120, n_quad=80):
    """Deterministic legal spectrum: big region |v|<=3 (first n_big
    lines), count1 region |v|<=1 (next n_quad), zero tail."""
    out = np.zeros(576, np.int64)
    for i in range(n_big):
        v = (7 * i + seed) % 7 - 3  # -3..3
        out[i] = v
    for i in range(n_big, n_big + n_quad):
        out[i] = (5 * i + seed) % 3 - 1  # -1..1
    # ensure the big region boundary is real: the first region must
    # contain a |v|>1 value so big_values covers it
    out[n_big - 1] = 3 if out[n_big - 1] >= 0 else -3
    return out


def _scf(seed):
    return np.array([(3 * i + seed) % 8 for i in range(21)], np.int64)


def _roundtrip(spectra, scf, **kw):
    kw.setdefault("scalefac_compress", 13)  # slen (3,3): scf values <= 7
    enc = M.encode_mp3(spectra, scalefactors=scf, **kw)
    frames = M.decode_mp3(enc)
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    got_scf = np.vstack([
        g["scalefactors"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    return enc, frames, got, got_scf


def test_roundtrip_single_frame():
    spectra = np.vstack([_spectrum(1), _spectrum(2)])
    scf = np.vstack([_scf(0), _scf(1)])
    enc, frames, got, got_scf = _roundtrip(spectra, scf)
    assert len(frames) == 1
    hdr = frames[0]["header"]
    assert hdr["layer"] == 3 and hdr["sample_rate"] == 44100
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)


def test_roundtrip_multiframe_and_tables():
    # 8 granules; exercise count1 table A and B, scalefac_compress
    # variants, and both pair tables (1 via small values, 5 via big)
    spectra = np.vstack([_spectrum(s, n_big=40 + 30 * (s % 3)) for s in range(8)])
    scf = np.vstack([_scf(s) % 4 for s in range(8)])
    for c1 in (0, 1):
        for sfc in (9, 13):  # slen (2,2)/(3,3) hold the %4 values
            enc, frames, got, got_scf = _roundtrip(
                spectra, scf,
                count1table_select=c1, scalefac_compress=sfc,
            )
            assert len(frames) == 4
            assert np.array_equal(got, spectra)
            assert np.array_equal(got_scf, scf)


def test_roundtrip_bit_reservoir():
    spectra = np.vstack([_spectrum(s) for s in range(12)])
    scf = np.vstack([_scf(s) for s in range(12)])
    enc, frames, got, got_scf = _roundtrip(
        spectra, scf, use_reservoir=True
    )
    begins = [f["side_info"]["main_data_begin"] for f in frames]
    assert begins[0] == 0
    assert any(b > 0 for b in begins[1:]), begins  # reservoir exercised
    assert all(b <= 511 for b in begins)
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)


def test_roundtrip_scfsi_sharing():
    # granule pairs share scalefactor bands 1 and 3 via scfsi
    scf = np.vstack([_scf(s) for s in range(4)])
    scf[1] = scf[0]
    scf[3] = scf[2]
    spectra = np.vstack([_spectrum(s) for s in range(4)])
    enc, frames, got, got_scf = _roundtrip(
        spectra, scf, scfsi_bands=(1, 3)
    )
    assert frames[0]["side_info"]["scfsi"][0] == [0, 1, 0, 1]
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)
    # sharing must shrink part2_3_length vs the unshared stream
    enc2 = M.encode_mp3(spectra, scalefactors=scf, scalefac_compress=13)
    p_shared = frames[0]["granules"][1][0]["side"]["part2_3_length"]
    p_full = M.decode_mp3(enc2)[0]["granules"][1][0]["side"][
        "part2_3_length"
    ]
    assert p_shared < p_full


def test_zero_spectrum_and_odd_granules():
    spectra = np.zeros((3, 576), np.int64)  # odd count -> padded
    enc = M.encode_mp3(spectra)
    frames = M.decode_mp3(enc)
    assert len(frames) == 2
    for fr in frames:
        for chs in fr["granules"]:
            for g in chs:
                assert g["samples"].sum() == 0
                assert g["side"]["big_values"] == 0


def test_region_boundaries_clamp():
    g = {"big_values": 10, "region0_count": 7, "region1_count": 7}
    r0, r1, bv2 = M.region_boundaries(g, 44100)
    assert bv2 == 20
    assert r0 == 20 and r1 == 20  # clamped at big_values*2
    g2 = {"big_values": 200, "region0_count": 7, "region1_count": 7}
    r0, r1, bv2 = M.region_boundaries(g2, 44100)
    # sfb[region0_count+1] = sfb[8] = 36; sfb[r0c+r1c+2] = sfb[16] = 162
    assert (r0, r1, bv2) == (36, 162, 400)


def test_named_errors():
    with pytest.raises(NotImplementedError, match="not transcribed"):
        M.pair_table(16)  # ESC tables failed the transcription proofs
    with pytest.raises(NotImplementedError, match="not transcribed"):
        M.pair_table(31)
    with pytest.raises(NotImplementedError, match="not transcribed"):
        M.pair_table(4)  # table 4 does not exist in the standard
    spectra = np.zeros((2, 576), np.int64)
    spectra[0, 0] = 16  # beyond the shipped-table alphabet
    with pytest.raises(ValueError, match="limited to"):
        M.encode_mp3(spectra)
    with pytest.raises(ValueError, match="no band table"):
        M.region_boundaries(
            {"big_values": 1, "region0_count": 0, "region1_count": 0},
            12345,
        )


# ---------------------------------------------------------------------------
# pair tables 7-15 (r13) + mixed blocks
# ---------------------------------------------------------------------------


def _big_spectrum(seed, nmax, n_big=120, n_quad=80):
    """Legal spectrum with big-region values spanning the FULL
    [-nmax, nmax] alphabet of the table under test."""
    out = np.zeros(576, np.int64)
    m = 2 * nmax + 1
    for i in range(n_big):
        out[i] = (7 * i + seed) % m - nmax
    for i in range(n_big, n_big + n_quad):
        out[i] = (5 * i + seed) % 3 - 1
    out[n_big - 1] = nmax  # pin the big-region boundary
    return out


@pytest.mark.parametrize("sel", [7, 8, 9, 10, 11, 12, 13, 15])
def test_roundtrip_big_tables_forced(sel):
    nmax = M.HUFF_PAIR[sel]["n"] - 1
    spectra = np.vstack(
        [_big_spectrum(s, nmax, n_big=60 + 20 * s) for s in range(4)]
    )
    scf = np.vstack([_scf(s) for s in range(4)])
    enc = M.encode_mp3(
        spectra, scalefactors=scf, scalefac_compress=13,
        pair_table_select=sel,
    )
    frames = M.decode_mp3(enc)
    sides = [
        g["side"] for fr in frames for chs in fr["granules"] for g in chs
    ]
    assert all(s["table_select"] == [sel] * 3 for s in sides)
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    # the alphabet was actually exercised to its extremes
    assert int(np.abs(spectra).max()) == nmax


def test_auto_table_choice():
    # the encoder picks the smallest shipped table covering the
    # big-region magnitude; the decoder round-trips each
    for nmax, want in ((3, 5), (5, 7), (7, 10), (15, 13)):
        spectra = _big_spectrum(1, nmax)[None, :]
        enc = M.encode_mp3(spectra, scalefac_compress=13)
        fr = M.decode_mp3(enc)
        g = fr[0]["granules"][0][0]
        assert g["side"]["table_select"][0] == want, (nmax, want)
        assert np.array_equal(g["samples"], spectra[0])


def test_forced_table_too_small():
    spectra = _big_spectrum(0, 7)[None, :]
    with pytest.raises(ValueError, match="exceeds forced table"):
        M.encode_mp3(spectra, pair_table_select=7)


def test_roundtrip_mixed_blocks():
    # MIXED short/long granules: 35 scalefactors (8 long bands at
    # slen1 + short sfb 3..5 x3 at slen1 + 6..11 x3 at slen2), the
    # fixed 36-line region0, mixed_block_flag set, region walk exact
    spectra = np.vstack(
        [_big_spectrum(s, 5, n_big=80) for s in range(4)]
    )
    scf = np.array(
        [[(5 * k + g) % 8 for k in range(35)] for g in range(4)],
        np.int64,
    )
    enc = M.encode_mp3(
        spectra, scalefactors=scf, scalefac_compress=13,
        block_type=2, mixed_block=True, use_reservoir=True,
    )
    frames = M.decode_mp3(enc)
    sides = [
        g["side"] for fr in frames for chs in fr["granules"] for g in chs
    ]
    assert all(
        s["window_switching"] and s["block_type"] == 2
        and s["mixed_block_flag"] == 1
        for s in sides
    )
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    got_scf = np.vstack([
        g["scalefactors"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)
    # mixed region0 is the 8 long bands = line 36 at every MPEG-1 rate
    r0, r1, bv2 = M.region_boundaries(sides[0], 44100)
    assert r0 == 36 and r1 == bv2


def test_mixed_block_guards():
    spectra = np.zeros((2, 576), np.int64)
    with pytest.raises(ValueError, match="requires block_type 2"):
        M.encode_mp3(spectra, mixed_block=True)
    with pytest.raises(ValueError, match="35 scalefactors"):
        M._encode_granule_main(
            {"window_switching": 1, "block_type": 2,
             "mixed_block_flag": 1, "scalefac_compress": 13,
             "big_values": 0, "table_select": [1, 1],
             "count1table_select": 1},
            [0] * 36, np.zeros(576, np.int64), 44100, [0] * 4, 0,
        )


def test_esc_linbits_mechanism():
    # the ESC/linbits framework decodes through an injected registry-
    # shaped table (MECHANISM test only: tables 16-31 are not shipped,
    # so this fake 16-ary table exists purely to drive the code path)
    fake_lookup = {(4, x): (15, 0) for x in range(1)}  # '0000' -> (15,0)
    fake_lookup[(1, 1)] = (0, 0)  # '1' -> (0,0)
    bw = _BW()
    bw.w(0, 4)       # codeword for (15, 0)
    bw.w(5, 4)       # linbits value 5 -> x = 20
    bw.w(1, 1)       # sign: negative
    bw.pad_to_byte()
    br = _BR(bytes(bw.buf), 0)
    x, y = M._decode_pair(br, 1, lookup=fake_lookup, linbits=4)
    assert (x, y) == (-20, 0)


def test_side_info_guards():
    spectra = np.vstack([_spectrum(1), _spectrum(2)])
    enc = M.encode_mp3(spectra)
    # corrupting big_values beyond 288 raises the named error: the
    # field lives in the first side-info granule block
    frames = M.decode_mp3(enc)
    assert frames[0]["side_info"]["granules"][0][0]["big_values"] <= 288
    with pytest.raises(ValueError, match="big_values"):
        M.parse_side_info(
            b"\x00\x00" + b"\xff" * 40, 0, 1
        )


def test_granule_features():
    spectra = np.vstack([_spectrum(3), _spectrum(4)])
    scf = np.vstack([_scf(2), _scf(3)])
    enc = M.encode_mp3(spectra, scalefactors=scf, scalefac_compress=13)
    rows = M.mp3_granule_features(enc)
    assert len(rows) == 2
    for gr, row in enumerate(rows):
        assert row["sample_sum"] == int(spectra[gr].sum())
        assert row["abs_sum"] == int(np.abs(spectra[gr]).sum())
        assert row["nonzero"] == int(np.count_nonzero(spectra[gr]))
        assert row["scf_sum"] == int(scf[gr].sum())
        assert len(row["fingerprint"]) == 32
    # fingerprints differ across granules, stable across calls
    assert rows[0]["fingerprint"] != rows[1]["fingerprint"]
    assert M.mp3_granule_features(enc)[0]["fingerprint"] == rows[0][
        "fingerprint"
    ]


def test_scalefactors_only_walk():
    # samples=False must parse identical side info + scalefactors
    # while skipping the Huffman stage entirely
    spectra = np.vstack([_spectrum(s) for s in range(6)])
    scf = np.vstack([_scf(s) for s in range(6)])
    enc = M.encode_mp3(spectra, scalefactors=scf, scalefac_compress=13,
                       use_reservoir=True)
    full = M.decode_mp3(enc)
    fast = M.decode_mp3(enc, samples=False)
    assert len(full) == len(fast)
    for fr_a, fr_b in zip(full, fast):
        assert fr_a["side_info"] == fr_b["side_info"]
        for chs_a, chs_b in zip(fr_a["granules"], fr_b["granules"]):
            for a, b in zip(chs_a, chs_b):
                assert a["scalefactors"] == b["scalefactors"]
                assert "samples" not in b


def test_roundtrip_stereo():
    # independently-coded stereo (mode 00, 32-byte side info): both
    # channels' spectra and scalefactors survive the full walk,
    # including the reservoir
    n_gr = 6
    spectra = np.stack(
        [
            np.stack([_spectrum(2 * g), _spectrum(2 * g + 1)])
            for g in range(n_gr)
        ]
    )
    scf = np.stack(
        [np.stack([_scf(g), _scf(g + 7)]) for g in range(n_gr)]
    )
    enc = M.encode_mp3(
        spectra, scalefactors=scf, scalefac_compress=13,
        use_reservoir=True,
    )
    frames = M.decode_mp3(enc)
    assert frames[0]["header"]["channels"] == 2
    assert frames[0]["side_info"]["nbytes"] == 32
    got = np.stack([
        np.stack([chs[0]["samples"], chs[1]["samples"]])
        for fr in frames for chs in fr["granules"]
    ])
    got_scf = np.stack([
        np.stack([chs[0]["scalefactors"], chs[1]["scalefactors"]])
        for fr in frames for chs in fr["granules"]
    ])
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)
    assert any(
        f["side_info"]["main_data_begin"] > 0 for f in frames[1:]
    )


def test_stereo_scfsi_per_channel():
    scf = np.stack(
        [np.stack([_scf(g % 2), _scf(3 + g % 2)]) for g in range(4)]
    )
    # make granule pairs share band 2 per channel
    scf[1] = scf[0]
    scf[3] = scf[2]
    spectra = np.stack(
        [np.stack([_spectrum(g), _spectrum(g + 9)]) for g in range(4)]
    )
    enc = M.encode_mp3(
        spectra, scalefactors=scf, scalefac_compress=13,
        scfsi_bands=(2,),
    )
    frames = M.decode_mp3(enc)
    assert frames[0]["side_info"]["scfsi"] == [[0, 0, 1, 0]] * 2
    got_scf = np.stack([
        np.stack([chs[0]["scalefactors"], chs[1]["scalefactors"]])
        for fr in frames for chs in fr["granules"]
    ])
    assert np.array_equal(got_scf, scf)


def test_roundtrip_short_blocks():
    # block_type 2 (window-switched short blocks, non-mixed): 36
    # scalefactors per granule (12 sfb x 3 windows), fixed 36-line
    # region split, two table_select fields, subblock_gain parsed
    spectra = np.vstack([_spectrum(s, n_big=60) for s in range(4)])
    scf = np.array(
        [[(5 * k + g) % 8 for k in range(36)] for g in range(4)],
        np.int64,
    )
    enc = M.encode_mp3(
        spectra, scalefactors=scf, scalefac_compress=13, block_type=2,
        use_reservoir=True,
    )
    frames = M.decode_mp3(enc)
    sides = [
        g["side"] for fr in frames for chs in fr["granules"] for g in chs
    ]
    assert all(s["window_switching"] and s["block_type"] == 2
               for s in sides)
    assert all(s["subblock_gain"] == [0, 0, 0] for s in sides)
    assert all(len(s["table_select"]) == 2 for s in sides)
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    got_scf = np.vstack([
        g["scalefactors"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    assert np.array_equal(got_scf, scf)
    # fixed short split: region0 clamps at 36
    r0, r1, bv2 = M.region_boundaries(sides[0], 44100)
    assert r0 == 36 and r1 == bv2


def test_short_block_guards():
    spectra = np.zeros((2, 576), np.int64)
    with pytest.raises(ValueError, match="block_type 0 or 2"):
        M.encode_mp3(spectra, block_type=1)
    with pytest.raises(ValueError, match="never applies to short"):
        M.encode_mp3(spectra, block_type=2, scfsi_bands=(1,))
    with pytest.raises(ValueError, match="36 scalefactors"):
        M._encode_granule_main(
            {"window_switching": 1, "block_type": 2,
             "mixed_block_flag": 0, "scalefac_compress": 13,
             "big_values": 0, "table_select": [1, 1],
             "count1table_select": 1},
            [0] * 21, np.zeros(576, np.int64), 44100, [0] * 4, 0,
        )


def test_stream_info_integration():
    # the layer-agnostic header walk (operators/mpeg_audio.stream_info)
    # must walk encode_mp3 output: frame count, duration, CBR detection
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        stream_info,
    )

    spectra = np.vstack([_spectrum(s) for s in range(8)])
    enc = M.encode_mp3(spectra, scalefac_compress=13)
    info = stream_info(enc)
    assert info["n_frames"] == 4
    assert info["total_samples"] == 4 * 1152
    assert info["is_vbr"] is False or info["is_vbr"] == 0


def test_truncated_stream_named_error():
    # cutting the final frame's main_data must raise the module's
    # named ValueError, never a bare IndexError from the bit reader
    spectra = np.vstack([_spectrum(1), _spectrum(2)])
    enc = M.encode_mp3(spectra, scalefac_compress=13)
    with pytest.raises(ValueError, match="reservoir|truncated"):
        M.decode_mp3(enc[:-300])


def test_partial_final_quad_boundary():
    # 576 - bv2 == 2 (mod 4): without realignment lines past the last
    # full quad would be uncodable rzero; the encoder absorbs two more
    # lines into big_values (r14) so both shapes round-trip
    sp = np.zeros((2, 576), np.int64)
    sp[0, 0] = 2          # bv2 = 2 -> quads tile 2..574, tail 574-575
    sp[0, 2:574] = np.resize([1, 0, -1, 0], 572)
    enc = M.encode_mp3(sp, scalefac_compress=13)
    got = np.vstack([
        g["samples"] for fr in M.decode_mp3(enc)
        for chs in fr["granules"] for g in chs
    ])
    assert np.array_equal(got, sp)
    tail1 = sp.copy()
    tail1[0, 575] = 1     # in the tail -> encoder realigns the quad
    enc2 = M.encode_mp3(tail1, scalefac_compress=13)  # r14: absorbs
    got2 = np.vstack([
        g["samples"] for fr in M.decode_mp3(enc2)
        for chs in fr["granules"] for g in chs
    ])
    assert np.array_equal(got2, tail1)


def test_decode_tagged_stream():
    # real crawl MP3s wrap the audio in ID3 tags: a leading ID3v2
    # block (syncsafe size) and a trailing 128-byte ID3v1 'TAG' block
    # must be skipped by the frame walk (r13, mpeg_audio.id3_bounds)
    spectra = np.vstack([_spectrum(1), _spectrum(2)])
    scf = np.vstack([_scf(0), _scf(1)])
    enc = M.encode_mp3(spectra, scalefactors=scf, scalefac_compress=13)
    payload = b"\x00" * 100  # 100-byte tag body
    id3v2 = b"ID3\x04\x00\x00" + bytes(
        [(100 >> 21) & 0x7F, (100 >> 14) & 0x7F, (100 >> 7) & 0x7F,
         100 & 0x7F]
    ) + payload
    id3v1 = b"TAG" + b"\x00" * 125
    tagged = id3v2 + enc + id3v1
    frames = M.decode_mp3(tagged)
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    assert frames[0]["offset"] == len(id3v2)
    # samples=False walk too (the crawl fingerprint path)
    fast = M.decode_mp3(tagged, samples=False)
    assert len(fast) == len(frames)


def test_decode_truncated_final_frame_named_error():
    # a final frame cut short (by the stream end or the ID3v1 trim)
    # must raise the named error, never decode tag bytes as audio
    spectra = np.vstack([_spectrum(1), _spectrum(2)])
    enc = M.encode_mp3(spectra, scalefac_compress=13)
    cut = enc[:-50]
    with pytest.raises(ValueError, match="truncated"):
        M.decode_mp3(cut)
    # appending an ID3v1 tag to the CUT stream must not resurrect it:
    # the trim exposes the truncation instead of silently decoding
    # 'TAG' bytes as Huffman main data
    with pytest.raises(ValueError, match="truncated"):
        M.decode_mp3(cut + b"TAG" + b"\x00" * 125)


def test_decode_skips_xing_info_frame():
    # both public walkers (stream_info and decode_mp3) must agree: a
    # LAME Xing/Info first frame carries no audio and never injects an
    # all-zero leading frame into the fingerprint
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        parse_header,
        stream_info,
    )

    spectra = np.vstack([_spectrum(3), _spectrum(4)])
    audio = M.encode_mp3(spectra, scalefac_compress=13)
    hdr4 = _header(3, 128, 44100, 0, 0b11, False)
    frame_bytes = parse_header(hdr4, 0)["frame_bytes"]
    body = (
        b"\x00" * 17 + b"Info" + (0x3).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + len(audio).to_bytes(4, "big")
    )
    info_frame = (hdr4 + body).ljust(frame_bytes, b"\x00")
    frames = M.decode_mp3(info_frame + audio)
    assert len(frames) == 1  # the one audio frame; info frame skipped
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    assert stream_info(info_frame + audio)["n_frames"] == len(frames) * 2 // 2


def test_stream_info_xing_only_prefix():
    # range-request shape: the info frame arrives whole, the first
    # audio frame is cut — the encoder-declared totals must survive
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        parse_header,
        stream_info,
    )

    spectra = np.vstack([_spectrum(5), _spectrum(6)])
    audio = M.encode_mp3(spectra, scalefac_compress=13)
    hdr4 = _header(3, 128, 44100, 0, 0b11, False)
    frame_bytes = parse_header(hdr4, 0)["frame_bytes"]
    body = (
        b"\x00" * 17 + b"Xing" + (0x3).to_bytes(4, "big")
        + (200).to_bytes(4, "big") + len(audio).to_bytes(4, "big")
    )
    info_frame = (hdr4 + body).ljust(frame_bytes, b"\x00")
    got = stream_info(info_frame + audio[:100])
    assert got["n_frames"] == 0 and got["xing_frames"] == 200
    assert got["duration_ms"] == 200 * 1152 * 1000 // 44100
    assert got["is_vbr"] in (True, 1)


def test_xing_frame_feeds_bit_reservoir():
    # LAME may stash bit-reservoir bytes in the info frame's ancillary
    # region: the first AUDIO frame's main_data_begin can legally
    # reach back into the skipped Xing/Info frame's post-side-info
    # pool (r13 ADVICE).  Hand-shift the first k main-data bytes of a
    # real encoded frame into the tail of an Info frame and decode.
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        parse_header,
    )

    spectra = np.vstack([_spectrum(3), _spectrum(4)])
    audio = M.encode_mp3(spectra, scalefac_compress=13)
    ref = M.decode_mp3(audio)
    # mono MPEG-1, no CRC: header 4, side info 17 (main_data_begin is
    # the first 9 bits and is 0 as encoded)
    k = 5
    side = bytearray(audio[4:21])
    assert side[0] == 0 and side[1] >> 7 == 0  # encoder wrote mdb=0
    side[0] |= k >> 1
    side[1] |= (k & 1) << 7
    moved, rest = audio[21 : 21 + k], audio[21 + k :]
    shifted = audio[:4] + bytes(side) + rest + b"\x00" * k
    assert len(shifted) == len(audio)
    hdr4 = _header(3, 128, 44100, 0, 0b11, False)
    frame_bytes = parse_header(hdr4, 0)["frame_bytes"]
    body = (
        b"\x00" * 17 + b"Info" + (0x3).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + len(audio).to_bytes(4, "big")
    )
    info_frame = (hdr4 + body).ljust(frame_bytes - k, b"\x00") + moved
    frames = M.decode_mp3(info_frame + shifted)
    assert len(frames) == 1
    got = np.vstack([
        g["samples"] for fr in frames for chs in fr["granules"]
        for g in chs
    ])
    assert np.array_equal(got, spectra)
    # the granules decode IDENTICALLY to the unshifted stream
    for fr_ref, fr_got in zip(ref, frames):
        for chs_ref, chs_got in zip(fr_ref["granules"], fr_got["granules"]):
            for g_ref, g_got in zip(chs_ref, chs_got):
                assert g_ref["scalefactors"] == g_got["scalefactors"]
    # without the info-frame pool the same shifted stream must raise
    # the named reservoir error, not decode garbage
    with pytest.raises(ValueError, match="reservoir"):
        M.decode_mp3(shifted)


def test_parse_xing_magic_read_stays_in_frame():
    # the magic read must be bounded to THIS frame: a coincidental
    # 'Xing' whose bytes straddle into the next frame's payload must
    # not classify the frame as an info frame (r13 ADVICE)
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        _parse_xing,
        parse_header,
    )

    hdr4 = _header(3, 128, 44100, 0, 0b11, False)
    hdr = parse_header(hdr4, 0)
    # synthetic undersized frame: pool ends 2 bytes after the side
    # info, so pos+4 crosses frame_end while data[pos:pos+4] == 'Xing'
    small = dict(hdr, frame_bytes=23)
    data = hdr4 + b"\x00" * 17 + b"Xi" + b"ng" + b"\x00" * 16
    assert data[21:25] == b"Xing"
    assert _parse_xing(data, 0, small) is None
    # the same bytes with the frame large enough DO parse (flags 0)
    big = dict(hdr, frame_bytes=40)
    got = _parse_xing(data, 0, big)
    assert got is not None and got["tag"] == "Xing"


# ---------------------------------------------------------------------------
# LSF (MPEG-2 / 2.5) sample decode — r14 (VERDICT r13 task 3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("version,rate,kbps", [
    ("2", 22050, 64), ("2", 24000, 64), ("2", 16000, 48),
    ("2.5", 11025, 32), ("2.5", 12000, 32), ("2.5", 8000, 16),
])
def test_lsf_roundtrip_all_rates(version, rate, kbps):
    spectra = np.vstack([_spectrum(3), _spectrum(4), _spectrum(5)])
    enc = M.encode_mp3(spectra, sample_rate=rate, bitrate_kbps=kbps,
                       scalefac_compress=86, version=version)
    frames = M.decode_mp3(enc)
    assert len(frames) == 3  # ONE granule per frame
    assert all(len(f["granules"]) == 1 for f in frames)
    got = np.vstack([
        g["samples"] for f in frames for c in f["granules"] for g in c
    ])
    assert np.array_equal(got, spectra)
    # scalefactors-only fingerprint walk parses the same stream
    fp = M.decode_mp3(enc, samples=False)
    assert [f["offset"] for f in fp] == [f["offset"] for f in frames]


def test_lsf_scale_layout_groups():
    # blocknumber ranges and group sums (ISO 13818-3 2.4.3.2): totals
    # are 21 long / 36 short / 33 mixed for every blocknumber
    for sc in (0, 86, 203, 399, 400, 450, 499, 500, 507, 511):
        for bt, mixed, want in ((0, 0, 21), (2, 0, 36), (2, 1, 33)):
            slens, nr, preflag = M.lsf_scale_layout(sc, bt, mixed)
            assert sum(nr) == want
            assert preflag == (1 if sc >= 500 else 0)
            assert all(s <= 5 for s in slens)


def test_lsf_scalefactors_short_mixed_bn_paths():
    # short (36), mixed (33), bn1 (slen-0 tail group), bn2 (derived
    # preflag) all round-trip their scalefactor values exactly
    scf = np.arange(2 * 36).reshape(2, 36) % 4
    enc = M.encode_mp3(np.vstack([_spectrum(1), _spectrum(2)]),
                       sample_rate=24000, bitrate_kbps=64, version="2",
                       block_type=2, scalefac_compress=203,
                       scalefactors=scf)
    fr = M.decode_mp3(enc)
    assert [g["scalefactors"] for f in fr for c in f["granules"]
            for g in c] == [list(map(int, r)) for r in scf]

    scf = np.arange(2 * 33).reshape(2, 33) % 4
    enc = M.encode_mp3(np.vstack([_spectrum(1), _spectrum(2)]),
                       sample_rate=22050, bitrate_kbps=64, version="2",
                       block_type=2, mixed_block=True,
                       scalefac_compress=203, scalefactors=scf)
    fr = M.decode_mp3(enc)
    assert [g["scalefactors"] for f in fr for c in f["granules"]
            for g in c] == [list(map(int, r)) for r in scf]

    scf = np.arange(2 * 21).reshape(2, 21) % 3
    scf[:, 18:] = 0  # bn1 group 4 (nr 3) carries slen 0
    enc = M.encode_mp3(np.vstack([_spectrum(1), _spectrum(2)]),
                       sample_rate=22050, bitrate_kbps=64, version="2",
                       scalefac_compress=450, scalefactors=scf)
    fr = M.decode_mp3(enc)
    assert [g["scalefactors"] for f in fr for c in f["granules"]
            for g in c] == [list(map(int, r)) for r in scf]
    assert fr[0]["granules"][0][0]["side"]["preflag"] == 0

    scf = np.arange(2 * 21).reshape(2, 21) % 2
    scf[:, 11:] = 0
    enc = M.encode_mp3(np.vstack([_spectrum(1), _spectrum(2)]),
                       sample_rate=22050, bitrate_kbps=64, version="2",
                       scalefac_compress=507, scalefactors=scf)
    fr = M.decode_mp3(enc)
    assert fr[0]["granules"][0][0]["side"]["preflag"] == 1
    assert [g["scalefactors"] for f in fr for c in f["granules"]
            for g in c] == [list(map(int, r)) for r in scf]


def test_lsf_reservoir_and_stereo():
    spectra = np.vstack([_spectrum(i) for i in range(8)])
    enc = M.encode_mp3(spectra, sample_rate=22050, bitrate_kbps=64,
                       version="2", use_reservoir=True)
    fr = M.decode_mp3(enc)
    mdbs = [f["side_info"]["main_data_begin"] for f in fr]
    assert any(m > 0 for m in mdbs)
    assert max(mdbs) <= 255  # 8-bit LSF main_data_begin cap
    got = np.vstack([g["samples"] for f in fr for c in f["granules"]
                     for g in c])
    assert np.array_equal(got, spectra)

    st = np.stack([np.vstack([_spectrum(1), _spectrum(2)]),
                   np.vstack([_spectrum(3), _spectrum(4)])], axis=1)
    enc = M.encode_mp3(st, sample_rate=24000, bitrate_kbps=96,
                       version="2")
    fr = M.decode_mp3(enc)
    got = np.stack([[g["samples"] for g in f["granules"][0]]
                    for f in fr])
    assert np.array_equal(got, st)


def test_lsf_8000hz_wide_band_short_split():
    # the 8000 Hz short-block region0 split is 72 lines (3 x the
    # wide-band table's third boundary 24), not 36
    g = {"big_values": 100, "window_switching": 1, "block_type": 2,
         "mixed_block_flag": 0}
    assert M.region_boundaries(g, 8000)[0] == 72
    assert M.region_boundaries(g, 11025)[0] == 36
    enc = M.encode_mp3(np.vstack([_spectrum(1)]), sample_rate=8000,
                       bitrate_kbps=16, version="2.5", block_type=2,
                       scalefac_compress=203,
                       scalefactors=np.zeros((1, 36), np.int64))
    fr = M.decode_mp3(enc)
    assert np.array_equal(fr[0]["granules"][0][0]["samples"],
                          _spectrum(1))


def test_lsf_intensity_stereo_named_error():
    # joint-stereo LSF with the intensity bit set uses ISO 13818-3
    # blocknumbers 3-5 for the right channel — a named error, never a
    # silent misparse
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        parse_header,
    )

    st = np.stack([np.vstack([_spectrum(1)]),
                   np.vstack([_spectrum(2)])], axis=1)
    enc = bytearray(M.encode_mp3(st, sample_rate=22050,
                                 bitrate_kbps=64, version="2"))
    # rewrite header: mode 01 (joint stereo), mode_extension bit 0 set
    enc[3] = (enc[3] & 0b00001111) | (0b01 << 6) | (0b01 << 4)
    hdr = parse_header(bytes(enc), 0)
    assert hdr["mode"] == 0b01 and hdr["mode_extension"] & 1
    with pytest.raises(NotImplementedError, match="intensity"):
        M.decode_mp3(bytes(enc))
    # MS stereo (mode_extension bit 1 only) parses fine
    enc[3] = (enc[3] & 0b00001111) | (0b01 << 6) | (0b10 << 4)
    fr = M.decode_mp3(bytes(enc))
    assert np.array_equal(fr[0]["granules"][0][0]["samples"],
                          _spectrum(1))


def test_lsf_stream_info_walker_parity():
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        stream_info,
    )

    enc = M.encode_mp3(np.vstack([_spectrum(i) for i in range(5)]),
                       sample_rate=22050, bitrate_kbps=64, version="2")
    info = stream_info(enc)
    assert info["n_frames"] == len(M.decode_mp3(enc)) == 5
    assert info["total_samples"] == 5 * 576


# ---------------------------------------------------------------------------
# Solver-repaired tables 12/13 hardening (r14 — VERDICT r13 task 4)
# ---------------------------------------------------------------------------


def test_solver_repaired_entries_pinned():
    # the two r13 solver-deduced repairs, pinned so any re-transcription
    # that changes either length (or code) fails loudly
    assert M.HUFF_PAIR[12]["lens"][6][4] == 8
    assert M.HUFF_PAIR[12]["codes"][6][4] == 10
    assert M.HUFF_PAIR[13]["lens"][5][14] == 14
    assert M.HUFF_PAIR[13]["codes"][5][14] == 41


@pytest.mark.parametrize("sel", [12, 13])
def test_every_pair_roundtrips_through_forced_table(sel):
    # EVERY (x, y) pair of the table under test rides its actual
    # codeword through a real granule — auto-table selection cannot
    # route around a suspect entry, and a single wrong length would
    # desynchronize the bit stream for every pair after it (VERDICT
    # r13: the full-|15| property tests could route around tables
    # 12/13; this one cannot)
    n = M.HUFF_PAIR[sel]["n"]
    pairs = [(x, y) for x in range(n) for y in range(n)]
    # put a |v|>1 pair LAST so big_values covers every pair (pairs
    # with both values <= 1 would otherwise fall into count1)
    pairs.sort(key=lambda p: (max(p) > 1, p))
    assert max(pairs[-1]) > 1
    lines = np.zeros(576, np.int64)
    sign = 1
    for k, (x, y) in enumerate(pairs):
        lines[2 * k] = sign * x
        lines[2 * k + 1] = -sign * y
        sign = -sign
    enc = M.encode_mp3(lines[None, :], pair_table_select=sel,
                       scalefac_compress=0, bitrate_kbps=320)
    fr = M.decode_mp3(enc)
    got = np.concatenate([
        g["samples"] for f in fr for c in f["granules"] for g in c
    ])[:576]
    assert np.array_equal(got, lines)
    # and the granule really used the forced table over ALL regions
    sides = [g["side"] for f in fr for c in f["granules"] for g in c]
    assert sides[0]["table_select"][0] == sel
    assert sides[0]["big_values"] == len(pairs)


@pytest.mark.parametrize("sel,entry,length", [
    (12, (6, 4), 8), (13, (5, 14), 14),
])
def test_repaired_entry_bit_exact_decode(sel, entry, length):
    # the repaired entry's codeword decodes at EXACTLY its deduced
    # length from a raw bit stream (no lookup aliasing at either the
    # rejected length or the repaired one)
    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        _PAIR_LOOKUP,
        _read_code,
    )
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _BR,
        _BW,
    )

    x, y = entry
    tab = M.HUFF_PAIR[sel]
    code = tab["codes"][x][y]
    assert tab["lens"][x][y] == length
    bw = _BW()
    bw.w(code, length)
    bw.w(0b1010, 4)  # trailing noise the decode must not consume
    bw.pad_to_byte()
    br = _BR(bytes(bw.buf), 0)
    assert _read_code(br, _PAIR_LOOKUP[sel], "pair") == (x, y)
    assert br.pos == length


def test_partial_count1_quad_tail_realigns():
    """r14 hypothesis find: big_end % 4 == 2 leaves lines 574-575
    outside the count1 quad grid; a nonzero there must be absorbed
    into big_values (grid realigned), not raised or silently zeroed."""
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        decode_mp3,
        encode_mp3,
    )

    sp = np.zeros((1, 576), np.int64)
    sp[0, 472] = 2   # big_end -> 474 (== 2 mod 4)
    sp[0, 574] = 1   # in the would-be unreachable tail
    enc = encode_mp3(sp, bitrate_kbps=320)
    got = decode_mp3(enc)[0]["granules"][0][0]["samples"]
    assert np.array_equal(got, sp[0])
    # the sibling shape with the tail zero still encodes (no bump)
    sp2 = np.zeros((1, 576), np.int64)
    sp2[0, 472] = 2
    enc2 = encode_mp3(sp2, bitrate_kbps=320)
    got2 = decode_mp3(enc2)[0]["granules"][0][0]["samples"]
    assert np.array_equal(got2, sp2[0])
