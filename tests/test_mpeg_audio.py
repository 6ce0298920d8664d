"""MPEG-1 audio (Layer I/II) codec tests — bitstream exactness, the
closed-form quantization tables, filterbank quality bounds, and the
honest named errors (Layer III, joint stereo, MPEG-2)."""

import numpy as np
import pytest

from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
    SBLIMIT_L2,
    SCALEFACTORS,
    _l2_row,
    _nb_for_levels,
    analyze,
    decode_frame_subbands,
    decode_mpeg_audio,
    encode_frame_l1_codes,
    encode_frame_l2_codes,
    encode_mp2,
    iter_frames,
    parse_header,
    quant_cd,
    synthesize,
)


def test_quant_cd_reproduces_published_table_b4():
    """The closed form c = 2^nb/levels, d = 1 - (levels-1)*2^-nb must
    reproduce the published ISO Table B.4 rows digit for digit."""
    published = {
        3: (1.33333333333, 0.50000000000),
        5: (1.60000000000, 0.50000000000),
        7: (1.14285714286, 0.25000000000),
        9: (1.77777777777, 0.50000000000),
        15: (1.06666666666, 0.12500000000),
        31: (1.03225806452, 0.06250000000),
        63: (1.01587301587, 0.03125000000),
        127: (1.00787401575, 0.01562500000),
        255: (1.00392156863, 0.00781250000),
        511: (1.00195694716, 0.00390625000),
        1023: (1.00097751711, 0.00195312500),
        2047: (1.00048851979, 0.00097656250),
        4095: (1.00024420024, 0.00048828125),
        8191: (1.00012208522, 0.00024414063),
        16383: (1.00006103888, 0.00012207031),
        32767: (1.00003051851, 0.00006103516),
        65535: (1.00001525902, 0.00003051758),
    }
    for levels, (c_pub, d_pub) in published.items():
        c, d = quant_cd(levels)
        assert abs(c - c_pub) < 5e-11, levels
        assert abs(d - d_pub) < 5e-11, levels


def test_scalefactor_table_b1():
    assert SCALEFACTORS[0] == 2.0
    # each step is exactly 2^(-1/3)
    for i in range(1, 63):
        assert SCALEFACTORS[i] == pytest.approx(
            SCALEFACTORS[i - 1] * 2 ** (-1 / 3), rel=1e-12
        )


def test_header_roundtrip_and_named_errors():
    fr = encode_frame_l2_codes(
        np.zeros((SBLIMIT_L2, 36), np.int64),
        np.zeros(SBLIMIT_L2, np.int64),
        np.zeros((SBLIMIT_L2, 3), np.int64),
        48000,
        128,
    )
    h = parse_header(fr)
    assert (h["layer"], h["bitrate"], h["sample_rate"]) == (2, 128000, 48000)
    assert h["frame_bytes"] == 144 * 128000 // 48000
    # layer III: the HEADER parses (stream walk works on real MP3s) —
    # only sample decode raises the Huffman-table named error
    l3 = bytes([0xFF, 0xFB, 0x90, 0x00])
    h3 = parse_header(l3)
    assert h3["layer"] == 3 and h3["bitrate"] == 128000
    assert h3["frame_bytes"] == 144 * 128000 // 44100
    with pytest.raises(NotImplementedError, match="mp3_layer3"):
        decode_frame_subbands(l3 + b"\x00" * 512)
    # MPEG-2 (version bits 10) headers PARSE as of r13 (LSF support in
    # the header walk); only the sample decode stays a named error
    v2 = bytes([0xFF, 0xF3, 0x90, 0x00])
    h2 = parse_header(v2)
    assert h2["version"] == "2" and h2["layer"] == 3
    assert h2["samples_per_frame"] == 576
    with pytest.raises(ValueError, match="sync"):
        parse_header(b"\x00\x00\x00\x00")


def test_layer2_bitstream_exact_roundtrip():
    """encode codes -> real frame -> parse: codes, scalefactors and
    allocation all exactly recovered (incl. grouped 3/5/9-level
    triplets, first sample least significant)."""
    rng = np.random.default_rng(11)
    alloc = np.zeros(SBLIMIT_L2, np.int64)
    alloc[:3] = 8
    alloc[3:11] = 6
    alloc[11:23] = 4
    alloc[23:27] = 1
    codes = np.zeros((SBLIMIT_L2, 36), np.int64)
    for sb in range(SBLIMIT_L2):
        _, seq = _l2_row(sb)
        codes[sb] = rng.integers(0, seq[alloc[sb]], 36)
    scf = rng.integers(0, 63, (SBLIMIT_L2, 3))
    fr = encode_frame_l2_codes(codes, alloc, scf, 44100, 192)
    sb_out, hdr, codes2, scf2, alloc2 = decode_frame_subbands(fr)
    assert np.array_equal(codes2[0, :SBLIMIT_L2], codes)
    assert np.array_equal(scf2[0], scf)
    assert np.array_equal(alloc2[0], alloc)
    # dequant identity: c*(s'''+d)*sf == sf*(2*code-levels+1)/levels
    for sb in (0, 5, 15, 25):
        _, seq = _l2_row(sb)
        lv = seq[alloc[sb]]
        for t in (0, 17, 35):
            want = (
                SCALEFACTORS[scf[sb, t // 12]]
                * (2 * codes[sb, t] - lv + 1)
                / lv
            )
            assert sb_out[0, sb, t] == pytest.approx(want, rel=1e-12)


def test_layer1_bitstream_exact_roundtrip():
    rng = np.random.default_rng(5)
    alloc = np.zeros(32, np.int64)
    alloc[:8] = 9
    alloc[8:20] = 5
    alloc[20:] = 2
    codes = np.zeros((32, 12), np.int64)
    for sb in range(32):
        codes[sb] = rng.integers(0, (1 << (alloc[sb] + 1)) - 1, 12)
    scf = rng.integers(0, 63, 32)
    fr = encode_frame_l1_codes(codes, alloc, scf, 44100, 448)
    out, hdr, codes2, scf2, alloc2 = decode_frame_subbands(fr)
    assert hdr["layer"] == 1 and hdr["samples_per_frame"] == 384
    assert np.array_equal(codes2[0], codes)
    assert np.array_equal(alloc2[0], alloc)
    with pytest.raises(ValueError, match="forbidden"):
        encode_frame_l1_codes(
            codes, np.full(32, 15, np.int64), scf, 44100, 448
        )


def test_filterbank_quality_bounds():
    """The designed (non-ISO, documented) pseudo-QMF: steady tones
    round-trip above 45 dB (the composite |T0| ripple / ~0.4 % gain
    bias is the limiter, not aliasing — gain-corrected SNR is 75+ dB),
    full-band noise above 35 dB; the end-to-end PCM codec is
    quantization-limited near 38 dB at 192 kbps regardless."""
    t = np.arange(32 * 300)
    for f in (0.003, 0.031, 0.25):
        x = np.sin(2 * np.pi * f * t)
        y = synthesize(analyze(x))
        s = slice(1024, -1024)
        err = x[s] - y[s]
        snr = 10 * np.log10((x[s] ** 2).sum() / (err**2).sum())
        assert snr > 45.0, (f, snr)
        g = np.dot(x[s], y[s]) / np.dot(y[s], y[s])
        errg = x[s] - g * y[s]
        snrg = 10 * np.log10((x[s] ** 2).sum() / (errg**2).sum())
        assert snrg > 70.0, (f, snrg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(32 * 300)
    y = synthesize(analyze(x))
    s = slice(1024, -1024)
    err = x[s] - y[s]
    assert 10 * np.log10((x[s] ** 2).sum() / (err**2).sum()) > 35.0


def test_mp2_pcm_codec_end_to_end():
    t = np.arange(1152 * 10)
    x = 0.4 * np.sin(2 * np.pi * 0.01 * t) + 0.2 * np.sin(
        2 * np.pi * 0.11 * t + 1.0
    )
    pcm = (x * 20000).astype(np.int16)
    mp2 = encode_mp2(pcm, 44100, 192)
    frames = list(iter_frames(mp2))
    assert len(frames) == 10
    assert all(h["frame_bytes"] == 626 for _, h in frames)
    dec, rate = decode_mpeg_audio(mp2)
    assert rate == 44100 and dec.shape[1] == 1
    s = slice(1024, 1152 * 10 - 1024)
    e = dec[: len(pcm), 0].astype(np.float64) - pcm.astype(np.float64)
    snr = 10 * np.log10(
        (pcm[s].astype(np.float64) ** 2).sum() / (e[s] ** 2).sum()
    )
    assert snr > 30.0, snr


def test_mp2_probe_variants_distinct_and_deterministic():
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        _mp2_variant,
    )

    a, b = _mp2_variant(0), _mp2_variant(1)
    assert a["mp2_md5"] != b["mp2_md5"]
    # the odd-variant edit is exactly 3 subband-0 codes
    assert abs(b["code_sum"] - a["code_sum"]) <= 3 * 511
    assert _mp2_variant(0) == a  # deterministic


def test_grouped_triplet_boundaries():
    """All-extremes codes through the 3/9-level grouped paths."""
    alloc = np.zeros(SBLIMIT_L2, np.int64)
    alloc[11:23] = 4  # 9 levels, grouped
    alloc[23:27] = 1  # 3 levels, grouped
    codes = np.zeros((SBLIMIT_L2, 36), np.int64)
    codes[11:23] = 8
    codes[23:27] = 2
    scf = np.zeros((SBLIMIT_L2, 3), np.int64)
    fr = encode_frame_l2_codes(codes, alloc, scf, 44100, 192)
    _, _, codes2, _, _ = decode_frame_subbands(fr)
    assert np.array_equal(codes2[0, :SBLIMIT_L2], codes)


def test_nb_for_levels():
    for lv, nb in ((3, 2), (5, 3), (7, 3), (9, 4), (15, 4), (31, 5),
                   (63, 6), (511, 9), (65535, 16)):
        assert _nb_for_levels(lv) == nb


def test_stream_info_layer2_layer3_and_vbr():
    """The compressed-domain stream walk: exact frame/sample/duration
    math on our real Layer II streams, VBR detection on mixed-bitrate
    streams, and Layer III support (header walk over synthetic frames
    — decode is the named error, the WALK must work on real MP3s)."""
    import numpy as np
    import struct as _struct

    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        stream_info,
    )

    t = np.arange(1152 * 6)
    pcm = (0.3 * np.sin(2 * np.pi * 0.02 * t) * 32767).astype(np.int16)
    mp2 = encode_mp2(pcm, 44100, 192)
    info = stream_info(mp2)
    assert info["layer"] == 2 and info["n_frames"] == 6
    assert info["total_samples"] == 1152 * 6
    assert info["duration_ms"] == 1152 * 6 * 1000 // 44100
    assert not info["is_vbr"] and not info["truncated"]
    # VBR: frames at two bitrates
    mp2b = encode_mp2(pcm[:1152 * 3], 44100, 256)
    vbr = mp2[: 6 * 626][:626 * 3] + mp2b
    vinfo = stream_info(vbr)
    assert vinfo["is_vbr"] and vinfo["n_bitrates"] == 2
    # Layer III synthetic frame walk (header math only)
    def l3_frame(br_idx):
        h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
        h |= br_idx << 12 | 0 << 10 | 0 << 9 | (0b11 << 6)
        from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
            BITRATES_L3,
        )

        fb = 144 * BITRATES_L3[br_idx] * 1000 // 44100
        return _struct.pack(">I", h) + b"\x00" * (fb - 4)

    mp3 = l3_frame(9) + l3_frame(9) + l3_frame(11)
    i3 = stream_info(mp3)
    assert i3["layer"] == 3 and i3["n_frames"] == 3
    assert i3["is_vbr"] and i3["total_samples"] == 1152 * 3
    # truncated tail tolerated + flagged
    it = stream_info(mp3[:-10])
    assert it["truncated"] and it["n_frames"] == 2


def test_mp4_container_round_trip_and_named_stub():
    from cloud_optimized_data_pipelines_spark.operators.mp4_codec import (
        decode_mp4_video,
        encode_mp4,
        extract_samples,
        parse_mp4,
    )
    import pytest as _pytest

    samples = [
        bytes([(i * 7 + j) % 251 for j in range(20 + 3 * i)])
        for i in range(11)
    ]
    mp4 = encode_mp4(samples, timescale=90_000, sample_delta=3_000,
                     width=320, height=240, samples_per_chunk=4)
    info = parse_mp4(mp4)
    assert info["brand"] == "isom"
    (tr,) = info["tracks"]
    assert (tr["width"], tr["height"]) == (320, 240)
    assert tr["handler"] == "vide" and tr["n_samples"] == 11
    assert tr["timescale"] == 90_000
    assert tr["duration"] == 3_000 * 11
    assert set(tr["sample_deltas"]) == {3_000}
    # sample extraction through stsc/stco/stsz resolution (uneven
    # final chunk: 4+4+3)
    assert extract_samples(mp4, tr) == samples
    with _pytest.raises(NotImplementedError, match="container metadata"):
        decode_mp4_video(mp4)
    # corrupt box length -> loud error
    bad = bytearray(mp4)
    bad[0] = 0xFF
    with _pytest.raises(ValueError, match="overruns"):
        parse_mp4(bytes(bad))


def test_stream_info_id3_tags():
    """Real crawl MP3s wrap audio in metadata tags: a leading ID3v2
    block (syncsafe size, optional footer) is skipped and a trailing
    ID3v1 'TAG' block ends the walk cleanly — same frame stats as the
    bare stream, tags reported."""
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        stream_info,
    )

    t = np.arange(1152 * 3)
    pcm = (0.3 * np.sin(2 * np.pi * 0.02 * t) * 32767).astype(np.int16)
    mp2 = encode_mp2(pcm)
    bare = stream_info(mp2)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    id3v1 = b"TAG" + b"\x00" * 125
    tagged = stream_info(id3v2 + mp2 + id3v1)
    assert tagged["n_frames"] == bare["n_frames"] == 3
    assert tagged["stream_bytes"] == bare["stream_bytes"] == len(mp2)
    assert tagged["id3v2_bytes"] == 110 and tagged["has_id3v1"]
    assert not tagged["truncated"]
    # footer flag adds 10 bytes
    id3v2f = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 50]) + b"\x00" * 60
    tf = stream_info(id3v2f + mp2)
    assert tf["id3v2_bytes"] == 70 and tf["n_frames"] == 3


def test_stream_info_xing_header():
    # a LAME/FhG-style VBR info frame: first Layer III frame carries
    # "Xing" right after the side info; stream_info must parse the
    # frame/byte totals, flag VBR, and exclude the info frame from
    # the audio frame count (it carries no audio)
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        encode_mp3,
    )
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        parse_header,
        stream_info,
    )

    spectra = np.zeros((4, 576), np.int64)
    spectra[:, 0] = 2
    audio = encode_mp3(spectra, scalefac_compress=13)
    base = stream_info(audio)
    assert "xing_tag" not in base and base["n_frames"] == 2

    hdr4 = _header(3, 128, 44100, 0, 0b11, False)
    frame_bytes = parse_header(hdr4, 0)["frame_bytes"]
    body = (
        b"\x00" * 17  # mono side info
        + b"Xing"
        + (0x7).to_bytes(4, "big")   # frames | bytes | TOC
        + (2).to_bytes(4, "big")     # frame total
        + len(audio).to_bytes(4, "big")
        + bytes(100)                 # TOC
    )
    info_frame = (hdr4 + body).ljust(frame_bytes, b"\x00")
    tagged = info_frame + audio
    got = stream_info(tagged)
    assert got["xing_tag"] == "Xing"
    assert got["xing_frames"] == 2
    assert got["xing_bytes"] == len(audio)
    assert got["xing_has_toc"] is True
    assert got["is_vbr"] in (True, 1)
    assert got["n_frames"] == 2  # info frame excluded
    assert got["total_samples"] == base["total_samples"]
    # "Info" magic: same layout, stream stays CBR
    info2 = info_frame.replace(b"Xing", b"Info", 1)
    got2 = stream_info(info2 + audio)
    assert got2["xing_tag"] == "Info"
    assert got2["is_vbr"] in (False, 0)


def test_parse_header_lsf_versions():
    # MPEG-2 (version bits 10) and MPEG-2.5 (00) headers parse with
    # version-correct tables: LSF Layer III = one 576-sample granule,
    # 72*bitrate/rate frame bytes; stream_info walks a whole stream
    import struct

    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        parse_header,
        stream_info,
    )

    def mk(vbits, layer_code, br_idx, sr_idx):
        h = (0x7FF << 21) | (vbits << 19) | (layer_code << 17)
        h |= 1 << 16  # no CRC
        h |= br_idx << 12 | sr_idx << 10
        h |= 0b11 << 6  # mono
        return struct.pack(">I", h)

    # MPEG-2 Layer III, 64 kbps (idx 8 in the shared v2 ladder), 22050
    hdr = parse_header(mk(0b10, 0b01, 8, 0), 0)
    assert hdr["version"] == "2" and hdr["layer"] == 3
    assert hdr["sample_rate"] == 22050 and hdr["bitrate"] == 64000
    assert hdr["samples_per_frame"] == 576
    assert hdr["frame_bytes"] == 72 * 64000 // 22050
    # MPEG-2.5 Layer III, 8 kbps (idx 1), 8000 Hz
    hdr25 = parse_header(mk(0b00, 0b01, 1, 2), 0)
    assert hdr25["version"] == "2.5" and hdr25["sample_rate"] == 8000
    assert hdr25["samples_per_frame"] == 576
    # MPEG-2 Layer II keeps 1152 samples and the 144 formula
    hdr2 = parse_header(mk(0b10, 0b10, 8, 1), 0)
    assert hdr2["samples_per_frame"] == 1152
    assert hdr2["frame_bytes"] == 144 * 64000 // 24000
    # reserved version bits stay a named error
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reserved version"):
        parse_header(mk(0b01, 0b01, 8, 0), 0)

    # stream_info over 3 LSF frames: frame count, duration, version
    frame = mk(0b10, 0b01, 8, 0)
    frame = frame.ljust(parse_header(frame, 0)["frame_bytes"], b"\x00")
    info = stream_info(frame * 3)
    assert info["n_frames"] == 3
    assert info["total_samples"] == 3 * 576
    assert info["sample_rate"] == 22050
    assert info["duration_ms"] == 3 * 576 * 1000 // 22050


def test_lsf_sample_decode_coverage():
    # r14: LSF Layer III DECODES (one granule, 9/17-byte side info);
    # LSF Layer II subband decode stays a named error
    import struct

    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        decode_mp3,
    )
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        decode_frame_subbands,
        parse_header,
    )

    def mk(layer_code):
        h = (0x7FF << 21) | (0b10 << 19) | (layer_code << 17)
        h |= 1 << 16 | 8 << 12 | 0 << 10 | 0b11 << 6
        return struct.pack(">I", h)

    l3 = mk(0b01)
    l3 = l3.ljust(parse_header(l3, 0)["frame_bytes"], b"\x00")
    frames = decode_mp3(l3)  # all-zero side info = silent granule
    assert len(frames) == 1 and len(frames[0]["granules"]) == 1
    assert not frames[0]["granules"][0][0]["samples"].any()
    l2 = mk(0b10)
    l2 = l2.ljust(parse_header(l2, 0)["frame_bytes"], b"\x00")
    with pytest.raises(NotImplementedError, match="LSF"):
        decode_frame_subbands(l2, 0)
