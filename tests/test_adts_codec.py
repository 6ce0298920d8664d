"""ADTS/AAC frame walk: header round trip, crawl-robustness taxonomy,
tag-invariant fingerprints."""

import pytest

from cloud_optimized_data_pipelines_spark.operators.adts_codec import (
    PROFILES,
    SR_TABLE,
    decode_aac,
    encode_adts_stream,
    fingerprint,
    stream_info,
)


def _payloads(n=4, seed=0):
    return [
        bytes((i * 3 + k * 17 + seed) % 256 for i in range(24 + k))
        for k in range(n)
    ]


def test_round_trip_all_parameter_corners():
    for prof in PROFILES:
        for sr_i in (0, 4, 11, 12):
            for ch in (1, 2, 6):
                for mpeg2 in (False, True):
                    for protect in (False, True):
                        s = encode_adts_stream(
                            _payloads(3), prof, sr_i, ch, mpeg2, protect
                        )
                        info = stream_info(s)
                        assert info["n_frames"] == 3
                        assert info["profile"] == prof
                        assert info["sample_rate"] == SR_TABLE[sr_i]
                        assert info["channels"] == ch
                        assert info["mpeg_version"] == (2 if mpeg2 else 4)
                        assert info["total_samples"] == 3 * 1024
                        assert info["stream_bytes"] == len(s)


def test_raw_data_blocks_scale_samples():
    s = encode_adts_stream(_payloads(5), "lc", 4, 2, blocks=3)
    info = stream_info(s)
    assert info["total_blocks"] == 15
    assert info["total_samples"] == 15 * 1024
    assert info["duration_ms"] == 15 * 1024 * 1000 // 44100


def test_vbr_detection():
    cbr = encode_adts_stream([b"x" * 30] * 4)
    assert not stream_info(cbr)["is_vbr"]
    vbr = encode_adts_stream([b"x" * 30, b"y" * 31])
    assert stream_info(vbr)["is_vbr"]


def test_garbage_raises_sync_error():
    with pytest.raises(ValueError, match="lost sync"):
        stream_info(b"\x00" * 64)


def test_truncated_final_frame_raises():
    s = encode_adts_stream(_payloads(3))
    with pytest.raises(ValueError, match="truncated final frame"):
        stream_info(s[:-5])
    with pytest.raises(ValueError, match="truncated"):
        stream_info(s[: len(s) - len(_payloads(3)[-1]) - 4])


def test_id3v1_cannot_resurrect_truncation():
    s = encode_adts_stream(_payloads(3))
    cut = s[:-5] + b"TAG" + b"\x00" * 125
    with pytest.raises(ValueError, match="truncated"):
        stream_info(cut)


def test_mid_stream_parameter_change_raises():
    a = encode_adts_stream(_payloads(2), "lc", 4, 2)
    b = encode_adts_stream(_payloads(2), "lc", 4, 1)
    with pytest.raises(ValueError, match="parameters change"):
        stream_info(a + b)


def test_reserved_sr_index_raises():
    s = bytearray(encode_adts_stream(_payloads(1)))
    s[2] = (s[2] & 0xC3) | (13 << 2)  # sr index 13 = reserved
    with pytest.raises(ValueError, match="reserved sr index"):
        stream_info(bytes(s))


def test_tags_are_skipped_and_reported():
    bare = encode_adts_stream(_payloads(4))
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    tagged = id3v2 + bare + b"TAG" + b"\x00" * 125
    i_b, i_t = stream_info(bare), stream_info(tagged)
    assert i_t["id3v2_bytes"] == 30 and i_t["has_id3v1"]
    assert i_t["stream_bytes"] == i_b["stream_bytes"]
    assert i_t["n_frames"] == i_b["n_frames"]


def test_fingerprint_is_payload_identity():
    p = _payloads(4)
    bare = encode_adts_stream(p, "lc", 4, 2)
    # tags, CRC words, header parameters: none perturb the fp
    id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 8]) + b"\x00" * 8
    tagged = id3v2 + bare + b"TAG" + b"\x00" * 125
    crc = encode_adts_stream(p, "lc", 4, 2, protect=True)
    reparam = encode_adts_stream(p, "main", 8, 1)
    f0 = fingerprint(bare)
    assert fingerprint(tagged) == f0
    assert fingerprint(crc) == f0
    assert fingerprint(reparam) == f0
    # any payload change perturbs it
    p2 = [p[0], p[1], p[2], p[3][:-1] + b"\x01"]
    assert fingerprint(encode_adts_stream(p2)) != f0


def test_encoder_guards():
    with pytest.raises(ValueError, match="bad sampling_frequency"):
        encode_adts_stream([b"x"], sr_index=14)
    with pytest.raises(ValueError, match="bad channel"):
        encode_adts_stream([b"x"], channels=0)
    with pytest.raises(ValueError, match="frame too long"):
        encode_adts_stream([b"x" * 8200])
    with pytest.raises(ValueError, match="raw_data_blocks"):
        encode_adts_stream([b"x"], blocks=5)


def test_spectral_decode_is_a_named_error():
    with pytest.raises(NotImplementedError, match="spectral decode"):
        decode_aac(encode_adts_stream(_payloads(1)))
