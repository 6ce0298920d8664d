"""MPEG-1 audio (ISO/IEC 11172-3) Layer I/II codec — pure numpy.

Closes the largest honest multimodal stub (VERDICT r10 "What's
missing #1"): real crawl audio is MPEG, and the near-dup machinery
previously reached only WAV/AVI/GIF corpora.

What is EXACT here (spec-faithful, from the public standard):

- frame syntax: 32-bit header (sync/version/layer/bitrate index/
  sampling index/padding/mode), optional CRC-16, per-subband bit
  allocation, Layer II scfsi, 6-bit scalefactors, sample packing
  incl. Layer II grouped codes (3/5/9-level triplets in 5/7/10 bits,
  first sample least significant);
- quantization tables, DERIVED rather than transcribed: the Table B.1
  scalefactors are ``2 * 2**(-idx/3)`` and the Table B.4 (c, d)
  requantization constants follow the closed form ``c = 2**nb /
  levels``, ``d = 1 - (levels - 1) * 2**-nb`` (this reproduces every
  published row: 3 -> 1.3333/0.5, 5 -> 1.6/0.5, 7 -> 1.142857/0.25,
  9 -> 1.7777/0.5, 15 -> 1.0666/0.125 ...), with Layer I the
  ``levels = 2**nb - 1`` special case giving the familiar
  ``s'' = (2**nb/(2**nb-1)) * (s''' + 2**(1-nb))``;
- Layer II bit-allocation table B.2a (sblimit 27; nbal 4/4/3/2 over
  subband groups 0-2 / 3-10 / 11-22 / 23-26).

What is NOT conformance-checkable in this container: the 512-tap
analysis/synthesis window (Tables 3-C.1 / annex D) is a tabulated
prototype with NO public closed form, and no MPEG decoder ships in
this image to extract it from (the libjpeg-rodata trick used for the
QM-coder tables has no analogue here).  PCM synthesis therefore uses
a self-consistent Kaiser-sinc near-PR prototype (``_prototype``),
clearly non-ISO: our encode->decode round-trips with measured SNR
(see tests), and a conformant decoder playing our files (or this
decoder playing real files) reconstructs with a small window-mismatch
error — while everything BITSTREAM-side (headers, allocations,
scalefactors, codes — the compressed-domain fingerprint path, which
is what near-dup at 100 TB actually scans) is exact either way.

Layer III (Huffman-coded MDCT) stays a named error: its 32 Huffman
tables are pure tabulated data with no derivation.

No code consulted; structure follows the public standard's clause
layout (2.4.1.3 header, 2.4.2.1-2 audio_data, 2.4.3.2-3 decoding).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (derived / public constants)
# ---------------------------------------------------------------------------

BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224,
               256, 288, 320, 352, 384, 416, 448)
BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320, 384)
BITRATES_L3 = (0, 32, 40, 48, 56, 64, 80, 96,
               112, 128, 160, 192, 224, 256, 320)
SAMPLE_RATES = (44100, 48000, 32000)

# Table B.1: 63 scalefactors, 2 * 2^(-idx/3)
SCALEFACTORS = tuple(2.0 * 2.0 ** (-idx / 3.0) for idx in range(63))

# Layer II table B.2a: per-subband allowed quantizer LEVEL sequences,
# indexed by the transmitted allocation code.  sblimit = 27.
_B2A_LEVELS_0_2 = (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
                   4095, 8191, 16383, 32767, 65535)
_B2A_LEVELS_3_10 = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
                    2047, 4095, 8191, 65535)
_B2A_LEVELS_11_22 = (0, 3, 5, 7, 9, 15, 31, 65535)
_B2A_LEVELS_23_26 = (0, 3, 5, 65535)
SBLIMIT_L2 = 27


def _l2_row(sb: int) -> tuple[int, tuple[int, ...]]:
    """(nbal, level sequence) for subband sb under table B.2a."""
    if sb < 3:
        return 4, _B2A_LEVELS_0_2
    if sb < 11:
        return 4, _B2A_LEVELS_3_10
    if sb < 23:
        return 3, _B2A_LEVELS_11_22
    if sb < SBLIMIT_L2:
        return 2, _B2A_LEVELS_23_26
    raise ValueError(f"subband {sb} past sblimit {SBLIMIT_L2}")


def _nb_for_levels(levels: int) -> int:
    """Code width for a level count (grouped triplets excluded)."""
    nb = 1
    while (1 << nb) < levels + 1:
        nb += 1
    return nb


def quant_cd(levels: int) -> tuple[float, float]:
    """Table B.4 (c, d) requantization constants from the closed form
    (see module docstring): s'' = c * (s''' + d), s''' = code *
    2^(1-nb) - 1."""
    nb = _nb_for_levels(levels)
    c = float(1 << nb) / levels
    d = 1.0 - (levels - 1) * 2.0 ** (-nb)
    return c, d


_GROUPED = {3: 5, 5: 7, 9: 10}  # levels -> triplet code bits


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BW:
    __slots__ = ("buf", "_acc", "_n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def w(self, v: int, width: int) -> None:
        self._acc = (self._acc << width) | (v & ((1 << width) - 1))
        self._n += width
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.w(0, 8 - self._n)


class _BR:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def r(self, width: int) -> int:
        v = 0
        for _ in range(width):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


# ---------------------------------------------------------------------------
# Header
# ---------------------------------------------------------------------------


def _header(layer: int, bitrate_kbps: int, sample_rate: int,
            padding: int, mode: int, crc: bool,
            version: str = "1") -> bytes:
    if version == "1":
        table = {1: BITRATES_L1, 2: BITRATES_L2, 3: BITRATES_L3}[layer]
        rates = SAMPLE_RATES
    else:  # MPEG-2 (LSF) / de facto 2.5 extension
        table = BITRATES_L1_V2 if layer == 1 else BITRATES_L23_V2
        rates = SAMPLE_RATES_BY_VERSION[version]
    try:
        br_idx = table.index(bitrate_kbps)
    except ValueError:
        raise ValueError(
            f"mpeg: bitrate {bitrate_kbps} not in layer {layer} "
            f"version {version} table"
        ) from None
    sr_idx = rates.index(sample_rate)
    layer_code = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    h = (0x7FF << 21) | (vbits << 19) | (layer_code << 17)
    h |= (0 if crc else 1) << 16  # protection_bit: 0 = CRC present
    h |= br_idx << 12 | sr_idx << 10 | padding << 9
    h |= mode << 6  # 11 = single_channel
    return struct.pack(">I", h)


# MPEG-2 (LSF) / MPEG-2.5 header tables — public ISO 13818-3 (+ the
# de facto 2.5 extension): Layer I keeps its own bitrate ladder,
# Layers II and III share one (the v1 tables above stay untouched).
BITRATES_L1_V2 = (0, 32, 48, 56, 64, 80, 96, 112,
                  128, 144, 160, 176, 192, 224, 256)
BITRATES_L23_V2 = (0, 8, 16, 24, 32, 40, 48, 56,
                   64, 80, 96, 112, 128, 144, 160)
SAMPLE_RATES_BY_VERSION = {
    "1": SAMPLE_RATES,
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def parse_header(data: bytes, off: int = 0) -> dict:
    """Parse one 32-bit MPEG audio frame header at byte ``off``.

    All three header versions parse (MPEG-1 = bits 11, MPEG-2 LSF =
    10, MPEG-2.5 = 00 — low-bitrate voice/podcast crawl MP3s are
    routinely 2/2.5), with version-correct bitrate/sample-rate tables
    and frame sizes (LSF Layer III frames carry ONE granule: 576
    samples, 72*bitrate/rate bytes).  Layer III SAMPLE decode covers
    LSF as of r14 (mp3_layer3.decode_mp3); Layer I/II LSF subband
    decode stays a named error.  The header walk — stream_info,
    tag/Xing detection, duration — works for every version."""
    if len(data) < off + 4:
        raise ValueError("mpeg: truncated header")
    (h,) = struct.unpack_from(">I", data, off)
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mpeg: bad sync")
    vbits = (h >> 19) & 3
    if vbits == 0b01:
        raise ValueError("mpeg: reserved version bits")
    version = {0b11: "1", 0b10: "2", 0b00: "2.5"}[vbits]
    layer = {0b11: 1, 0b10: 2, 0b01: 3}.get((h >> 17) & 3)
    if layer is None:
        raise ValueError("mpeg: reserved layer bits")
    crc = ((h >> 16) & 1) == 0
    if version == "1":
        table = {1: BITRATES_L1, 2: BITRATES_L2, 3: BITRATES_L3}[layer]
    else:
        table = BITRATES_L1_V2 if layer == 1 else BITRATES_L23_V2
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mpeg: free-format/reserved bitrate or rate")
    mode = (h >> 6) & 3
    bitrate = table[br_idx] * 1000
    sample_rate = SAMPLE_RATES_BY_VERSION[version][sr_idx]
    padding = (h >> 9) & 1
    if layer == 1:
        frame_bytes = (12 * bitrate // sample_rate + padding) * 4
        spf = 384
    elif layer == 2 or version == "1":
        frame_bytes = 144 * bitrate // sample_rate + padding
        spf = 1152
    else:  # LSF Layer III: one granule per frame
        frame_bytes = 72 * bitrate // sample_rate + padding
        spf = 576
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "padding": padding,
        "mode": mode,
        "mode_extension": (h >> 4) & 3,
        "channels": 1 if mode == 0b11 else 2,
        "crc": crc,
        "frame_bytes": frame_bytes,
        "samples_per_frame": spf,
    }


# ---------------------------------------------------------------------------
# Layer I/II frame encode from subband CODES (the exact, oracle-
# replicable path: integer codes in, real bitstream out)
# ---------------------------------------------------------------------------


def encode_frame_l2_codes(
    codes: np.ndarray,
    alloc: np.ndarray,
    scf_idx: np.ndarray,
    sample_rate: int = 44100,
    bitrate_kbps: int = 192,
) -> bytes:
    """One MONO Layer II frame from integer subband codes.

    ``codes``: int array (SBLIMIT_L2, 36) — quantized codes, each in
    [0, levels) for that subband's allocation; subbands with alloc 0
    ignored.  ``alloc``: (27,) allocation INDEX per subband (into the
    B.2a row).  ``scf_idx``: (27, 3) scalefactor index per subband per
    12-sample part (scfsi pattern 0: all three transmitted).
    """
    w = _BW()
    w.buf += _header(2, bitrate_kbps, sample_rate, 0, 0b11, crc=False)
    for sb in range(SBLIMIT_L2):
        nbal, _ = _l2_row(sb)
        w.w(int(alloc[sb]), nbal)
    for sb in range(SBLIMIT_L2):
        if alloc[sb]:
            w.w(0, 2)  # scfsi 0: three scalefactors follow
    for sb in range(SBLIMIT_L2):
        if alloc[sb]:
            for p in range(3):
                w.w(int(scf_idx[sb, p]), 6)
    # samples: 12 granules x 3 samples, subband-major inside granule
    for gr in range(12):
        for sb in range(SBLIMIT_L2):
            a = int(alloc[sb])
            if not a:
                continue
            _, seq = _l2_row(sb)
            levels = seq[a]
            tri = [int(codes[sb, 3 * gr + i]) for i in range(3)]
            if any(t < 0 or t >= levels for t in tri):
                raise ValueError(
                    f"mpeg: code out of range for {levels} levels"
                )
            if levels in _GROUPED:
                g = tri[0] + levels * tri[1] + levels * levels * tri[2]
                w.w(g, _GROUPED[levels])
            else:
                nb = _nb_for_levels(levels)
                for t in tri:
                    w.w(t, nb)
    w.pad_to_byte()
    frame_bytes = 144 * bitrate_kbps * 1000 // sample_rate
    if len(w.buf) > frame_bytes:
        raise ValueError(
            f"mpeg: frame overflow {len(w.buf)} > {frame_bytes} — "
            "allocation too rich for the bitrate"
        )
    return bytes(w.buf) + b"\x00" * (frame_bytes - len(w.buf))


def encode_frame_l1_codes(
    codes: np.ndarray,
    alloc: np.ndarray,
    scf_idx: np.ndarray,
    sample_rate: int = 44100,
    bitrate_kbps: int = 192,
) -> bytes:
    """One MONO Layer I frame from integer subband codes.

    ``codes``: (32, 12) with values in [0, 2^nb - 1) where nb =
    alloc + 1; ``alloc``: (32,) in 0..14 (0 = silent subband);
    ``scf_idx``: (32,) scalefactor index."""
    w = _BW()
    w.buf += _header(1, bitrate_kbps, sample_rate, 0, 0b11, crc=False)
    for sb in range(32):
        a = int(alloc[sb])
        if a == 15:
            raise ValueError("mpeg: layer I allocation 15 is forbidden")
        w.w(a, 4)
    for sb in range(32):
        if alloc[sb]:
            w.w(int(scf_idx[sb]), 6)
    for s in range(12):
        for sb in range(32):
            a = int(alloc[sb])
            if not a:
                continue
            nb = a + 1
            c = int(codes[sb, s])
            if c < 0 or c >= (1 << nb) - 1:
                raise ValueError(
                    f"mpeg: layer I code {c} out of [0, 2^{nb}-1)"
                )
            # spec maps codes so the all-ones pattern is excluded:
            # transmitted word is code with MSB inverted
            w.w(c ^ (1 << (nb - 1)), nb)
    w.pad_to_byte()
    frame_bytes = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    if len(w.buf) > frame_bytes:
        raise ValueError("mpeg: layer I frame overflow")
    return bytes(w.buf) + b"\x00" * (frame_bytes - len(w.buf))


# ---------------------------------------------------------------------------
# Decode (bitstream layer — exact)
# ---------------------------------------------------------------------------


def decode_frame_subbands(data: bytes, off: int = 0):
    """Decode ONE frame at byte ``off`` into dequantized subband
    samples (channels, 32, 12 or 36 columns), plus the header dict and
    the raw integer codes — the compressed-domain surface.

    Returns (subbands float64, header, codes int64, scf_idx int64,
    alloc int64).  Mono and standard stereo only; intensity/joint
    stereo raises a named error."""
    hdr = parse_header(data, off)
    ch = hdr["channels"]
    if hdr["version"] != "1":
        raise NotImplementedError(
            "mpeg: MPEG-2/2.5 (LSF) Layer I/II sample decode not "
            "supported (different allocation tables); the header "
            "walk (parse_header, stream_info) handles every version"
        )
    if hdr["layer"] == 3:
        raise NotImplementedError(
            "mpeg: Layer III sample decode lives in "
            "operators/mp3_layer3.decode_mp3 (r12/r13: pair tables "
            "1-15 shipped with structural proofs; ESC tables 16-31 "
            "remain named errors there)"
        )
    if hdr["mode"] == 0b01:
        raise NotImplementedError(
            "mpeg: joint (intensity) stereo not implemented"
        )
    r = _BR(data, (off + 4 + (2 if hdr["crc"] else 0)) * 8)
    if hdr["layer"] == 1:
        alloc = np.zeros((ch, 32), np.int64)
        for sb in range(32):
            for c in range(ch):
                alloc[c, sb] = r.r(4)
        scf = np.zeros((ch, 32), np.int64)
        for sb in range(32):
            for c in range(ch):
                if alloc[c, sb]:
                    scf[c, sb] = r.r(6)
        codes = np.zeros((ch, 32, 12), np.int64)
        out = np.zeros((ch, 32, 12), np.float64)
        for s in range(12):
            for sb in range(32):
                for c in range(ch):
                    a = int(alloc[c, sb])
                    if not a:
                        continue
                    nb = a + 1
                    raw = r.r(nb)
                    code = raw ^ (1 << (nb - 1))
                    codes[c, sb, s] = code
                    levels = (1 << nb) - 1
                    cc, dd = quant_cd(levels)
                    sppp = code * 2.0 ** (1 - nb) - 1.0
                    out[c, sb, s] = (
                        cc * (sppp + dd) * SCALEFACTORS[scf[c, sb]]
                    )
        return out, hdr, codes, scf[..., None].repeat(1, axis=-1), alloc
    # Layer II
    alloc = np.zeros((ch, SBLIMIT_L2), np.int64)
    for sb in range(SBLIMIT_L2):
        nbal, _ = _l2_row(sb)
        for c in range(ch):
            alloc[c, sb] = r.r(nbal)
    scfsi = np.zeros((ch, SBLIMIT_L2), np.int64)
    for sb in range(SBLIMIT_L2):
        for c in range(ch):
            if alloc[c, sb]:
                scfsi[c, sb] = r.r(2)
    scf = np.zeros((ch, SBLIMIT_L2, 3), np.int64)
    for sb in range(SBLIMIT_L2):
        for c in range(ch):
            if not alloc[c, sb]:
                continue
            si = int(scfsi[c, sb])
            if si == 0:
                a, b, cc_ = r.r(6), r.r(6), r.r(6)
            elif si == 1:
                a = b = r.r(6)
                cc_ = r.r(6)
            elif si == 2:
                a = b = cc_ = r.r(6)
            else:
                a = r.r(6)
                b = cc_ = r.r(6)
            scf[c, sb] = (a, b, cc_)
    codes = np.zeros((ch, SBLIMIT_L2, 36), np.int64)
    out = np.zeros((ch, 32, 36), np.float64)
    for gr in range(12):
        for sb in range(SBLIMIT_L2):
            _, seq = _l2_row(sb)
            for c in range(ch):
                a = int(alloc[c, sb])
                if not a:
                    continue
                levels = seq[a]
                if levels in _GROUPED:
                    g = r.r(_GROUPED[levels])
                    tri = (g % levels, (g // levels) % levels,
                           g // (levels * levels))
                else:
                    nb = _nb_for_levels(levels)
                    tri = tuple(r.r(nb) for _ in range(3))
                cc, dd = quant_cd(levels)
                nb = _nb_for_levels(levels)
                sf = SCALEFACTORS[scf[c, sb, gr // 4]]
                for i, code in enumerate(tri):
                    codes[c, sb, 3 * gr + i] = code
                    sppp = code * 2.0 ** (1 - nb) - 1.0
                    out[c, sb, 3 * gr + i] = cc * (sppp + dd) * sf
    return out, hdr, codes, scf, alloc


def iter_frames(data: bytes):
    """Yield (offset, header) for every frame in a stream."""
    off = 0
    while off + 4 <= len(data):
        hdr = parse_header(data, off)
        yield off, hdr
        off += hdr["frame_bytes"]


# ---------------------------------------------------------------------------
# Synthesis / analysis filterbank (near-PR, NON-ISO window — see
# module docstring)
# ---------------------------------------------------------------------------


def _prototype() -> np.ndarray:
    """512-tap pseudo-QMF prototype, DESIGNED (non-ISO — see module
    docstring): magnitude 1 below (1-beta)pi/64, 0 above (1+beta)pi/64
    (beta=1, so the stopband starts exactly at pi/32 where non-adjacent
    aliasing would begin), with a power-complementary C2-smooth
    transition H = cos(pi/2 * smootherstep) — H^2(w) + H^2(pi/32 - w)
    = 1 through the whole crossover, which is what keeps the composite
    response flat.  Measured: worst alias transfer 3.5e-6 (-109 dB),
    |T0| ripple +-2 %, round-trip SNR 76-83 dB on steady tones and
    ~40 dB on full-band white noise (the worst case)."""
    n512, m, grid = 512, 32, 1 << 14
    w = np.linspace(0.0, np.pi, grid, endpoint=False)
    edge = np.pi / (2 * m)
    lo, hi = 0.0, 2.0 * edge
    mag = np.zeros(grid)
    mag[w <= lo] = 1.0
    tr = (w > lo) & (w < hi)
    u = (w[tr] - lo) / (hi - lo)
    mag[tr] = np.cos(np.pi / 2 * (6 * u**5 - 15 * u**4 + 10 * u**3))
    n = np.arange(n512) - (n512 - 1) / 2
    return (mag[None, :] * np.cos(np.outer(n, w))).sum(axis=1) / grid


_PROTO = None


def _proto() -> np.ndarray:
    global _PROTO
    if _PROTO is None:
        _PROTO = _prototype()
    return _PROTO


def _banks() -> tuple[np.ndarray, np.ndarray]:
    """(analysis, synthesis) filter matrices (32, 512) — the classic
    near-PR pseudo-QMF modulation with the alias-cancelling
    +/-(-1)^k pi/4 phase:
      h_k(n) = 2 h(n) cos((2k+1) pi/(2M) (n - (L-1)/2) + (-1)^k pi/4)
      f_k(n) = 2 h(n) cos((2k+1) pi/(2M) (n - (L-1)/2) - (-1)^k pi/4)
    """
    h = _proto()
    n = np.arange(512, dtype=np.float64)
    k = np.arange(32, dtype=np.float64)[:, None]
    arg = (2 * k + 1) * np.pi / 64.0 * (n[None, :] - 255.5)
    phi = np.where(np.arange(32)[:, None] % 2 == 0, np.pi / 4, -np.pi / 4)
    return 2 * h * np.cos(arg + phi), 2 * h * np.cos(arg - phi)


_BANKS = None


def _bank() -> tuple[np.ndarray, np.ndarray]:
    global _BANKS
    if _BANKS is None:
        _BANKS = _banks()
    return _BANKS


_FB_DELAY = 511  # filterbank group delay in samples (L - 1)


def analyze(pcm: np.ndarray) -> np.ndarray:
    """PCM (float in [-1,1], length multiple of 32) -> subband samples
    (32, len/32): y_k(t) = sum_n h_k(n) x(32t - n)."""
    ha, _ = _bank()
    x = np.asarray(pcm, np.float64)
    if x.size % 32:
        raise ValueError("mpeg: pcm length must be a multiple of 32")
    nt = x.size // 32
    xp = np.concatenate([np.zeros(511), x])
    # window x(32t - n), n = 0..511 -> reversed slice ending at 32t;
    # stride-tricked view keeps this one matmul
    segs = np.lib.stride_tricks.sliding_window_view(xp, 512)[::32][:nt]
    return ha @ segs[:, ::-1].T


def synthesize(subbands: np.ndarray) -> np.ndarray:
    """Subband samples (32, nt) -> PCM float (nt*32,):
    x^(m) = (2/M) sum_k sum_t f_k(m - 32t) y_k(t), trimmed by the
    L-1 group delay so output aligns with the analysis input."""
    _, fb = _bank()
    sb = np.asarray(subbands, np.float64)
    nt = sb.shape[1]
    contrib = sb.T @ fb  # (nt, 512)
    acc = np.zeros(nt * 32 + 512, np.float64)
    for t in range(nt):
        acc[32 * t:32 * t + 512] += contrib[t]
    # x32 compensates the decimation's 1/M composite gain; the
    # residual ~0.4 % bias sits inside the documented +-2 % ripple
    return 32.0 * acc[_FB_DELAY:_FB_DELAY + nt * 32]


# ---------------------------------------------------------------------------
# High-level PCM encode (mono) — quantize with the spec's inverse
# ---------------------------------------------------------------------------


def _quantize(x: np.ndarray, sf: float, levels: int) -> np.ndarray:
    """Inverse of the spec dequant: code = round((x/(sf*c) - d + 1)
    * 2^(nb-1)) clipped to [0, levels)."""
    cc, dd = quant_cd(levels)
    nb = _nb_for_levels(levels)
    code = np.round((x / (sf * cc) - dd + 1.0) * (1 << (nb - 1)))
    return np.clip(code, 0, levels - 1).astype(np.int64)


def encode_mp2(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    bitrate_kbps: int = 192,
) -> bytes:
    """Mono PCM (int16 or float) -> Layer II stream.  Deterministic
    fixed allocation profile (rich low subbands, tapering) — a valid
    CBR stream without a psychoacoustic model; frames of 1152."""
    x = np.asarray(pcm)
    if x.dtype.kind in "iu":
        x = x.astype(np.float64) / 32768.0
    if x.size % 1152:
        x = np.pad(x, (0, 1152 - x.size % 1152))
    # fixed allocation: alloc index per B.2a row (deterministic)
    alloc = np.zeros(SBLIMIT_L2, np.int64)
    alloc[:3] = 8    # 511 levels (9 bits)
    alloc[3:11] = 6  # 31 levels (5 bits)
    alloc[11:23] = 4  # 9 levels (grouped, 10 bits/triplet)
    alloc[23:27] = 1  # 3 levels (grouped, 5 bits/triplet)
    # 32 + 88 + 54 + 486 + 12*(81+120+120+20) = 4752 bits < the
    # 5008-bit 192 kbps/44.1 kHz frame
    frames = []
    sb_all = analyze(x)  # (32, n/32)
    for f0 in range(0, x.size // 32, 36):
        sb = sb_all[:, f0:f0 + 36]
        codes = np.zeros((SBLIMIT_L2, 36), np.int64)
        scf_idx = np.zeros((SBLIMIT_L2, 3), np.int64)
        for s in range(SBLIMIT_L2):
            _, seq = _l2_row(s)
            levels = seq[alloc[s]]
            for p in range(3):
                part = sb[s, p * 12:(p + 1) * 12]
                peak = float(np.abs(part).max())
                idx = 62
                for j, v in enumerate(SCALEFACTORS):
                    if peak <= v:
                        idx = j
                if peak > SCALEFACTORS[0]:
                    idx = 0
                # smallest scalefactor >= peak = LAST j with sf >= peak
                scf_idx[s, p] = idx
                codes[s, p * 12:(p + 1) * 12] = _quantize(
                    part, SCALEFACTORS[idx], levels
                )
        frames.append(
            encode_frame_l2_codes(
                codes, alloc, scf_idx, sample_rate, bitrate_kbps
            )
        )
    return b"".join(frames)


def decode_mpeg_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Full decode: every frame's bitstream layer (exact) + synthesis
    (near-PR, non-ISO window).  Returns (int16 samples (n, ch),
    sample_rate)."""
    chunks = []
    rate = None
    ch = None
    for off, hdr in iter_frames(data):
        sb, hdr, _codes, _scf, _alloc = decode_frame_subbands(data, off)
        rate, ch = hdr["sample_rate"], hdr["channels"]
        chunks.append(sb)
    if not chunks:
        raise ValueError("mpeg: no frames")
    per_ch = []
    for c in range(ch):
        sb = np.concatenate([k[c] for k in chunks], axis=1)
        per_ch.append(synthesize(sb))
    pcm = np.stack(per_ch, axis=1)
    return (
        np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16),
        rate,
    )


def id3_bounds(data: bytes) -> tuple[int, int, int, int]:
    """(first audio byte, end of audio bytes, id3v2_bytes, has_id3v1)
    for a possibly-tagged MPEG audio object: a leading ID3v2 block
    (10-byte header, syncsafe 28-bit size that EXCLUDES the header,
    optional 10-byte ID3v2.4 footer signaled by bit 4 of the flags
    byte) is skipped, and a trailing 128-byte ID3v1 'TAG' block is
    trimmed.  Shared by :func:`stream_info` and the Layer III decoder
    so the compressed-domain fingerprint path accepts real tagged
    crawl MP3s."""
    off = 0
    id3v2_bytes = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = (
            ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        )
        id3v2_bytes = 10 + sz + (10 if data[5] & 0x10 else 0)
        off = id3v2_bytes
    end = len(data)
    has_id3v1 = end >= off + 128 and data[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    return off, end, id3v2_bytes, int(has_id3v1)


def stream_info(data: bytes) -> dict:
    """Compressed-domain MPEG audio stream metadata from the frame
    walk alone — no entropy decode, so it works for Layer III (real
    crawl MP3s) exactly as for I/II: frame count, per-layer/bitrate
    histogram, VBR flag, exact sample count and duration.

    duration_ms is integer-exact: samples * 1000 // rate (both engines
    compute it identically).  A truncated final frame is tolerated
    (crawl files often are) and reported via ``truncated``.

    Real crawl MP3s carry metadata tags around the audio: a leading
    ID3v2 block (10-byte header, syncsafe 28-bit size, optional
    footer) is skipped, and a trailing ID3v1 block (128 bytes, 'TAG')
    ends the walk cleanly instead of reading as a truncated frame.
    Both are reported (``id3v2_bytes`` / ``has_id3v1``).

    A LAME/FhG-style VBR info frame ("Xing"/"Info" magic right after
    the first Layer III frame's side info) is detected and parsed
    (``xing_*`` keys): VBR encoders front-load the true frame/byte
    totals there because the header walk alone cannot know them until
    EOF — at crawl scale the info frame gives duration from the FIRST
    kilobyte of a range request.  The info frame carries no audio, so
    it is excluded from ``n_frames``/``total_samples``."""
    n_frames = 0
    total_samples = 0
    bitrates: dict[int, int] = {}
    layer = None
    rate = None
    mode = None
    truncated = False
    off, end, id3v2_bytes, has_id3v1 = id3_bounds(data)
    xing: dict | None = None
    first = True
    while off + 4 <= end:
        try:
            hdr = parse_header(data, off)
        except ValueError:
            break
        if off + hdr["frame_bytes"] > end:
            truncated = True
            break
        if first:
            first = False
            x = _parse_xing(data, off, hdr)
            if x is not None:
                xing = x
                xing_hdr = hdr
                off += hdr["frame_bytes"]  # info frame carries no audio
                continue
        layer = hdr["layer"] if layer is None else layer
        rate = hdr["sample_rate"] if rate is None else rate
        mode = hdr["mode"] if mode is None else mode
        bitrates[hdr["bitrate"]] = bitrates.get(hdr["bitrate"], 0) + 1
        total_samples += hdr["samples_per_frame"]
        n_frames += 1
        off += hdr["frame_bytes"]
    if n_frames == 0:
        if xing is None:
            raise ValueError("mpeg: no decodable frame headers")
        # a range-request prefix: the Xing/Info frame parsed but no
        # complete audio frame followed — surface the encoder-declared
        # totals instead of discarding them (duration estimated from
        # xing_frames at the info frame's rate; walked counts stay 0)
        h = xing_hdr
        est = (
            xing["frames"] * h["samples_per_frame"]
            if xing["frames"] is not None else 0
        )
        return {
            "layer": h["layer"],
            "sample_rate": h["sample_rate"],
            "channels": 1 if h["mode"] == 0b11 else 2,
            "n_frames": 0,
            "total_samples": 0,
            "duration_ms": est * 1000 // h["sample_rate"],
            "is_vbr": xing["tag"] == "Xing",
            "n_bitrates": 0,
            "min_bitrate": h["bitrate"],
            "max_bitrate": h["bitrate"],
            "stream_bytes": off - id3v2_bytes,
            "id3v2_bytes": id3v2_bytes,
            "has_id3v1": has_id3v1,
            "truncated": truncated,
            "xing_tag": xing["tag"],
            "xing_frames": xing["frames"],
            "xing_bytes": xing["bytes"],
            "xing_has_toc": xing["has_toc"],
        }
    info = {
        "layer": layer,
        "sample_rate": rate,
        "channels": 1 if mode == 0b11 else 2,
        "n_frames": n_frames,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // rate,
        "is_vbr": len(bitrates) > 1,
        "n_bitrates": len(bitrates),
        "min_bitrate": min(bitrates),
        "max_bitrate": max(bitrates),
        "stream_bytes": off - id3v2_bytes,
        "id3v2_bytes": id3v2_bytes,
        "has_id3v1": has_id3v1,
        "truncated": truncated,
    }
    if xing is not None:
        info["xing_tag"] = xing["tag"]
        info["xing_frames"] = xing["frames"]
        info["xing_bytes"] = xing["bytes"]
        info["xing_has_toc"] = xing["has_toc"]
        # "Xing" magic marks true VBR; "Info" marks a CBR stream that
        # merely carries the LAME header
        if xing["tag"] == "Xing":
            info["is_vbr"] = True
    return info


def _parse_xing(data: bytes, off: int, hdr: dict) -> dict | None:
    """Parse a Xing/Info VBR header inside the FIRST frame: the magic
    sits right after the side information block (whose size depends
    on version/channels), followed by a 4-byte big-endian flags word
    and the optional frames / bytes / 100-byte TOC / quality fields
    in that order (public LAME header layout)."""
    if hdr["layer"] != 3:
        return None
    pos = off + 4 + (2 if hdr["crc"] else 0)
    if hdr["version"] == "1":
        pos += 17 if hdr["channels"] == 1 else 32
    else:  # LSF side info is 9 (mono) / 17 (stereo) bytes
        pos += 9 if hdr["channels"] == 1 else 17
    if pos + 4 > off + hdr["frame_bytes"]:
        # a frame too small to hold the magic AFTER its side info can
        # never be an info frame — and slicing past frame_end could
        # read a coincidental 'Xing' from the NEXT frame's payload
        # (r13 ADVICE)
        return None
    magic = data[pos : pos + 4]
    if magic not in (b"Xing", b"Info"):
        return None
    p = pos + 4
    frame_end = off + hdr["frame_bytes"]
    if p + 4 > frame_end:
        return None
    flags = int.from_bytes(data[p : p + 4], "big")
    p += 4
    need = 4 * bin(flags & 0x3).count("1") + (100 if flags & 0x4 else 0)
    if p + need > frame_end:
        return None  # flags claim fields the frame cannot hold
    out = {
        "tag": magic.decode("ascii"),
        "frames": None,
        "bytes": None,
        "has_toc": bool(flags & 0x4),
    }
    if flags & 0x1:
        out["frames"] = int.from_bytes(data[p : p + 4], "big")
        p += 4
    if flags & 0x2:
        out["bytes"] = int.from_bytes(data[p : p + 4], "big")
        p += 4
    return out
