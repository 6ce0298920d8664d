"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D + F + G) — the entropy
coder that was this codec family's last named stub: sequential DCT
with the adaptive binary arithmetic coder (the QM-coder) instead of
Huffman codes, frame marker SOF9 (0xFFC9), plus (r11) PROGRESSIVE
arithmetic DCT (SOF10, 0xFFCA) with Annex G spectral-selection and
successive-approximation scans.

Everything here is implemented from the PUBLIC spec:

- the probability-estimation state machine is T.81 Table D.3 (Qe,
  NMPS, NLPS, SWITCH per index) — the literal below was additionally
  cross-checked bit-for-bit against the table compiled into this
  container's libjpeg-turbo (``jpeg_aritab``), and the tests decode
  this encoder's output with that REAL independent library;
- encode/decode procedures are the Annex D flowcharts (D.1.4/D.1.5
  CODELPS/CODEMPS with conditional MPS/LPS exchange, D.1.6
  renormalization + byte stuffing, D.1.8-9 flush; D.2 decoder with
  lazy renormalization and marker-aware zero feeding);
- the statistical models are Annex F sequential DCT: per-component DC
  conditioning on the previous diff's class (zero / small+- / large+-
  via the default L=0, U=1 bounds), per-zigzag-index AC contexts
  (EOB decision, runs, magnitude-category unary, magnitude bits) with
  the default Kx=5 low/high split, signs through the non-adapting
  equiprobable state (index 113), Table F.4's statistics-area layout
  (DC: 49 states incl. X1=20; AC: 245 states incl. the 189/217
  magnitude areas).

DAC segments are omitted (the defaults above apply, per the spec).
Restart intervals are fully supported (r10): each interval flushes the
coder, emits RSTn, and re-initializes coder state, statistics areas,
DC predictors and conditioning — independently decodable per spec, and
covered by the libjpeg cross-check.

The DCT/quantization/MCU plumbing is shared with
:mod:`operators.jpeg_codec` — the Huffman and arithmetic files carry
IDENTICAL quantized coefficients, which is exactly what the libjpeg
cross-check test pins (both decode to identical pixels through the
independent decoder).
"""

from __future__ import annotations

import struct

import numpy as np

from cloud_optimized_data_pipelines_spark.operators.jpeg_codec import (
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _downsample,
    _pad_to_blocks,  # noqa: F401  (re-exported convenience)
    _rgb_to_ycbcr,
    _seg,
    _SUBSAMPLING,
    _ycbcr_to_rgb,
    _ZC,
    _ZR,
    dequantize_idct,
    fdct_quantize,
)

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per index 0..113.
# Cross-checked against libjpeg-turbo's compiled jpeg_aritab.
QE_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # equiprobable non-adapting state (NMPS == NLPS == 113)


class ArithEncoder:
    """T.81 Annex D encoder.  Context state lives in caller-owned
    bytearrays (the spec's "statistics areas"): each byte is
    ``(MPS << 7) | index``.  Output bytes collect UNSTUFFED in
    ``pending`` — carries propagate backward through it — and the
    0xFF -> 0xFF 0x00 byte stuffing happens once at :meth:`getvalue`
    (equivalent to the spec's stacked-0xFF discipline: a 0xFF that a
    carry turns into 0x00 was never emitted, so it is never stuffed).
    """

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.pending: list[int] = []

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: propagate into already-produced bytes
            i = len(self.pending) - 1
            while i >= 0:
                self.pending[i] = (self.pending[i] + 1) & 0xFF
                if self.pending[i]:
                    break
                i -= 1
            t &= 0xFF
        self.pending.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nmps, nlps, sw = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit != mps:
            # CODELPS (D.1.4) with conditional exchange
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        else:
            # CODEMPS (D.1.5)
            if self.a >= 0x8000:
                return  # no renormalization -> no estimation
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        # RENORME (D.1.6)
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def getvalue(self) -> bytes:
        """FLUSH per D.1.8-9: pick the codestream point in the final
        interval with the most trailing zeros, emit the two remaining
        bytes, drop trailing 0x00s (the decoder feeds zeros past the
        marker), then apply byte stuffing."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            i = len(self.pending) - 1
            while i >= 0:
                self.pending[i] = (self.pending[i] + 1) & 0xFF
                if self.pending[i]:
                    break
                i -= 1
            self.c &= 0x7FFFFFF
        self.pending.append((self.c >> 19) & 0xFF)
        self.pending.append((self.c >> 11) & 0xFF)
        while self.pending and self.pending[-1] == 0:
            self.pending.pop()
        out = bytearray()
        for b in self.pending:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class ArithDecoder:
    """T.81 Annex D decoder (lazy renormalization: refill happens at
    the top of each decision, the D.2.6 structure).  Past the end of
    the entropy segment (a marker, or EOF) zero bytes are fed, per
    D.2.7 — which is why the encoder may drop trailing zeros."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two-byte initial fill
        self.marker_hit = False

    def _byte(self) -> int:
        if self.marker_hit or self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        if self.pos < len(self.data) and self.data[self.pos] == 0x00:
            self.pos += 1  # stuffed zero: deliver the 0xFF
            return 0xFF
        # a marker: rewind onto the 0xFF and feed zeros from now on
        self.pos -= 1
        self.marker_hit = True
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        # renormalization + input (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._byte()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # -> 0x10000 after the shift
            self.a <<= 1
        sv = st[i]
        qe, nmps, nlps, sw = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        bound = self.a << self.ct
        if self.c < bound:
            # MPS region
            if self.a >= 0x8000:
                return mps  # fast path: no renorm, no estimation
            if self.a < qe:
                # conditional exchange: actually the LPS
                d = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                d = mps
                st[i] = (mps << 7) | nmps
            return d
        # LPS region
        self.c -= bound
        if self.a < qe:
            # conditional exchange: actually the MPS
            d = mps
            st[i] = (mps << 7) | nmps
        else:
            d = mps ^ 1
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        self.a = qe
        return d


# ---------------------------------------------------------------------------
# Annex F sequential-DCT statistical models (defaults: L=0, U=1, Kx=5)
# ---------------------------------------------------------------------------

_DC_U_BOUND = (1 << 1) >> 1  # U = 1
_AC_KX = 5


def _encode_dc(enc, dc_st, ctx, diff):
    """Figures F.4/F.6-F.9 with Table F.4 offsets; returns the new
    conditioning category for this component."""
    s0 = ctx
    if diff == 0:
        enc.encode(dc_st, s0, 0)
        return 0
    enc.encode(dc_st, s0, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dc_st, s0 + 1, sign)
    st = s0 + 2 + sign  # SP / SN
    v = (-diff if sign else diff) - 1
    m = 0
    if v:
        enc.encode(dc_st, st, 1)
        m = 1
        st = 20  # X1
        v2 = v
        while v2 >> 1:
            enc.encode(dc_st, st, 1)
            m <<= 1
            st += 1
            v2 >>= 1
    enc.encode(dc_st, st, 0)
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(dc_st, st, 1 if (mm & v) else 0)
    # F.1.4.4.1.2 conditioning (L=0 -> the zero class needs diff==0)
    if m > _DC_U_BOUND:
        return 12 + 4 * sign
    return 4 + 4 * sign


def _decode_dc(dec, dc_st, ctx):
    """Mirror of :func:`_encode_dc`; returns (diff, new_context)."""
    s0 = ctx
    if dec.decode(dc_st, s0) == 0:
        return 0, 0
    sign = dec.decode(dc_st, s0 + 1)
    st = s0 + 2 + sign
    m = dec.decode(dc_st, st)
    if m:
        st = 20
        while dec.decode(dc_st, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg-arith: DC magnitude overflow")
            st += 1
    new_ctx = (12 if m > _DC_U_BOUND else 4) + 4 * sign
    v = m
    st += 14
    while m >> 1:
        m >>= 1
        if dec.decode(dc_st, st):
            v |= m
    v += 1
    return (-v if sign else v), new_ctx


def _encode_ac(enc, ac_st, fixed, zz, ss=1, se=63):
    """Figure F.5 (+F.6-F.9) over zigzag coefficients ss..se (the
    sequential scan is the ss=1, se=63 case; progressive AC first
    scans pass their spectral band with point-transformed values —
    G.1.3.2 reuses the sequential procedure over the band)."""
    ke = se
    while ke >= ss and zz[ke] == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_st, st, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac_st, st + 1, 1)
        val = int(zz[k])
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        v = (-val if sign else val) - 1
        m = 0
        if v:
            enc.encode(ac_st, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                enc.encode(ac_st, st, 1)  # X2 decision at the SAME state
                m = 2
                v2 >>= 1
                st = 189 if k <= _AC_KX else 217
                while v2 >> 1:
                    enc.encode(ac_st, st, 1)
                    m <<= 1
                    st += 1
                    v2 >>= 1
        enc.encode(ac_st, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(ac_st, st, 1 if (mm & v) else 0)
        k += 1
    if ke < se:
        # EOB decision at the state for the NEXT index (k == ke + 1)
        enc.encode(ac_st, 3 * (k - 1), 1)


def _decode_ac(dec, ac_st, fixed, zz, ss=1, se=63):
    """Mirror of :func:`_encode_ac`."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac_st, st):
            break  # EOB
        while dec.decode(ac_st, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError(f"jpeg-arith: AC run past index {se}")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(ac_st, st)
        if m:
            if dec.decode(ac_st, st):
                m = 2
                st = 189 if k <= _AC_KX else 217
                while dec.decode(ac_st, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg-arith: AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        while m >> 1:
            m >>= 1
            if dec.decode(ac_st, st):
                v |= m
        v += 1
        zz[k] = -v if sign else v
        k += 1


# ---------------------------------------------------------------------------
# File-level encode / decode (SOF9 sequential)
# ---------------------------------------------------------------------------


def encode_jpeg_arith(
    arr: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 grayscale (H,W)/(H,W,1) or RGB (H,W,3) as an
    ARITHMETIC-coded sequential JPEG (SOF9) — identical quantized
    coefficients to :func:`jpeg_codec.encode_jpeg` for the same input
    (the libjpeg cross-check test pins exactly that), only the entropy
    layer differs.  Default conditioning (no DAC segment).

    ``restart_interval`` > 0 emits DRI + an RSTn marker every N MCUs:
    per the spec each interval is independently decodable, so the
    arithmetic coder FLUSHES at the boundary and coder state,
    statistics areas, DC predictors and DC conditioning all
    re-initialize after the marker (F.1.4; the libjpeg cross-check
    covers this path too)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"uint8 input required, got {arr.dtype}")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"subsampling {subsampling!r} not one of {sorted(_SUBSAMPLING)}"
        )
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = _rgb_to_ycbcr(arr)
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = planes[0].shape
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError(f"dims out of JPEG range: {h}x{w}")
    ncomp = len(planes)
    hf, vf = _SUBSAMPLING[subsampling] if ncomp == 3 else (1, 1)
    samp = [(hf, vf), (1, 1), (1, 1)][:ncomp]
    quants = [QUANT_LUMA] if ncomp == 1 else [QUANT_LUMA, QUANT_CHROMA]
    tsel = [0] if ncomp == 1 else [0, 1, 1]

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xFFE0,
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0),
    )
    for ti, q in enumerate(quants):
        zzq = bytes(int(q[r, c]) for r, c in ZIGZAG)
        out += _seg(0xFFDB, bytes([ti]) + zzq)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        chf, cvf = samp[ci]
        sof += bytes([ci + 1, (chf << 4) | cvf, tsel[ci]])
    out += _seg(0xFFC9, sof)  # SOF9: arithmetic sequential DCT
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    mcu_rows = -(-h // (8 * vf))
    mcu_cols = -(-w // (8 * hf))
    stored: list[np.ndarray] = []
    for ci in range(ncomp):
        chf, cvf = samp[ci]
        p = planes[ci] if ci == 0 else _downsample(planes[ci], hf, vf)
        th_, tw_ = mcu_rows * cvf * 8, mcu_cols * chf * 8
        p = np.pad(
            p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge"
        )
        stored.append(p)

    ntab = len(quants)

    def fresh_state():
        return (
            ArithEncoder(),
            [bytearray(64) for _ in range(ntab)],
            [bytearray(256) for _ in range(ntab)],
            bytearray([_FIXED]),
            [0] * ncomp,
            [0] * ncomp,
        )

    enc, dc_stats, ac_stats, fixed, pred, dc_ctx = fresh_state()
    mcu = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # independently decodable interval: flush the coder,
                # emit RSTn (D0..D7 cycling), re-init EVERYTHING
                out += enc.getvalue()
                out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                enc, dc_stats, ac_stats, fixed, pred, dc_ctx = (
                    fresh_state()
                )
            mcu += 1
            for ci in range(ncomp):
                t = tsel[ci]
                chf, cvf = samp[ci]
                for sy in range(cvf):
                    for sx in range(chf):
                        by = my * cvf + sy
                        bx = mx * chf + sx
                        block = stored[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        coef = fdct_quantize(block, quants[t])
                        zz = coef[_ZR, _ZC]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        dc_ctx[ci] = _encode_dc(
                            enc, dc_stats[t], dc_ctx[ci], diff
                        )
                        _encode_ac(enc, ac_stats[t], fixed, zz)
    out += enc.getvalue()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith(data: bytes) -> np.ndarray:
    """Decode an arithmetic-coded JPEG: SOF9 sequential (interleaved
    single scan) or SOF10 progressive (dispatched to
    :func:`_decode_arith_progressive`), 8-bit, default conditioning.
    Returns uint8 (H,W) or (H,W,3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    # cheap marker pre-scan for the frame type
    p = 2
    while p + 4 <= len(data):
        if data[p] != 0xFF:
            raise ValueError(f"marker expected at {p}")
        m = data[p + 1]
        if m == 0xCA:
            return _decode_arith_progressive(data)
        if m == 0xC9 or m == 0xDA:
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            p += 2
            continue
        (ln,) = struct.unpack_from(">H", data, p + 2)
        p += 2 + ln
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    frame = None
    dac_seen = False
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                n = 64 * (2 if pq else 1)
                raw = body[bp : bp + n]
                bp += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZR, _ZC] = vals
                qtables[tq] = q
        elif marker == 0xC9:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"arithmetic JPEG precision {prec} unsupported"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xCC:  # DAC: non-default conditioning
            dac_seen = True
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF9")
            if dac_seen:
                raise NotImplementedError(
                    "non-default DAC conditioning unsupported"
                )
            h, w, comps = frame
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved arithmetic scan unsupported"
                )
            bycid = {c[0]: c for c in comps}
            scan = []
            for i in range(ns):
                cs, _tdta = body[1 + 2 * i : 3 + 2 * i]
                _, chf, cvf, tq = bycid[cs]
                scan.append((cs, tq, chf, cvf))
            hmax = max(c[2] for c in scan)
            vmax = max(c[3] for c in scan)
            if ns == 1:
                hmax = vmax = 1
                scan[0] = scan[0][:2] + (1, 1)
            mcu_rows = -(-h // (8 * vmax))
            mcu_cols = -(-w // (8 * hmax))
            planes = [
                np.zeros(
                    (mcu_rows * cvf * 8, mcu_cols * chf * 8), dtype=np.uint8
                )
                for (_, _, chf, cvf) in scan
            ]
            ntab = max(c[1] for c in scan) + 1

            def fresh(start_pos):
                return (
                    ArithDecoder(data, start_pos),
                    [bytearray(64) for _ in range(ntab)],
                    [bytearray(256) for _ in range(ntab)],
                    bytearray([_FIXED]),
                    [0] * ns,
                    [0] * ns,
                )

            dec, dc_stats, ac_stats, fixed, pred, dc_ctx = fresh(pos)
            mcu = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if (
                        restart_interval
                        and mcu
                        and mcu % restart_interval == 0
                    ):
                        # find the next marker at/after the decoder
                        # position: the decoder reads lazily, so
                        # unconsumed interval bytes (and stuffed
                        # FF 00s / FF fill bytes per B.1.1.2) may sit
                        # between dec.pos and the RSTn
                        p = dec.pos
                        while p + 1 < len(data):
                            if data[p] != 0xFF:
                                p += 1
                            elif data[p + 1] == 0x00:
                                p += 2  # stuffed data byte
                            elif data[p + 1] == 0xFF:
                                p += 1  # fill byte
                            else:
                                break  # a real marker
                        if not (
                            p + 1 < len(data)
                            and data[p] == 0xFF
                            and 0xD0 <= data[p + 1] <= 0xD7
                        ):
                            raise ValueError(
                                "jpeg-arith: RSTn expected at MCU "
                                f"{mcu} (restart interval "
                                f"{restart_interval})"
                            )
                        dec, dc_stats, ac_stats, fixed, pred, dc_ctx = (
                            fresh(p + 2)
                        )
                    mcu += 1
                    for ci, (_, tq, chf, cvf) in enumerate(scan):
                        for sy in range(cvf):
                            for sx in range(chf):
                                zz = np.zeros(64, dtype=np.int64)
                                diff, dc_ctx[ci] = _decode_dc(
                                    dec, dc_stats[tq], dc_ctx[ci]
                                )
                                pred[ci] += diff
                                zz[0] = pred[ci]
                                _decode_ac(dec, ac_stats[tq], fixed, zz)
                                block = np.zeros((8, 8), dtype=np.int64)
                                block[_ZR, _ZC] = zz
                                by = my * cvf + sy
                                bx = mx * chf + sx
                                planes[ci][
                                    by * 8 : by * 8 + 8,
                                    bx * 8 : bx * 8 + 8,
                                ] = dequantize_idct(
                                    block, qtables[tq], 255
                                )
            full = []
            for pi, (_, _, chf, cvf) in enumerate(scan):
                p = planes[pi]
                if chf != hmax or cvf != vmax:
                    p = np.repeat(
                        np.repeat(p, vmax // cvf, axis=0),
                        hmax // chf,
                        axis=1,
                    )
                full.append(p[:h, :w])
            if ns == 1:
                return full[0]
            if ns == 3:
                return _ycbcr_to_rgb(*full)
            raise NotImplementedError(f"{ns}-component JPEG unsupported")
    raise ValueError("no SOS in arithmetic JPEG")


# ---------------------------------------------------------------------------
# Progressive arithmetic DCT (SOF10, 0xFFCA) — T.81 Annex G with the
# Annex F statistical models (G.1.3.1-3): DC first scans reuse the
# sequential DC procedure on point-transformed values, DC refinement
# bits go through the non-adapting equiprobable state, AC first scans
# are the sequential band procedure over [Ss..Se], and AC refinement
# follows G.1.3.3's three-state clusters (EOB decision / newly-nonzero
# / correction bit) with signs through the fixed state.  Scope:
# grayscale and 4:4:4 color (subsampled progressive raises a named
# error); restart intervals inside progressive scans likewise.
# ---------------------------------------------------------------------------


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (B.2.3 —
    integer division semantics for AC, unlike the DC arithmetic
    shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_ac_refine(enc, ac_st, fixed, zz, ss, se, al):
    """G.1.3.3 AC successive-approximation encode for one block:
    ``zz`` holds FULL-precision quantized coefficients; this scan
    transmits bit ``al`` given the decoder already holds bits
    ``> al`` (Ah == al + 1)."""
    ah = al + 1
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zz[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac_st, st, 0)  # not EOB yet
        while True:
            v = int(zz[k])
            t = (-v if v < 0 else v) >> al
            if t:
                if t >> 1:  # already nonzero at the decoder
                    enc.encode(ac_st, st + 2, t & 1)
                else:  # newly nonzero: flag + sign via fixed state
                    enc.encode(ac_st, st + 1, 1)
                    enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(ac_st, 3 * (k - 1), 1)  # EOB


def _decode_ac_refine(dec, ac_st, fixed, coef, ss, se, al):
    """Mirror of :func:`_encode_ac_refine`; mutates the partial
    coefficient array ``coef`` in place."""
    p1 = 1 << al
    m1 = -(1 << al)
    kex = se
    while kex >= ss and coef[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(ac_st, st):
            break  # EOB
        while True:
            if coef[k]:
                if dec.decode(ac_st, st + 2):
                    coef[k] += m1 if coef[k] < 0 else p1
                break
            if dec.decode(ac_st, st + 1):
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg-arith: AC refine run past Se")
        k += 1


def _default_scan_script(ncomp: int) -> list[tuple]:
    """(comps, Ss, Se, Ah, Al) per scan — a libjpeg-shaped script:
    DC first at Al=1, split AC first scans at Al=2, two AC refinement
    passes, DC refinement last."""
    if ncomp == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 1, 63, 1, 0),
            ((0,), 0, 0, 1, 0),
        ]
    script = [((0, 1, 2), 0, 0, 0, 1)]
    for c in range(3):
        script += [((c,), 1, 5, 0, 2), ((c,), 6, 63, 0, 2)]
    for c in range(3):
        script.append(((c,), 1, 63, 2, 1))
    for c in range(3):
        script.append(((c,), 1, 63, 1, 0))
    script.append(((0, 1, 2), 0, 0, 1, 0))
    return script


def encode_jpeg_arith_progressive(
    arr: np.ndarray, scans: list[tuple] | None = None
) -> bytes:
    """Encode uint8 grayscale/RGB as a PROGRESSIVE arithmetic JPEG
    (SOF10) — same quantized coefficients as the sequential twin, the
    Annex G scan decomposition on top.  4:4:4 only (every progressive
    AC scan is single-component per B.2.3, and at 4:4:4 interleaved
    DC MCUs coincide with the block raster)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"uint8 input required, got {arr.dtype}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = _rgb_to_ycbcr(arr)
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = planes[0].shape
    ncomp = len(planes)
    quants = [QUANT_LUMA] if ncomp == 1 else [QUANT_LUMA, QUANT_CHROMA]
    tsel = [0] if ncomp == 1 else [0, 1, 1]
    scans = scans if scans is not None else _default_scan_script(ncomp)

    by, bx = -(-h // 8), -(-w // 8)
    coefs = []
    for ci in range(ncomp):
        p = np.pad(
            planes[ci],
            ((0, by * 8 - h), (0, bx * 8 - w)),
            mode="edge",
        )
        cz = np.zeros((by, bx, 64), np.int64)
        for y in range(by):
            for x in range(bx):
                coef = fdct_quantize(
                    p[y * 8:y * 8 + 8, x * 8:x * 8 + 8],
                    quants[tsel[ci]],
                )
                cz[y, x] = coef[_ZR, _ZC]
        coefs.append(cz)

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xFFE0,
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0),
    )
    for ti, q in enumerate(quants):
        out += _seg(0xFFDB, bytes([ti]) + bytes(int(q[r, c]) for r, c in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, tsel[ci]])
    out += _seg(0xFFCA, sof)  # SOF10: arithmetic progressive DCT

    ntab = len(quants)
    for comps, ss, se, ah, al in scans:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        enc = ArithEncoder()
        dc_stats = [bytearray(64) for _ in range(ntab)]
        ac_stats = [bytearray(256) for _ in range(ntab)]
        fixed = bytearray([_FIXED])
        if ss == 0:  # DC scan (interleaved over `comps`)
            pred = {ci: 0 for ci in comps}
            dc_ctx = {ci: 0 for ci in comps}
            for y in range(by):
                for x in range(bx):
                    for ci in comps:
                        dc = int(coefs[ci][y, x, 0])
                        if ah == 0:  # first scan: arithmetic shift
                            dcv = dc >> al
                            diff = dcv - pred[ci]
                            pred[ci] = dcv
                            dc_ctx[ci] = _encode_dc(
                                enc, dc_stats[tsel[ci]], dc_ctx[ci], diff
                            )
                        else:  # refinement: one equiprobable bit
                            enc.encode(fixed, 0, (dc >> al) & 1)
        else:  # AC scan (single component per spec)
            (ci,) = comps
            t = tsel[ci]
            for y in range(by):
                for x in range(bx):
                    zz = coefs[ci][y, x]
                    if ah == 0:
                        zzt = np.array(
                            [_pt_ac(int(v), al) for v in zz], np.int64
                        )
                        _encode_ac(enc, ac_stats[t], fixed, zzt, ss, se)
                    else:
                        _encode_ac_refine(
                            enc, ac_stats[t], fixed, zz, ss, se, al
                        )
        out += enc.getvalue()
    out += b"\xff\xd9"
    return bytes(out)


def _decode_arith_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive arithmetic JPEG (SOF10, 8-bit, 4:4:4 /
    grayscale, default conditioning): accumulate per-component
    coefficient approximations across scans, IDCT at EOI."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    frame = None
    coefs = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                n = 64 * (2 if pq else 1)
                raw = body[bp:bp + n]
                bp += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZR, _ZC] = vals
                qtables[tq] = q
        elif marker == 0xCA:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"arithmetic JPEG precision {prec} unsupported"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled progressive arithmetic JPEG "
                        "unsupported (4:4:4 / grayscale only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
            by, bx = -(-h // 8), -(-w // 8)
            coefs = [
                np.zeros((by, bx, 64), np.int64) for _ in range(nc)
            ]
        elif marker == 0xCC:
            raise NotImplementedError(
                "non-default DAC conditioning unsupported"
            )
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise NotImplementedError(
                    "restart intervals inside progressive arithmetic "
                    "scans unsupported"
                )
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF10")
            h, w, comps = frame
            by, bx = -(-h // 8), -(-w // 8)
            ns = body[0]
            scomp = []
            bycid = {cid: i for i, (cid, _) in enumerate(comps)}
            for i in range(ns):
                cs = body[1 + 2 * i]
                scomp.append(bycid[cs])
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            ntab = max(tq for _, tq in comps) + 1
            dec = ArithDecoder(data, pos)
            dc_stats = [bytearray(64) for _ in range(ntab)]
            ac_stats = [bytearray(256) for _ in range(ntab)]
            fixed = bytearray([_FIXED])
            if ss == 0:
                pred = {ci: 0 for ci in scomp}
                dc_ctx = {ci: 0 for ci in scomp}
                for y in range(by):
                    for x in range(bx):
                        for ci in scomp:
                            tq = comps[ci][1]
                            if ah == 0:
                                diff, dc_ctx[ci] = _decode_dc(
                                    dec, dc_stats[tq], dc_ctx[ci]
                                )
                                pred[ci] += diff
                                coefs[ci][y, x, 0] = pred[ci] << al
                            elif dec.decode(fixed, 0):
                                coefs[ci][y, x, 0] |= 1 << al
            else:
                if ns != 1:
                    raise ValueError(
                        "progressive AC scan must be single-component"
                    )
                ci = scomp[0]
                tq = comps[ci][1]
                for y in range(by):
                    for x in range(bx):
                        if ah == 0:
                            zz = np.zeros(64, np.int64)
                            _decode_ac(
                                dec, ac_stats[tq], fixed, zz, ss, se
                            )
                            coefs[ci][y, x, ss:se + 1] = (
                                zz[ss:se + 1] << al
                            )
                        else:
                            _decode_ac_refine(
                                dec,
                                ac_stats[tq],
                                fixed,
                                coefs[ci][y, x],
                                ss,
                                se,
                                al,
                            )
            # skip to the next marker (stuffed FF 00s / fill bytes)
            p = dec.pos
            while p + 1 < len(data):
                if data[p] != 0xFF:
                    p += 1
                elif data[p + 1] == 0x00:
                    p += 2
                elif data[p + 1] == 0xFF:
                    p += 1
                else:
                    break
            pos = p
    if frame is None or coefs is None:
        raise ValueError("no SOF10 frame decoded")
    h, w, comps = frame
    by, bx = -(-h // 8), -(-w // 8)
    full = []
    for ci, (_cid, tq) in enumerate(comps):
        plane = np.zeros((by * 8, bx * 8), np.uint8)
        for y in range(by):
            for x in range(bx):
                block = np.zeros((8, 8), np.int64)
                block[_ZR, _ZC] = coefs[ci][y, x]
                plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] = dequantize_idct(
                    block, qtables[tq], 255
                )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return full[0]
    if len(full) == 3:
        return _ycbcr_to_rgb(*full)
    raise NotImplementedError(f"{len(full)}-component JPEG unsupported")
