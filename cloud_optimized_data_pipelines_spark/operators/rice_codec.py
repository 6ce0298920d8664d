"""Pure-python/numpy CCSDS 121.0-B extended-Rice codec — the szip
entropy coder, implemented from the public CCSDS 121.0-B-2 Blue Book
(the spec szip/libaec implement) so szip-compressed HDF5 chunks decode
without libsz.

Bitstream layout (MSB-first bit packing, as szip's SZ_MSB default):

- samples are processed in SCANLINES of ``pixels_per_scanline``
  samples; each scanline is an independent reference-sample interval
  (szip semantics: the unit-delay predictor resets per scanline);
- each scanline is split into BLOCKS of ``pixels_per_block`` (J)
  samples; per block an option-ID field selects the code:

  | ID (``id_len`` bits)       | option                               |
  |----------------------------|--------------------------------------|
  | 0, then one bit ``0``      | zero-block run (FS-coded run length) |
  | 0, then one bit ``1``      | second-extension                     |
  | k+1 (1 .. 2^id_len - 2)    | k-bit sample-split                   |
  | all ones                   | no compression (raw n-bit samples)   |

  ``id_len`` = 3 for n <= 8 bits/sample, 4 for n <= 16, 5 for n <= 32
  (CCSDS 121.0-B-2 table 5-1, matching szip/libaec);
- FS (fundamental sequence) codeword of m = m ``0`` bits then a ``1``;
- k-split: the FS codes of (d >> k) for every sample in the block,
  THEN the k LSBs of every sample (5.1.2: split parts follow the FS
  block);
- second-extension: consecutive sample pairs (d0, d1) map to
  m = (d0+d1)(d0+d1+1)/2 + d1, FS-coded (5.1.4);
- zero-block: FS value f encodes a run of f+1 zero blocks for
  f <= 3, ``ROS`` (rest of the 64-block segment is zero) for f = 4,
  and a run of f blocks for f >= 5 (5.1.3);
- NN preprocessing (szip SZ_NN_OPTION_MASK): the FIRST sample of each
  scanline is a reference sample stored RAW (n bits, immediately
  after the first block's ID field); every other sample is the
  standard mapped prediction residual against its left neighbor
  (4.2.2): with theta = min(pred, 2^n - 1 - pred),
  delta in [0, theta] -> 2*delta, [-theta, 0) -> 2|delta| - 1,
  else theta + |delta|.  EC mode (SZ_EC) codes raw sample values with
  no reference;
- in the second-extension option, pair alignment is by absolute block
  position — a reference sample occupies position 0, so the first FS
  of a reference block yields only its second element (libaec's
  ``m_se`` rule).

Compatibility: validated by round-trip over every option, by
hand-pinned golden bitstreams derived from the spec text, and against
the spec's worked mappings.  No szip/libaec binary exists in this
container to cross-check real-world streams; scanlines that are not a
whole number of blocks (szip pads these) raise a NAMED error rather
than guessing the padding rule.
"""

from __future__ import annotations

import numpy as np


def _id_len(n_bits: int) -> int:
    if n_bits <= 8:
        return 3
    if n_bits <= 16:
        return 4
    if n_bits <= 32:
        return 5
    raise ValueError(f"rice: bits_per_pixel {n_bits} > 32 unsupported")


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, width: int) -> None:
        if width == 0:
            return
        self._acc = (self._acc << width) | (value & ((1 << width) - 1))
        self._n += width
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_fs(self, m: int) -> None:
        # m zeros then a one; bulk zeros in 32-bit chunks
        while m >= 32:
            self.write(0, 32)
            m -= 32
        self.write(1, m + 1)

    def getvalue(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.buf.append((self._acc << pad) & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self.buf)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        end = pos + width
        if end > len(data) * 8:
            raise ValueError("rice: bitstream truncated")
        while width:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < width else width
            out = (out << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            pos += take
            width -= take
        self.pos = pos
        return out

    def read_fs(self) -> int:
        m = 0
        while self.read(1) == 0:
            m += 1
            if m > 1 << 20:  # corrupt-stream guard
                raise ValueError("rice: runaway FS codeword")
        return m


def _map_nn(scan: np.ndarray, n_bits: int) -> np.ndarray:
    """CCSDS 4.2.2 prediction-residual mapping for one scanline; index
    0 is the reference (returned as-is, stored raw by the caller)."""
    x = scan.astype(np.int64)
    xmax = (1 << n_bits) - 1
    pred = x[:-1]
    delta = x[1:] - pred
    theta = np.minimum(pred, xmax - pred)
    mapped = np.where(
        (delta >= 0) & (delta <= theta),
        2 * delta,
        np.where((delta < 0) & (-delta <= theta), -2 * delta - 1,
                 theta + np.abs(delta)),
    )
    out = np.empty_like(x)
    out[0] = x[0]
    out[1:] = mapped
    return out


def _unmap_nn(mapped: np.ndarray, n_bits: int) -> np.ndarray:
    """Inverse of :func:`_map_nn` (sequential — each sample's theta
    depends on the previous reconstruction)."""
    xmax = (1 << n_bits) - 1
    out = np.empty(len(mapped), np.int64)
    out[0] = mapped[0]
    prev = int(mapped[0])
    for i in range(1, len(mapped)):
        d = int(mapped[i])
        theta = prev if prev <= xmax - prev else xmax - prev
        if d <= 2 * theta:
            delta = d // 2 if d % 2 == 0 else -((d + 1) // 2)
        else:
            mag = d - theta
            delta = mag if prev + mag <= xmax else -mag
        prev = prev + delta
        out[i] = prev
    return out


def _se_ms(block: np.ndarray) -> list[int]:
    """Second-extension FS values per pair — PYTHON ints: at 32
    bits/sample m = (d0+d1)(d0+d1+1)/2 + d1 overflows int64 (a negative
    'cost' silently won the option race before this guard)."""
    s = [int(v) for v in block]
    out = []
    for d0, d1 in zip(s[0::2], s[1::2]):
        t = d0 + d1
        out.append(t * (t + 1) // 2 + d1)
    return out


def _se_cost(block: np.ndarray) -> int:
    ms = _se_ms(block)
    return sum(ms) + len(ms)


def rice_encode(
    samples: np.ndarray,
    n_bits: int,
    pixels_per_block: int = 16,
    pixels_per_scanline: int = 128,
    nn: bool = True,
) -> bytes:
    """Encode unsigned samples (< 2^n_bits).  Total length must be a
    whole number of scanlines and scanlines a whole number of blocks
    (the szip geometries our HDF5 writer emits)."""
    j = pixels_per_block
    idl = _id_len(n_bits)
    uncomp_id = (1 << idl) - 1
    max_k = uncomp_id - 2  # ids 1..2^idl-2 are k = id-1
    flat = np.asarray(samples).reshape(-1).astype(np.int64)
    if flat.size % pixels_per_scanline:
        raise ValueError("rice: samples must fill whole scanlines")
    if pixels_per_scanline % j:
        raise ValueError(
            "rice: pixels_per_scanline must be a multiple of "
            "pixels_per_block (szip pads partial blocks; this codec "
            "does not guess that rule)"
        )
    if flat.min(initial=0) < 0 or flat.max(initial=0) >= (1 << n_bits):
        raise ValueError(f"rice: samples out of [0, 2^{n_bits})")
    w = BitWriter()
    for s0 in range(0, flat.size, pixels_per_scanline):
        scan = flat[s0 : s0 + pixels_per_scanline]
        mapped = _map_nn(scan, n_bits) if nn else scan
        nblocks = pixels_per_scanline // j
        b = 0
        while b < nblocks:
            ref = nn and b == 0
            start = b * j
            block = mapped[start + (1 if ref else 0) : start + j]
            # zero-run (never on the reference block: the spec's
            # ref-inside-zero-run layout is implementation-defined
            # enough that this encoder just never emits it)
            if not ref and not block.any():
                run = 1
                seg_end = min(((b // 64) + 1) * 64, nblocks)
                while (
                    b + run < seg_end
                    and not mapped[(b + run) * j : (b + run + 1) * j].any()
                ):
                    run += 1
                w.write(0, idl)  # low-entropy ID
                w.write(0, 1)  # zero-block
                if b + run == seg_end and run >= 5:
                    w.write_fs(4)  # ROS: zero to the segment end
                elif run <= 4:
                    w.write_fs(run - 1)
                else:
                    w.write_fs(run)
                b += run
                continue
            # candidate costs
            fs_cost = int(block.sum()) + len(block)  # k = 0
            best_k, best_cost = 0, fs_cost
            for k in range(1, max_k + 1):
                c = int((block >> k).sum()) + len(block) + k * len(block)
                if c < best_cost:
                    best_k, best_cost = k, c
                if (block >> k).max(initial=0) == 0 and k > 0:
                    break  # larger k only adds split bits
            uncomp_cost = n_bits * len(block)
            se_ok = len(block) % 2 == 0 or ref
            # SE pairs align to absolute positions; ref occupies pos 0
            se_block = (
                np.concatenate(([0], block)) if ref else block
            )
            se_cost = _se_cost(se_block) + 1 if se_ok else 1 << 60
            # (the reference sample costs n_bits under EVERY option —
            # k-split, SE, and uncompressed all emit it verbatim — so
            # it cancels out of the comparison and carries no term here)
            if uncomp_cost <= best_cost and uncomp_cost <= se_cost:
                # no-compression stores the J PREPROCESSED samples
                # (mapped[0] of a reference block IS the raw reference)
                w.write(uncomp_id, idl)
                for v in mapped[start : start + j]:
                    w.write(int(v), n_bits)
            elif se_cost < best_cost:
                w.write(0, idl)
                w.write(1, 1)  # second-extension
                if ref:
                    w.write(int(mapped[start]), n_bits)
                for m in _se_ms(se_block):
                    w.write_fs(m)
            else:
                w.write(best_k + 1, idl)
                if ref:
                    w.write(int(mapped[start]), n_bits)
                for v in block >> best_k:
                    w.write_fs(int(v))
                if best_k:
                    for v in block & ((1 << best_k) - 1):
                        w.write(int(v), best_k)
            b += 1
    return w.getvalue()


def rice_decode(
    data: bytes,
    n_samples: int,
    n_bits: int,
    pixels_per_block: int = 16,
    pixels_per_scanline: int = 128,
    nn: bool = True,
) -> np.ndarray:
    """Decode ``n_samples`` unsigned samples from a CCSDS-121/szip
    bitstream.  Returns int64 values in [0, 2^n_bits)."""
    j = pixels_per_block
    idl = _id_len(n_bits)
    uncomp_id = (1 << idl) - 1
    if n_samples % pixels_per_scanline:
        raise ValueError("rice: n_samples must fill whole scanlines")
    if pixels_per_scanline % j:
        raise ValueError(
            "rice: pixels_per_scanline must be a multiple of "
            "pixels_per_block (szip pads partial blocks; this codec "
            "does not guess that rule)"
        )
    r = BitReader(data)
    out = np.empty(n_samples, np.int64)
    for s0 in range(0, n_samples, pixels_per_scanline):
        nblocks = pixels_per_scanline // j
        mapped = np.zeros(pixels_per_scanline, np.int64)
        b = 0
        while b < nblocks:
            ref = nn and b == 0
            start = b * j
            nvals = j - (1 if ref else 0)
            ident = r.read(idl)
            if ident == 0:
                low = r.read(1)
                if ref:
                    mapped[start] = r.read(n_bits)
                if low == 0:  # zero-block run
                    f = r.read_fs()
                    if f <= 3:
                        run = f + 1
                    elif f == 4:  # ROS
                        run = min(((b // 64) + 1) * 64, nblocks) - b
                    else:
                        run = f
                    # mapped already zeros; just advance
                    b += run
                    continue
                # second-extension: pairs aligned to block positions
                vals = []
                i = 1 if ref else 0
                while i < j:
                    m = r.read_fs()
                    # invert m = t(t+1)/2 + d1 with t = d0 + d1
                    t = int((np.sqrt(8.0 * m + 1.0) - 1.0) // 2)
                    while t * (t + 1) // 2 > m:
                        t -= 1
                    while (t + 1) * (t + 2) // 2 <= m:
                        t += 1
                    d1 = m - t * (t + 1) // 2
                    d0 = t - d1
                    if i % 2 == 0:
                        vals.append(d0)
                        vals.append(d1)
                        i += 2
                    else:  # ref occupies pair position 0
                        vals.append(d1)
                        i += 1
                mapped[start + (1 if ref else 0) : start + j] = vals[:nvals]
            elif ident == uncomp_id:
                for i in range(j):
                    mapped[start + i] = r.read(n_bits)
            else:
                k = ident - 1
                if ref:
                    mapped[start] = r.read(n_bits)
                hi = [r.read_fs() for _ in range(nvals)]
                if k:
                    lo = [r.read(k) for _ in range(nvals)]
                else:
                    lo = [0] * nvals
                mapped[start + (1 if ref else 0) : start + j] = [
                    (h << k) | l for h, l in zip(hi, lo)
                ]
            b += 1
        if nn:
            out[s0 : s0 + pixels_per_scanline] = _unmap_nn(mapped, n_bits)
        else:
            out[s0 : s0 + pixels_per_scanline] = mapped
    return out
