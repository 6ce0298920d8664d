"""MP3 near-dup at corpus scale: the full pipeline — encode real
Layer III streams on executors, scalefactors-only parse-back,
120-bit fingerprint, band_geometry-adaptive banded-Hamming join —
at V = 2 000 .. 5 000 000 streams (up to 312 500x the graded
fixture).  The probe honors the FULL band_geometry contract: past the
~4.2M width-60 transition the geometry asks for words=4 (a 240-bit
fingerprint), which the builder satisfies with 12 granules x 21
scalefactor bands per stream — scale buys wider bands through LONGER
fingerprints, never through losing recall (pigeonhole floor
num_bands >= h+1 preserved).

Corpus design: V streams in sibling PAIRS (base b = v // 2).  Each
base's scalefactors derive from md5(base, granule, sfb) — random
enough that 10k bases stay decorrelated far beyond the Hamming-3
join radius — and siblings share scalefactors while carrying
different spectra (byte-distinct streams, fingerprint collision at
Hamming 0).  Correctness gate: the banded join must return EXACTLY
the V/2 sibling pairs.

Usage: python tools/probe_mp3_scale.py [V ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402


def _scf_bits(base: int, n_bits: int = 120) -> np.ndarray:
    """n_bits deterministic md5-derived bits for a base (bit k -> the
    fingerprint bit of (granule k//21, sfb k%21))."""
    bits = []
    h = b""
    k = 0
    while len(bits) < n_bits:
        h = hashlib.md5(f"mp3scale:{base}:{k}".encode()).digest()
        for byte in h:
            for s in range(8):
                bits.append((byte >> s) & 1)
                if len(bits) == n_bits:
                    break
            if len(bits) == n_bits:
                break
        k += 1
    return np.array(bits, np.int64)


def build_fp(v: int, n_words: int = 2) -> dict:
    """Encode stream v, parse scalefactors back (samples=False),
    return the n_words x 60-bit fingerprint + stream bytes.  The
    stream carries ceil(60 * n_words / 21) granules (rounded up to an
    even count) so the fingerprint draws every bit from a REAL parsed
    scalefactor cell."""
    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        decode_mp3,
        encode_mp3,
    )

    base = v // 2
    n_bits = 60 * n_words
    n_gr = -(-n_bits // 21)
    n_gr += n_gr % 2
    bits = _scf_bits(base, n_bits)
    scf = np.zeros((n_gr, 21), np.int64)
    for k in range(n_bits):
        g, j = divmod(k, 21)
        scf[g, j] = 5 if bits[k] else 2
    gg = np.arange(n_gr, dtype=np.int64)[:, None]
    i = np.arange(576, dtype=np.int64)[None, :]
    spectra = np.where(i < 64, (7 * i + 13 * gg + v) % 7 - 3, 0)
    enc = encode_mp3(spectra, scalefactors=scf, scalefac_compress=13)
    frames = decode_mp3(enc, samples=False)
    parsed = np.vstack([
        g2["scalefactors"] for fr in frames for chs in fr["granules"]
        for g2 in chs
    ])[:n_gr]
    fp_bits = (parsed.reshape(-1)[:n_bits] >= 4).astype(np.int64)
    words = []
    for w in range(n_words):
        word = 0
        for t in range(60):
            word = (word << 1) | int(fp_bits[w * 60 + t])
        words.append(word)
    return {"variant": v, "n_bytes": len(enc), "fp": words}


def main() -> None:
    from cloud_optimized_data_pipelines_spark.operators.multimodal import (
        band_geometry,
        banded_hamming_pairs,
    )

    spark = get_spark("probe-mp3-scale")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 20000]
    for V in sizes:
        n_words, num_bands, width = band_geometry(V, max_hamming=3)
        n_words = max(2, n_words)  # the graded fixture floor
        num_bands = max(num_bands, (60 // width) * n_words)

        def gen(batches, n_words=n_words):
            for pdf in batches:
                yield pd.DataFrame(
                    [build_fp(int(x), n_words) for x in pdf["id"]]
                )

        t0 = time.perf_counter()
        fps = spark.range(V, numPartitions=32).mapInPandas(
            gen, "variant bigint, n_bytes bigint, fp array<bigint>"
        ).cache()
        n_built = fps.count()
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = banded_hamming_pairs(
            fps, "variant", "fp",
            num_bands=num_bands, width=width, max_hamming=3,
        )
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        t_join = time.perf_counter() - t0
        want = {(2 * b, 2 * b + 1) for b in range(V // 2)}
        assert n_built == V
        assert got == want, (
            f"pairs mismatch: extra={len(got - want)} "
            f"missing={len(want - got)}"
        )
        print(
            f"PROBE mp3-scale V={V} words={n_words} width={width} "
            f"bands={num_bands} "
            f"build+parse+fp={t_build:.1f}s "
            f"({V / t_build:.0f} streams/s) join={t_join:.1f}s "
            f"pairs={len(got)} exact-sibling-match",
            flush=True,
        )
        fps.unpersist()


if __name__ == "__main__":
    main()
