"""MP3 near-dup at corpus scale: the full pipeline — encode real
Layer III streams on executors, scalefactors-only parse-back,
120-bit fingerprint, band_geometry-adaptive banded-Hamming join —
at V = 2 000 and 20 000 streams (125x / 1250x the graded fixture).

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


def _scf_bits(base: int) -> np.ndarray:
    """120 deterministic md5-derived bits for a base (bit k -> the
    fingerprint bit of (granule k//21, sfb k%21))."""
    bits = []
    h = b""
    k = 0
    while len(bits) < 120:
        h = hashlib.md5(f"mp3scale:{base}:{k}".encode()).digest()
        for byte in h:
            for s in range(8):
                bits.append((byte >> s) & 1)
                if len(bits) == 120:
                    break
            if len(bits) == 120:
                break
        k += 1
    return np.array(bits, np.int64)


def build_fp(v: int) -> dict:
    """Encode stream v, parse scalefactors back (samples=False),
    return the fingerprint words + stream bytes."""
    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        decode_mp3,
        encode_mp3,
    )

    base = v // 2
    bits = _scf_bits(base)
    n_gr = 6
    scf = np.zeros((n_gr, 21), np.int64)
    for k in range(120):
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
    fp_bits = (parsed.reshape(-1)[:120] >= 4).astype(np.int64)
    words = []
    for w in range(2):
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
        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame([build_fp(int(x)) for x in pdf["id"]])

        t0 = time.perf_counter()
        fps = spark.range(V, numPartitions=32).mapInPandas(
            gen, "variant bigint, n_bytes bigint, fp array<bigint>"
        ).cache()
        n_built = fps.count()
        t_build = time.perf_counter() - t0

        _, _, width = band_geometry(V, max_hamming=3)
        bpwd = 60 // width
        t0 = time.perf_counter()
        pairs = banded_hamming_pairs(
            fps, "variant", "fp",
            num_bands=2 * bpwd, width=width, max_hamming=3,
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
            f"PROBE mp3-scale V={V} width={width} "
            f"build+parse+fp={t_build:.1f}s "
            f"({V / t_build:.0f} streams/s) join={t_join:.1f}s "
            f"pairs={len(got)} exact-sibling-match",
            flush=True,
        )
        fps.unpersist()


if __name__ == "__main__":
    main()
