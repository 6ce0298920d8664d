"""MP3 mixed-corpus robustness at crawl scale (r14 — VERDICT r13
task 6): V streams whose bases alternate MPEG-1 / LSF encodings, each
wrapped in one of 8 real-crawl mixture classes —

  0 bare, 1 ID3v2, 2 ID3v1, 3 full LAME (ID3v2+Xing+audio+ID3v1),
  4 Xing prefix, 5 truncated, 6 truncated+ID3v1 (the tag must not
  resurrect the cut), 7 garbage bytes.

The gate is the named-error taxonomy at scale: every decodable class
must yield a fingerprint IDENTICAL to its base's bare stream (tag
wrapping never perturbs the dedup key), every broken class must raise
exactly its named error, and NOTHING may silently decode.  Outcomes
are classified per stream on executors; one groupBy verifies all
V/8 bases have exactly 5 agreeing decodables + 2 truncations + 1
sync error.

Usage: python tools/probe_mp3_robustness.py [V ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402

ID3V1 = b"TAG" + b"\x00" * 125


def _id3v2(n=64):
    return (b"ID3\x04\x00\x00"
            + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                     (n >> 7) & 0x7F, n & 0x7F]) + b"\x00" * n)


def _xing(version):
    from cloud_optimized_data_pipelines_spark.operators.mpeg_audio import (
        _header,
        parse_header,
    )

    rate = 44100 if version == "1" else 22050
    kbps = 128 if version == "1" else 64
    hdr4 = _header(3, kbps, rate, 0, 0b11, False, version=version)
    side = 17 if version == "1" else 9
    body = (b"\x00" * side + b"Info" + (0x3).to_bytes(4, "big")
            + (2).to_bytes(4, "big") + (999).to_bytes(4, "big"))
    return (hdr4 + body).ljust(parse_header(hdr4, 0)["frame_bytes"], b"\x00")


def one_stream(v: int) -> dict:
    import hashlib

    from cloud_optimized_data_pipelines_spark.operators.mp3_layer3 import (
        decode_mp3,
        encode_mp3,
    )

    base, cls = divmod(v, 8)
    lsf = base % 2 == 1
    n_gr = 4
    g = np.arange(n_gr, dtype=np.int64)[:, None]
    i = np.arange(576, dtype=np.int64)[None, :]
    spectra = np.where(
        i < 96, (4 * i + 13 * g + base) % 7 - 3,
        np.where(i < 160, (5 * i + 3 * g + base) % 3 - 1, 0),
    )
    j21 = np.arange(21, dtype=np.int64)[None, :]
    if lsf:
        scf = ((3 * j21 + g + base) % 4)  # sc=203 slens (2,2,2,3)
        audio = encode_mp3(spectra, sample_rate=22050, bitrate_kbps=64,
                           version="2", scalefac_compress=203,
                           scalefactors=scf)
    else:
        scf = (3 * j21 + g + base) % 8
        audio = encode_mp3(spectra, scalefac_compress=13,
                           scalefactors=scf)
    ver = "2" if lsf else "1"
    blob = {
        0: audio,
        1: _id3v2() + audio,
        2: audio + ID3V1,
        3: _id3v2() + _xing(ver) + audio + ID3V1,
        4: _xing(ver) + audio,
        5: audio[:-40],
        6: audio[:-40] + ID3V1,
        7: bytes((v * 37 + k * 11) % 251 for k in range(120)),
    }[cls]
    try:
        frames = decode_mp3(blob, samples=False)
        fp = hashlib.md5(repr([
            gg["scalefactors"] for fr in frames for chs in fr["granules"]
            for gg in chs
        ]).encode()).hexdigest()
        outcome = "decoded"
    except NotImplementedError as e:
        outcome, fp = f"NI:{str(e)[:24]}", ""
    except ValueError as e:
        msg = str(e)
        key = ("truncated" if "truncated" in msg
               else "sync" if "sync" in msg else msg[:24])
        outcome, fp = f"VE:{key}", ""
    return {"base": base, "cls": cls, "outcome": outcome, "fp": fp,
            "nbytes": len(blob)}


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [200_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    for v_total in sizes:
        t0 = time.time()

        def gen(batches):
            for pdf in batches:
                if len(pdf):
                    yield pd.DataFrame(
                        [one_stream(int(x)) for x in pdf["id"]]
                    )

        df = spark.range(0, v_total, numPartitions=64).mapInPandas(
            gen,
            "base bigint, cls bigint, outcome string, fp string, "
            "nbytes bigint",
        ).persist()  # three aggregations below — decode once
        per_base = df.groupBy("base").agg(
            F.count_if(F.col("outcome") == "decoded").alias("n_dec"),
            F.count_distinct(
                F.when(F.col("outcome") == "decoded", F.col("fp"))
            ).alias("n_fp"),
            F.count_if(F.col("outcome") == "VE:truncated").alias("n_trunc"),
            F.count_if(F.col("outcome") == "VE:sync").alias("n_sync"),
            F.sum("nbytes").alias("bytes"),
        )
        bad = per_base.filter(
            "n_dec != 5 OR n_fp != 1 OR n_trunc != 2 OR n_sync != 1"
        )
        n_bad = bad.count()
        agg = per_base.agg(
            F.count("*").alias("bases"), F.sum("bytes").alias("bytes")
        ).collect()[0]
        dt = time.time() - t0
        outcomes = {
            r["outcome"]: r["n"]
            for r in df.groupBy("outcome").agg(
                F.count("*").alias("n")).collect()
        }
        print(f"V={v_total}: {agg['bases']} bases, "
              f"{agg['bytes'] / 1e6:.1f} MB, {dt:.1f}s "
              f"({v_total / dt:,.0f} streams/s), bad_bases={n_bad}, "
              f"outcomes={outcomes}")
        if n_bad:
            bad.show(5)
            raise SystemExit(1)
        df.unpersist()
    print("taxonomy exact at every rung")


if __name__ == "__main__":
    main()
