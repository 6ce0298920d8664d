"""Crawl-ingest decade ladder (VERDICT r11 "Next round #8"): run the
pipeline_crawl_ingest composition — .warc.gz scan -> warc_records
explode -> http_text_bodies (WET) -> token gate -> exact dedup —
at 100x / 1000x the graded fixture scale, with per-stage wall times
and a formula cross-check of survivorship.

Fixture: N crawl files x 200 responses each (the r11 SCALE.md ladder
shape).  Response (f, i) carries body text derived from key
``k = (f * 200 + i) % (N * 200 // DUP)`` — so exactly DUP responses
corpus-wide share each body (cross-FILE duplicates, the real crawl
shape) and global exact-dedup must keep one survivor per key.  Every
~5th response is shortened below the 35-token gate.

Usage: python tools/probe_crawl_decade.py [n_files ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cloud_optimized_data_pipelines_spark.functions import text as TT  # noqa: E402
from cloud_optimized_data_pipelines_spark.operators.dedup import (  # noqa: E402,E501
    exact_dedup_by_hash,
)
from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402
from cloud_optimized_data_pipelines_spark.sources.warc import (  # noqa: E402
    encode_warc_gz,
    encode_warc_record,
    http_text_bodies,
    warc_records,
)

RESP_PER_FILE = 200
DUP = 4          # corpus-wide copies of each distinct body
GATE = 35        # token threshold (matches the graded query)

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliet kilo lima mike november oscar papa quebec romeo "
          "sierra tango").split()

_HTTP_HEAD = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
)


def body_text(key: int, short: bool) -> str:
    n_tok = 12 if short else 40 + key % 25
    return " ".join(
        _WORDS[(key + 3 * j) % len(_WORDS)] for j in range(n_tok)
    ) + f" key{key}"


def build_file(f: int, n_files: int) -> bytes:
    n_keys = n_files * RESP_PER_FILE // DUP
    records = []
    for i in range(RESP_PER_FILE):
        g = f * RESP_PER_FILE + i
        key = g % n_keys
        short = (g % 5) == 0
        body = body_text(key, short).encode()
        records.append(
            encode_warc_record(
                "response",
                f"<urn:uuid:decade-{f}-{i}>",
                "2026-08-16T00:00:01Z",
                _HTTP_HEAD + body,
                target_uri=f"http://crawl.example/d/{f}/{i}",
                content_type="application/http; msgtype=response",
            )
        )
    return encode_warc_gz(records)


def main() -> None:
    spark = get_spark("probe-crawl-decade")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [200, 2000]
    for n_files in sizes:
        n_keys = n_files * RESP_PER_FILE // DUP

        def gen(batches, n_files=n_files):
            for pdf in batches:
                for x in pdf["id"]:
                    yield pd.DataFrame(
                        [{"file_id": int(x),
                          "blob": build_file(int(x), n_files)}]
                    )

        files = spark.range(
            n_files, numPartitions=min(n_files, 32)
        ).mapInPandas(gen, "file_id bigint, blob binary").cache()

        stages: dict[str, float] = {}

        def t(label, fn):
            t0 = time.perf_counter()
            out = fn()
            stages[label] = round(time.perf_counter() - t0, 2)
            return out

        n_built = t("build+cache", lambda: files.count())
        recs = warc_records(files, "file_id", "blob")
        n_recs = t("explode", lambda: recs.count())
        bodies = http_text_bodies(
            recs.filter(F.col("warc_type") == "response")
        ).withColumn("tokens", TT.token_count("body"))
        kept = bodies.filter(F.col("tokens") >= GATE).withColumn(
            "rid",
            F.col("file_id") * RESP_PER_FILE + F.col("record_index"),
        )
        n_kept = t("wet+gate", lambda: kept.count())
        surv = exact_dedup_by_hash(
            kept.select("file_id", "rid", "body"), "body", "rid"
        )
        n_unique = t("exact-dedup", lambda: surv.count())

        # e2e: the whole composition as one uncached lazy plan
        files.unpersist()
        files2 = spark.range(
            n_files, numPartitions=min(n_files, 32)
        ).mapInPandas(gen, "file_id bigint, blob binary")
        recs2 = warc_records(files2, "file_id", "blob")
        bodies2 = http_text_bodies(
            recs2.filter(F.col("warc_type") == "response")
        ).withColumn("tokens", TT.token_count("body"))
        kept2 = bodies2.filter(F.col("tokens") >= GATE).withColumn(
            "rid",
            F.col("file_id") * RESP_PER_FILE + F.col("record_index"),
        )
        surv2 = exact_dedup_by_hash(
            kept2.select("file_id", "rid", "body"), "body", "rid"
        )
        t("e2e-one-plan", lambda: surv2.count())

        # survivorship cross-check against the formula: kept = keys
        # whose LONG copies exist; every key has DUP copies, of which
        # copies at global index % 5 == 0 are short.  A key survives
        # iff at least one copy is long.
        exp_kept = sum(
            1
            for g in range(n_files * RESP_PER_FILE)
            if g % 5 != 0
        )
        exp_unique = len(
            {
                g % n_keys
                for g in range(n_files * RESP_PER_FILE)
                if g % 5 != 0
            }
        )
        assert n_built == n_files
        assert n_recs == n_files * RESP_PER_FILE, n_recs
        assert n_kept == exp_kept, (n_kept, exp_kept)
        assert n_unique == exp_unique, (n_unique, exp_unique)
        print(
            f"PROBE crawl-decade n_files={n_files} "
            f"records={n_recs} kept={n_kept} unique={n_unique} "
            f"stages={stages}",
            flush=True,
        )


if __name__ == "__main__":
    main()
