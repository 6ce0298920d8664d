"""Scale-up generator for local stress testing: replicates the sf0.1
tables N times with shifted keys into a multi-file parquet layout
(proper input splits, unlike the single-row-group originals).

Usage: python tools/make_scale.py [out_dir] [factor] [--perturb] [--tables a,b]

``--perturb`` tags every token of ``documents.text`` with the replica
index (token -> token_rN).  Plain replication makes every replica of a
doc an EXACT near-dup of every other replica — pair-output grows
quadratically in the factor (C(factor, 2) cliques), which is the
pathological corpus, not the realistic one.  Token-tagging makes
replica fingerprints (simhash / minhash / shingles) independent, so
true near-dup pairs grow LINEARLY with the factor — the honest shape
for measuring contraction/scan scaling at 1000x.

``--tables`` restricts output to a comma list (a 1000x probe that only
reads documents+embeddings should not pay for 600M lineitem rows).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloud_optimized_data_pipelines_spark.queries import TABLES, load_tables  # noqa: E402
from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402

# key columns shifted per replica so fact keys stay unique and joins
# against (unreplicated) dimension tables still resolve
SHIFT = {
    "orders": {"o_orderkey": 1_000_000},
    "lineitem": {"l_orderkey": 1_000_000},
    "events": {"event_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
DIMS = {"region", "nation", "customer", "supplier", "part"}


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    perturb = "--perturb" in sys.argv
    tables = list(TABLES)
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = a.split("=", 1)[1].split(",")
    out_dir = argv[0] if argv else "/tmp/scale10"
    factor = int(argv[1]) if len(argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    spark = get_spark("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    dfs = load_tables(spark, src)
    for t in tables:
        df = dfs[t]
        if t in DIMS:
            out = df
        else:
            # one explode, not a factor-way union: a 1000-branch union
            # plan stalls Catalyst analysis for minutes before a single
            # task runs; explode(sequence) is a single scan + generate
            out = df.withColumn(
                "_rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            for col, stride in SHIFT.get(t, {}).items():
                out = out.withColumn(
                    col, F.col(col) + F.col("_rep").cast("long") * stride
                )
            if perturb and t == "documents":
                tag = F.concat(F.lit("_r"), F.col("_rep").cast("string"))
                out = out.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split("text", " "),
                            lambda tok: F.concat(tok, tag),
                        ),
                    ),
                )
            out = out.drop("_rep")
        nparts = 1 if t in DIMS else max(8, min(64, factor // 8))
        out.repartition(nparts).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(t, "written")


if __name__ == "__main__":
    main()
