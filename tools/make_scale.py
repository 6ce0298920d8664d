"""Scale-up generator for local stress testing: replicates the sf0.1
tables N times with shifted keys into a multi-file parquet layout
(proper input splits, unlike the single-row-group originals).

Usage: python tools/make_scale.py [out_dir] [factor]
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
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    spark = get_spark("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    dfs = load_tables(spark, src)
    for t in TABLES:
        df = dfs[t]
        if t in DIMS:
            out = df
        else:
            reps = []
            for i in range(factor):
                rep = df
                for col, stride in SHIFT.get(t, {}).items():
                    rep = rep.withColumn(col, F.col(col) + F.lit(i * stride))
                reps.append(rep)
            out = reps[0]
            for r in reps[1:]:
                out = out.unionByName(r)
        out.repartition(8 if t not in DIMS else 1).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(t, "written")


if __name__ == "__main__":
    main()
