"""Dump .explain('formatted') for queries to plans/r15/<q>_<tag>.txt.

Usage: python tools/dump_plan.py <tag> [sf_dir] query [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_optimized_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    from cloud_optimized_data_pipelines_spark.queries import QUERIES, load_tables

    load_tables(spark, sf_dir)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in args:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
