"""Graph ranking operators (extension, SURVEY section 7.7).

PageRank over an edge DataFrame — the Common-Crawl-style host/page
quality rank a web-corpus pipeline feeds into selection (harmonic
centrality / PageRank are the standard URL-level quality priors next
to the text-level classifiers in ``operators/quality.py``).

**Integer-scaled arithmetic for cross-engine bit-exactness.**  Textbook
PageRank sums floating-point contributions, whose value depends on
reduction order — un-oracle-able across engines.  Here ranks live in
integer micro-units (``scale`` per node initially) and each update is

    r'(v) = base + SUM over in-edges u->v of
            (num * r(u)) DIV (den * outdeg(u))

with ``damping = num/den`` (default 17/20 = 0.85) and ``base =
scale * (den - num) DIV den``.  Every operation is BIGINT arithmetic:
integer sums are associative, so Spark's parallel aggregation and
DuckDB's serial one produce THE SAME NUMBERS, and the oracle unrolls
the iterations as plain CTEs.  The floor per contribution loses < 1
micro-unit per in-edge — at scale=10^9 a relative error < 10^-9 per
term vs the real-valued recurrence, far below any ranking use.

Semantics notes:
- fixed ``iters`` (deterministic, SQL-unrollable), no convergence test;
- dangling nodes (no out-edges) leak their mass — the simplified
  variant most link-spam literature uses; pass a symmetrized edge list
  for random-walk-on-undirected-graph semantics;
- overflow bound: ``num * total_mass`` must fit in int64, i.e.
  ``n_nodes * scale * num < 2^63`` — at 10^9 nodes drop ``scale`` to
  10^6 (documented, asserted at the driver only via the node count the
  caller already knows).

Scale shape: per iteration one equi-join of the edge list with the
current rank table (both keyed on the source node — AQE picks
broadcast while ranks fit, sort-merge beyond) plus one
partial-aggregated groupBy on the destination; lineage is truncated
per round (``checkpoint_dir`` for executor-loss resilience, same knob
as ``dedup.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.operators.dedup import _make_ckpt


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 1_000_000_000,
    damping_num: int = 17,
    damping_den: int = 20,
    checkpoint: bool = True,
    checkpoint_dir=None,
) -> DataFrame:
    """Integer-scaled PageRank; see module docstring.

    Returns (node, rank) with rank in micro-units of ``scale``;
    ``rank / scale`` is the conventional per-node rank value.
    """
    ckpt = _make_ckpt(edges, checkpoint, checkpoint_dir)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = ckpt(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = ckpt(nodes)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = scale * (damping_den - damping_num) // damping_den
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.expr(
                    f"({damping_num} * r) DIV ({damping_den} * deg)"
                ).alias("c"),
            )
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = ckpt(
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))
