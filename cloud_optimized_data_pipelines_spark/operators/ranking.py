"""Lexical relevance scoring — Okapi BM25 over the documents table.

No reference counterpart (extension per SURVEY section 7.7): a
training-data pipeline uses lexical scoring to mine topic-focused
subsets ("find docs about X"), to build retrieval baselines, and as a
cheap relevance feature next to embedding similarity
(operators/similarity.py).

Okapi BM25 (Robertson & Walker 1994; the exact formula used by Lucene):

    idf(t)  = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = sum over query terms

Cross-engine float determinism is engineered the way the quality
operators do it: every input to the float expression is an exact
integer aggregate (tf, df, N, dl, sum(dl)); ``avgdl`` is
``CAST(SUM(dl) AS DOUBLE) / N`` (never a float AVG, whose accumulation
order differs between engines); the idf is ROUNDED to 9 decimals
because JVM Math.log and libm ln differ by 1 ulp on a few percent of
arguments (the only non-exactly-rounded operation in the formula); and
the per-document total is a sum of per-term columns in FIXED
expression order, not an aggregation over a shuffle-ordered set — so
the doubles are bit-identical on any engine evaluating the same
formula tree.

Scale shape: one token explode filtered to the query terms (a narrow
codegen filter — the explode output for a q-term query is only the
matching occurrences), one (doc, term) count shuffle, a term-count
(q-row) broadcast for df, and two 1-row scalars (N, avgdl).  No
corpus-sized windows, joins only against metadata-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.text import tokens


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one query term.

    Output: (id_col, n_hits, score) — n_hits = number of distinct
    query terms present.  Docs with no hits are omitted (their score
    is identically 0); left-join against the corpus if zeros matter.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("tk")
    )
    dl = toks.select("doc", F.size("tk").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    words = toks.select("doc", F.explode("tk").alias("term")).filter(
        F.col("term").isin(terms)
    )
    tf = words.groupBy("doc", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.round(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    norm = F.col("tf").cast("double") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term = scored.withColumn(
        "s", idf * (F.col("tf").cast("double") * F.lit(float(k1 + 1))) / norm
    )
    # fixed-order total: one column per term, added in sorted-term
    # order — deterministic double addition on any engine
    aggs = [
        F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"_s_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = per_term.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_hits"), *aggs
    )
    total = None
    for i in range(len(terms)):
        c = F.coalesce(F.col(f"_s_{i}"), F.lit(0.0))
        total = c if total is None else total + c
    return per_doc.select(
        F.col("doc").alias(id_col), "n_hits", total.alias("score")
    )
