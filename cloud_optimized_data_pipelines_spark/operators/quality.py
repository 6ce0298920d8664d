"""Corpus quality filtering — Gopher/MassiveText-style document rules.

No reference counterpart (extension per SURVEY section 7.7).  Implements
the word-statistics subset of the public MassiveText quality filters
(Rae et al. 2021, "Scaling Language Models", table A1): word count
bounds, mean word length bounds, and a repetition signal (fraction of
the document taken by its single most frequent word).  Documents
failing any rule get ``keep = false``; the decision thresholds are
arguments so a pipeline can tune per-source.

Scale shape: one explode + two doc-keyed hash aggregations (word
counts, then doc stats) — both partial-aggregated, shuffle keyed on
(doc, word) then doc.  No windows, no joins against the corpus, no
Python.  The explode's row blow-up (one row per token) is the standard
inverted-index cost already paid by dedup; at 100 TB the stage is
scan + two map-side-combined shuffles of count-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.text import tokens


def word_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc word statistics: n_words, n_unique_words, top_word_cnt,
    char_sum (sum of word lengths, for mean word length)."""
    words = df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("word"))
    per_word = words.groupBy("doc", "word").agg(F.count("*").alias("cnt"))
    return per_word.groupBy("doc").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_unique_words"),
        F.max("cnt").cast("long").alias("top_word_cnt"),
        F.sum(F.length("word") * F.col("cnt")).cast("long").alias("char_sum"),
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_top_word_frac: float = 0.2,
) -> DataFrame:
    """MassiveText word-level rules as one declarative pass.

    Adds n_words, n_unique_words, mean_word_len, top_word_frac and the
    combined ``keep`` flag.  Empty documents (no tokens) are kept in
    the output with zero counts and keep=false — filters must never
    silently drop rows they rejected."""
    stats = word_stats(df, id_col, text_col)
    out = df.join(stats, df[id_col] == stats["doc"], "left").drop("doc")
    n_words = F.coalesce(F.col("n_words"), F.lit(0)).cast("long")
    mean_len = F.when(
        n_words > 0, F.col("char_sum").cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        n_words > 0,
        F.col("top_word_cnt").cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("n_words", n_words)
        .withColumn(
            "n_unique_words",
            F.coalesce(F.col("n_unique_words"), F.lit(0)).cast("long"),
        )
        .withColumn("mean_word_len", mean_len)
        .withColumn("top_word_frac", top_frac)
        .withColumn(
            "keep",
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (top_frac < max_top_word_frac),
        )
        .drop("top_word_cnt", "char_sum")
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, min_count: int = 1
) -> DataFrame:
    """CCNet-style language-model quality proxy: mean log-probability of
    each document under the corpus's own unigram distribution (low =
    rare-token soup / junk; high = stereotypical text).

    Cross-engine float determinism is engineered: per-token log-probs
    are log(count/total) of EXACT integer counts (identical doubles on
    any engine), and the per-doc sum is a left fold over the
    token-sorted array — not a shuffle-order-dependent SUM().

    Plan: explode -> token-count join on ``word`` -> per-doc sorted
    collect + fold.  The vocab side carries NO broadcast hint: a
    web-scale corpus's unigram vocabulary is hundreds of millions of
    rows — far past broadcast limits — and the explode already paid
    the word-keyed shuffle the join reuses, so AQE picks broadcast
    only when the vocab actually fits.  ``min_count`` (CCNet's answer
    to the long tail) folds words seen fewer than min_count times into
    one OOV bucket scored at the pooled tail mass
    ``log(oov_cnt/total)`` — thresholding is what bounds the vocab in
    production; the two 1-row scalars (total, oov) stay broadcast.
    """
    words = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    if min_count > 1:
        kept = vocab.filter(F.col("cnt") >= min_count)
        oov = vocab.filter(F.col("cnt") < min_count).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("oov_cnt")
        )
        scored = (
            words.join(kept, "word", "left")
            .crossJoin(F.broadcast(total))
            .crossJoin(F.broadcast(oov))
            .select(
                "doc",
                "word",
                F.log(
                    F.coalesce(F.col("cnt"), F.col("oov_cnt")).cast("double")
                    / F.col("total").cast("double")
                ).alias("logp"),
            )
        )
    else:
        scored = (
            words.join(vocab, "word")
            .crossJoin(F.broadcast(total))
            .select(
                "doc",
                "word",
                F.log(
                    F.col("cnt").cast("double") / F.col("total").cast("double")
                ).alias("logp"),
            )
        )
    per_doc = scored.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("word", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("sum_logp"),
    )
    return per_doc.select(
        F.col("doc").alias(id_col),
        "n_tokens",
        (F.col("sum_logp") / F.col("n_tokens").cast("double")).alias(
            "mean_logprob"
        ),
    )
