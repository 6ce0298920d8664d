"""BPE training vs a pure-Python reference implementation."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.bpe import (
    apply_merge,
    bpe_train,
    word_freq_table,
)


# --- reference implementation (Sennrich-style, word-level) -----------------


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_freqs}
    rules = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, syms in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + word_freqs[w]
        if not counts:
            break
        # deterministic tie-break: count desc, then (a, b) lexicographic asc
        top_n = max(counts.values())
        best = min(p for p, n in counts.items() if n == top_n)
        a, b = best
        rules.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return rules, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new banana",
]


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    rules, vocab = bpe_train(docs, n_merges=8)

    wf = {}
    for line in CORPUS:
        for w in line.split():
            wf[w] = wf.get(w, 0) + 1
    ref_rules, ref_vocab = ref_bpe(wf, 8)

    assert rules == ref_rules
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == ref_vocab


def test_merge_is_leftmost_nonoverlapping(spark):
    v = spark.createDataFrame(
        [("aaaa", 1, list("aaaa")), ("abab", 1, list("abab"))],
        "word string, freq long, syms array<string>",
    )
    after_aa = {r["word"]: r["syms"] for r in apply_merge(v, "a", "a").collect()}
    assert after_aa["aaaa"] == ["aa", "aa"]
    after_ab = {r["word"]: r["syms"] for r in apply_merge(v, "a", "b").collect()}
    assert after_ab["abab"] == ["ab", "ab"]


def test_single_char_words_produce_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c a b a")], "doc_id long, text string")
    rules, _ = bpe_train(docs, n_merges=3)
    assert rules == []  # nothing mergeable, loop stops cleanly


def test_word_table_is_vocab_sized(spark, sf_dir):
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    wf = word_freq_table(docs)
    n_words = wf.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.coalesce("text", F.lit("")), r"\s+")))
    ).first()[0]
    assert n_words < n_tokens  # iterations run on the small table


def test_encode_replays_training_merges(spark):
    """bpe_encode on the training corpus must reproduce the trained
    vocab's symbol sequences word-for-word."""
    from cloud_optimized_data_pipelines_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    rules, vocab = bpe_train(docs, n_merges=8)
    trained = {r["word"]: list(r["syms"]) for r in vocab.collect()}

    single_words = spark.createDataFrame(
        [(w,) for w in trained], "text string"
    )
    encoded = {
        r["text"]: list(r["enc"])
        for r in single_words.select(
            "text", bpe_encode("text", rules).alias("enc")
        ).collect()
    }
    assert encoded == trained


def test_encode_is_plan_clean(spark):
    from cloud_optimized_data_pipelines_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(1, "lower newest")], "doc_id long, text string")
    out = df.select(bpe_encode("text", [("e", "r"), ("n", "e")]).alias("enc"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
