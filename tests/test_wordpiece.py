"""WordPiece semantics — golden cases against the public BERT
WordpieceTokenizer behavior (greedy longest match, whole-word [UNK]
fallback, max-chars guard), plus the distributed stats stage."""

import pytest

from cloud_optimized_data_pipelines_spark.operators.wordpiece import (
    UNK,
    piece_hash32,
    wordpiece_stats,
    wordpiece_vocab_from_corpus,
    wordpiece_word,
)


def _tables(vocab):
    raw = {p: p for p in vocab if not p.startswith("##")}
    cont = {p[2:]: p for p in vocab if p.startswith("##")}
    return raw, cont


def test_wordpiece_word_golden_cases():
    vocab = [
        "a", "an", "and", "b", "##a", "##n", "##d", "##b",
        "the", "##re",
    ]
    raw, cont = _tables(vocab)
    # maximal munch: 'and' wins over 'an' and 'a'
    assert wordpiece_word("and", raw, cont) == ["and"]
    # longest PREFIX then continuations: 'anb' -> an + ##b
    assert wordpiece_word("anb", raw, cont) == ["an", "##b"]
    # continuation multi-char piece: 'there' -> the + ##re
    assert wordpiece_word("there", raw, cont) == ["the", "##re"]
    # greedy is NOT optimal: 'anda' -> and + ##a
    assert wordpiece_word("anda", raw, cont) == ["and", "##a"]
    # dead end -> whole word UNK ('x' has no piece anywhere)
    assert wordpiece_word("ax", raw, cont) == [UNK]
    assert wordpiece_word("xa", raw, cont) == [UNK]
    # max-chars guard
    assert wordpiece_word("a" * 33, raw, cont) == [UNK]
    assert wordpiece_word("a" * 32, raw, cont) == ["a"] + ["##a"] * 31


def test_wordpiece_hash_is_portable():
    # md5[:8] — the engine-wide portable_hash32 construction
    import hashlib

    assert piece_hash32("##re") == int(
        hashlib.md5(b"##re").hexdigest()[:8], 16
    )


def test_wordpiece_stats_stage(spark):
    df = spark.createDataFrame(
        [
            (1, "and anb THERE"),
            (2, "zzz"),          # no piece -> 1 word, 1 unk
            (3, ""),             # no words at all
            (4, None),           # null text
        ],
        "doc_id long, text string",
    )
    vocab = [
        "a", "an", "and", "b", "##a", "##n", "##d", "##b",
        "the", "##re",
    ]
    out = {r["doc_id"]: r for r in
           wordpiece_stats(df, "doc_id", "text", vocab).collect()}
    r1 = out[1]
    # and -> 1 piece; anb -> 2; there -> 2 (lowercased)
    assert (r1.n_words, r1.n_pieces, r1.n_unk, r1.max_word_pieces) == (
        3, 5, 0, 2,
    )
    assert r1.piece_hash_sum == sum(
        piece_hash32(p) for p in ("and", "an", "##b", "the", "##re")
    )
    assert (out[2].n_words, out[2].n_pieces, out[2].n_unk) == (1, 1, 1)
    assert out[2].piece_hash_sum == piece_hash32(UNK)
    for d in (3, 4):
        assert (out[d].n_words, out[d].n_pieces,
                out[d].max_word_pieces) == (0, 0, 0)


def test_wordpiece_vocab_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "bb aa aa cc cc"), (2, "aa dd")],
        "doc_id long, text string",
    )
    v = wordpiece_vocab_from_corpus(df, "text", top_k=2, base_chars="ab")
    # counts: aa=3, cc=2, bb=1, dd=1 -> top2 = [aa, cc]
    assert v == ["a", "b", "##a", "##b", "aa", "cc"]
