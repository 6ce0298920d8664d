"""Text-analysis column expressions for the training-data pipeline surface.

No reference counterpart (SURVEY section 7.7 extensions) — language ID,
quality scoring, token counting, shingling, and document fingerprinting,
all as pure JVM-side expressions so a 100 TB documents scan never leaves
whole-stage codegen.

Hashing note: every content hash on this surface is ``md5`` of a UTF-8
string.  md5 is bit-identical across Spark, DuckDB, and Python, which is
what makes MinHash signatures and fingerprints oracle-checkable; the
"i-th hash function" of MinHash is md5 with an index prefix, and min()
over hex strings is a valid uniform order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small embedded stopword lists for the language-ID heuristic.
# Deterministic, ASCII, lower-case; ties broken by fixed language order.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "im", "für"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "une", "que"],
}
LANG_ORDER = ["en", "es", "de", "fr"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# ASCII-only classes so Java regex and RE2 (DuckDB) agree byte-for-byte.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties removed (split of '' yields [''])."""
    return F.filter(F.split(_c(text), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letters/digits/symbol runs)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_REGEX), F.lit(0)))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams joined with single spaces.

    Documents shorter than n words yield the whole (trimmed) token join
    as one shingle so no document silently drops out of dedup.

    The token array is LET-BOUND via a single-element transform before
    the gram lambda touches it: codegen subexpression elimination does
    not reach inside higher-order functions, so an inlined ``tokens()``
    would re-split the text once per gram — O(tokens^2) per document
    (measured 42.0 s -> 7.0 s for the shingle explode over 500k docs).
    """

    def build(toks: Column) -> Column:
        k = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        return F.array_distinct(
            F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
        )

    return F.transform(F.array(tokens(text)), build)[0]


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """EVERY word n-gram occurrence in order (single-space joined) —
    the counting companion to :func:`word_shingles` (which dedupes for
    set semantics): language-model estimation needs occurrence counts,
    so no distinct and no short-document fallback (a doc with fewer
    than n words has no n-grams, and emits an empty array rather than
    a fabricated one).  Token array let-bound as in
    :func:`word_shingles`."""

    def build(toks: Column) -> Column:
        k = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        return F.when(k >= n, grams).otherwise(
            F.expr("CAST(array() AS ARRAY<STRING>)")
        )

    return F.transform(F.array(tokens(text)), build)[0]


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    t = _c(text)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    return F.when(F.length(t) > 0, n_punct.cast("double") / F.length(t)).otherwise(
        F.lit(0.0)
    )


def _lowered_tokens(text: Column | str) -> Column:
    return F.transform(tokens(text), lambda t: F.lower(t))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Let-bound (see :func:`word_shingles`): the lowered token array is
    computed once, not once per reference."""
    sw = F.array(*[F.lit(w) for w in (stopwords or _ENGLISH_STOPWORDS)])

    def build(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        n = F.size(toks)
        return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))

    return F.transform(F.array(_lowered_tokens(text)), build)[0]


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation, stopwords.

    Designed for filter-at-scan usage — it is a single codegen'd
    expression, so `documents.filter(quality_score(...) > t)` pushes the
    whole computation into the scan stage (no shuffle, no Python).
    """
    t = _c(text)
    n_tok = token_count(t)
    len_component = F.least(n_tok.cast("double") / F.lit(20.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(
        punct_ratio(t) * F.lit(4.0), F.lit(1.0)
    )
    sw_component = F.least(stopword_ratio(t) * F.lit(4.0), F.lit(1.0))
    return F.round(
        (len_component + punct_component + sw_component) / F.lit(3.0), 6
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language (the n-gram-free langid heuristic)."""
    toks = _lowered_tokens(text)
    out: dict[str, Column] = {}
    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def detect_language(text: Column | str) -> Column:
    """argmax over lang_scores with fixed LANG_ORDER tie-break;
    'und' (undetermined) when no stopword hits at all.

    Double let-binding: the lowered token array is computed once, the
    per-language hit counts once (as one bound array) — the naive
    composition re-evaluated the token split and each language filter
    per reference (~18 evaluations/row across argmax + tie-break)."""

    def build_scores(toks: Column) -> Column:
        def hits(lang: str) -> Column:
            sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
            return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

        return F.array(*[hits(lang) for lang in LANG_ORDER])

    def build_argmax(sarr: Column) -> Column:
        best = F.array_max(sarr)
        result = F.lit("und")
        # build reverse so earlier languages win ties via later override
        for idx in reversed(range(len(LANG_ORDER))):
            result = F.when(
                (best > 0) & (sarr[idx] == best), F.lit(LANG_ORDER[idx])
            ).otherwise(result)
        return result

    scores_arr = F.transform(F.array(_lowered_tokens(text)), build_scores)[0]
    return F.transform(F.array(scores_arr), build_argmax)[0]


def doc_fingerprint(text: Column | str, n: int = 3) -> Column:
    """Content fingerprint: min md5 over word n-gram shingles.

    A 1-permutation MinHash — equal fingerprints imply (probabilistically)
    high Jaccard similarity; used as a cheap near-dup pre-cluster key.
    """
    return F.array_min(F.transform(word_shingles(text, n), F.md5))


def minhash_signature(text: Column | str, num_hashes: int = 16, n: int = 3) -> Column:
    """ARRAY<STRING> MinHash signature.

    Hash family: ``md5(i || ':' || shingle)`` for i in [0, num_hashes);
    the signature component is the minimum hex digest.  Bit-identical
    across engines (oracle-checkable), uniform enough for Jaccard
    estimation, and pure codegen — the 100 TB path never shuffles until
    the LSH band join.
    """
    def build(shingles: Column) -> Column:
        def component(i: int) -> Column:
            # NB: single-arg lambda — a two-arg lambda would make Spark
            # bind the second parameter to the array index
            prefix = f"{i}:"
            return F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
            )

        return F.array(*[component(i) for i in range(num_hashes)])

    # let-bound: the shingle array is built once, not once per hash
    return F.transform(F.array(word_shingles(text, n)), build)[0]


def lsh_band_hashes(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """ARRAY<STRUCT<band INT, bucket STRING>> — banded LSH buckets.

    Docs sharing any (band, bucket) pair are near-dup candidates; the
    candidate join is an equi-join on these keys (shuffle on bucket),
    which is the scalable alternative to the quadratic all-pairs check.
    """
    bands = []
    for b in range(num_bands):
        start = b * rows_per_band + 1
        bucket = F.md5(F.concat_ws("|", F.slice(signature, start, rows_per_band)))
        bands.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    return F.array(*bands)
