"""WordPiece subword tokenization (the BERT wordpiece algorithm:
Devlin et al. 2018; the greedy longest-match-first procedure of
Google's public ``BertTokenizer.WordpieceTokenizer``) as a distributed
operator — the token-counting half of a training-data pipeline needs a
REAL subword tokenizer, not a whitespace proxy: token budgets, packing
lengths and per-document cost estimates are all denominated in
subword pieces.

Algorithm (exactly the public reference semantics):

- a WORD encodes to pieces by maximal munch: at each position take the
  LONGEST vocabulary entry matching the remaining prefix — entries at
  position 0 match verbatim, entries past it only via their ``##``
  continuation form;
- if NO entry matches at some position, the WHOLE word becomes one
  ``[UNK]`` piece (wordpiece never mixes matched pieces with failure);
- words longer than ``max_word_chars`` are ``[UNK]`` outright (BERT's
  ``max_input_chars_per_word`` guard).

Engine shape: the vocabulary is metadata-sized (it rides the closure
to an Arrow ``mapInPandas`` stage; a per-batch word->pieces memo makes
the per-token cost amortize to a dict hit — corpus vocabulary is tiny
next to its token count).  Everything is exact integer/string work, so
a DuckDB oracle replays the SAME greedy walk as a recursive CTE over
(word, position) states joined against the best (longest) match per
state — engine and oracle hash-match on piece counts AND on a per-doc
sum of 32-bit piece hashes, which pins piece IDENTITY, not just
arithmetic.

No reference counterpart (extension surface; the reference pipeline
has no tokenizer).  Cites: BERT repo tokenization.py (public, Apache
2.0 — semantics only, no code), Devlin et al. 2018.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"[a-z]+")

UNK = "[UNK]"
UNK_HASH32 = 3051026889  # == piece_hash32(UNK); pinned for SQL oracles


def wordpiece_vocab_from_corpus(
    df: DataFrame,
    text_col: str,
    top_k: int = 30,
    base_chars: str = "abcdefghijklmno",
) -> list[str]:
    """Deterministic corpus-derived vocabulary: every single character
    of ``base_chars`` in raw and ``##`` continuation form, plus the
    ``top_k`` most frequent whole words (count desc, word asc — exact
    integer counts, so the tie-break is total and cross-engine
    stable).  Words touching a character OUTSIDE ``base_chars`` and
    not matched whole thus exercise the ``[UNK]`` path.

    Driver traffic: ``top_k`` rows (the BPE-merge-loop bound)."""
    top = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(int(top_k))
        .collect()
    )
    vocab = list(base_chars)
    vocab += ["##" + c for c in base_chars]
    vocab += [r["w"] for r in top]
    return vocab


def piece_hash32(piece: str) -> int:
    """md5[:8] hash — identical to the engine-wide ``portable_hash32``
    (== DuckDB ``('0x' || substr(md5(p), 1, 8))::BIGINT``)."""
    return int(hashlib.md5(piece.encode()).hexdigest()[:8], 16)


def wordpiece_word(
    word: str, raw: dict, cont: dict, max_word_chars: int = 32
) -> list[str]:
    """Encode ONE word; ``raw``/``cont`` map piece text -> piece (the
    cont keys are WITHOUT the ## prefix, values carry it)."""
    if len(word) > max_word_chars:
        return [UNK]
    pieces: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        table = raw if pos == 0 else cont
        end = n
        piece = None
        while end > pos:
            cand = word[pos:end]
            hit = table.get(cand)
            if hit is not None:
                piece = hit
                break
            end -= 1
        if piece is None:
            return [UNK]
        pieces.append(piece)
        pos = end
    return pieces


def wordpiece_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    max_word_chars: int = 32,
) -> DataFrame:
    """Per-document wordpiece statistics: ``n_words``, ``n_pieces``,
    ``n_unk`` (whole-word failures), ``max_word_pieces`` (the longest
    single word's piece count) and ``piece_hash_sum`` (int64 sum of
    the 32-bit md5 hash of every emitted piece, ``##`` prefix
    included — pins piece identity).  Words are
    ``regexp_extract_all(lower(text), '[a-z]+')`` — ASCII by
    construction, so Python/JVM/DuckDB tokenize identically.

    One Arrow pass; the vocabulary dict and a word->result memo live
    per batch (executor-local, metadata-sized)."""
    import pandas as pd

    raw = {p: p for p in vocab if not p.startswith("##")}
    cont = {p[2:]: p for p in vocab if p.startswith("##")}
    unk_h = piece_hash32(UNK)
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, n_words long,"
        " n_pieces long, n_unk long, max_word_pieces long,"
        " piece_hash_sum long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            out = {k: [] for k in (
                "id", "n_words", "n_pieces", "n_unk", "max_word_pieces",
                "piece_hash_sum",
            )}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = _WORD_RE.findall((text or "").lower())
                n_pieces = n_unk = max_wp = 0
                hsum = 0
                for w in words:
                    res = memo.get(w)
                    if res is None:
                        pieces = wordpiece_word(
                            w, raw, cont, max_word_chars
                        )
                        res = (
                            len(pieces),
                            1 if pieces == [UNK] else 0,
                            unk_h
                            if pieces == [UNK]
                            else sum(piece_hash32(p) for p in pieces),
                        )
                        memo[w] = res
                    n_pieces += res[0]
                    n_unk += res[1]
                    hsum += res[2]
                    if res[0] > max_wp:
                        max_wp = res[0]
                out["id"].append(did)
                out["n_words"].append(len(words))
                out["n_pieces"].append(n_pieces)
                out["n_unk"].append(n_unk)
                out["max_word_pieces"].append(max_wp)
                out["piece_hash_sum"].append(hsum)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "n_words": out["n_words"],
                    "n_pieces": out["n_pieces"],
                    "n_unk": out["n_unk"],
                    "max_word_pieces": out["max_word_pieces"],
                    "piece_hash_sum": out["piece_hash_sum"],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
