"""Property-based tests (hypothesis) for the signature scalars.

The reference ships only 13 golden cases for ``extract_dates``
(lambdas/build-stac/tests/test_regex.py:8-136) and none for the path
scalars' edge space.  Here we fuzz the engine's column expressions
against pure-Python models implementing the reference algorithm
(lambdas/build-stac/utils/regex.py:30-83, pathlib.Path.stem) verbatim.

Each hypothesis example generates a BATCH of rows so one Spark job
amortizes over ~40 cases; examples are capped to keep the suite fast.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates
from cloud_optimized_data_pipelines_spark.functions.ids import path_stem

# --- pure-Python model of regex.py:30-83 -----------------------------------

_STRATS = [
    (r"_(\d{4}-\d{2}-\d{2})", "%Y-%m-%d"),
    (r"_(\d{8})", "%Y%m%d"),
    (r"_(\d{6})", "%Y%m"),
    (r"_(\d{4})", "%Y"),
]


def _model_extract(fname: str, rng: str | None):
    dates: list[datetime] = []
    for rgx, fmt in _STRATS:
        matches = re.findall(rgx, fname)
        if matches:
            dates = [datetime.strptime(m, fmt) for m in matches]
            break
    if not dates:
        return ("error", None, None, None)
    dates.sort()
    if len(dates) > 1:
        return (None, dates[0], dates[-1], None)
    d = dates[0]
    if rng == "month":
        last = calendar.monthrange(d.year, d.month)[1]
        return (None, d.replace(day=1), d.replace(day=last), None)
    if rng == "year":
        return (None, d.replace(month=1, day=1), d.replace(month=12, day=31), None)
    return (None, None, None, d)


# --- generators -------------------------------------------------------------

_dates = st.dates(min_value=datetime(1000, 1, 1).date(), max_value=datetime(2999, 12, 31).date())


@st.composite
def _date_token(draw):
    d = draw(_dates)
    kind = draw(st.sampled_from(["iso", "d8", "d6", "d4"]))
    if kind == "iso":
        return f"_{d:%Y-%m-%d}"
    if kind == "d8":
        return f"_{d:%Y%m%d}"
    if kind == "d6":
        return f"_{d:%Y%m}"
    return f"_{d.year:04d}"


_sep = st.text(alphabet="abcXYZ", min_size=0, max_size=6)


@st.composite
def _filename_case(draw):
    toks = draw(st.lists(_date_token(), min_size=0, max_size=3))
    seps = [draw(_sep) for _ in range(len(toks) + 1)]
    name = seps[0]
    for t, s in zip(toks, seps[1:]):
        name += t + s
    rng = draw(st.sampled_from([None, "month", "year", "bogus"]))
    return (f"s3://bkt/{name}.tif", rng)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_filename_case(), min_size=1, max_size=40))
def test_extract_dates_matches_reference_model(spark, cases):
    df = spark.createDataFrame(cases, "fname string, rng string")
    rows = df.select(
        "fname", "rng", extract_dates("fname", F.col("rng")).alias("d")
    ).collect()
    assert len(rows) == len(cases)
    for r in rows:
        err, start, end, single = _model_extract(r.fname, r.rng)
        got = r.d
        if err:
            assert got.error is not None, r.fname
            assert got.start_datetime is None and got.single_datetime is None
        else:
            assert got.error is None, (r.fname, got.error)
            assert got.start_datetime == start, (r.fname, r.rng)
            assert got.end_datetime == end, (r.fname, r.rng)
            assert got.single_datetime == single, (r.fname, r.rng)


# --- Path.stem semantics ----------------------------------------------------

_name_chars = st.text(alphabet="abcXYZ019._-", min_size=1, max_size=20)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_name_chars, min_size=1, max_size=40))
def test_path_stem_matches_pathlib(spark, names):
    from pathlib import PurePosixPath

    # filter out names that are pure dots ('.', '..') — never valid keys
    names = [n for n in names if n.strip(".")] or ["x.tif"]
    paths = [f"s3://b/pre/fix/{n}" for n in names]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = [r.s for r in df.select(path_stem("p").alias("s")).collect()]
    want = [PurePosixPath(p).stem for p in paths]
    assert got == want


# --- per-row item_id regex semantics ----------------------------------------

_ID_PATTERNS = [
    None,
    r"([A-Z]+)_(\d+)",
    r"(\d{4})",
    r"(?:pre)_([a-z]+)",
    r"([a-z]+)-([a-z]+)-([a-z]+)",
    r"\((\d+)\)",
    r"([a-z]+)(\d+)?",
    r"(\d+)\.(\d+)\.(\d+)\.(\d+)",
]


def _model_item_id(path: str, rgx: str | None) -> str:
    import re as _re
    from pathlib import PurePosixPath

    if rgx is None:
        return PurePosixPath(path).stem
    n = min(4, _re.compile(rgx).groups)
    m = _re.search(rgx, path)
    parts = []
    for i in range(1, n + 1):
        v = m.group(i) if m else None
        if v:
            parts.append(v)
    return "-".join(parts)


_fname_text = st.text(alphabet="abcABC019_-().", min_size=1, max_size=24)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(
        st.tuples(_fname_text, st.sampled_from(_ID_PATTERNS)),
        min_size=1,
        max_size=40,
    )
)
def test_item_id_per_row_matches_re_model(spark, cases):
    from cloud_optimized_data_pipelines_spark.functions.ids import item_id_per_row

    rows = [(f"s3://b/{name}.tif", rgx) for name, rgx in cases
            if name.strip(".")]  # skip all-dot basenames (never valid keys)
    if not rows:
        rows = [("s3://b/x.tif", None)]
    df = spark.createDataFrame(rows, "p string, rgx string")
    got = [
        r.i
        for r in df.select(item_id_per_row("p", F.col("rgx")).alias("i")).collect()
    ]
    want = [_model_item_id(p, rgx) for p, rgx in rows]
    assert got == want


# --- URL parse semantics ----------------------------------------------------

_host = st.text(alphabet="abXY01-.", min_size=1, max_size=12).filter(
    lambda h: not h.startswith((".", "-"))
    and not h.endswith((".", "-"))
    and ".." not in h
)
_seg = st.text(alphabet="abcXYZ019_-.", min_size=1, max_size=10).filter(
    lambda s: s.strip(".")
)


@st.composite
def _url_case(draw):
    scheme = draw(st.sampled_from(["s3", "https", "http"]))
    host = draw(_host)
    segs = draw(st.lists(_seg, min_size=1, max_size=4))
    return f"{scheme}://{host}/" + "/".join(segs)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_url_case(), min_size=1, max_size=40))
def test_url_parse_matches_urllib(spark, urls):
    from urllib.parse import urlparse

    from cloud_optimized_data_pipelines_spark.functions.urls import (
        url_bucket,
        url_key,
    )

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u", url_bucket("u").alias("b"), url_key("u").alias("k")
    ).collect()
    for r in rows:
        p = urlparse(r.u)
        assert r.b == p.hostname, r.u
        assert r.k == p.path[1:], r.u


def test_stratified_sample_is_nested_and_rate_accurate(spark, sf_dir):
    """Raising a stratum's rate must only ADD rows (threshold-on-hash
    nesting), and realized rates should track requested ones."""
    import pyspark.sql.functions as F

    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        sample_stratified,
    )
    from cloud_optimized_data_pipelines_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    small = sample_stratified(docs, "doc_id", "lang", {"en": 0.3})
    big = sample_stratified(docs, "doc_id", "lang", {"en": 0.6})
    ids_small = {r["doc_id"] for r in small.select("doc_id").collect()}
    ids_big = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert ids_small <= ids_big

    n_en = docs.filter(F.col("lang") == "en").count()
    n_en_small = small.filter(F.col("lang") == "en").count()
    # binomial-ish tolerance on a small fixture; exact determinism is
    # covered by the DuckDB oracle for sample_stratified_docs
    assert abs(n_en_small / n_en - 0.3) < 0.15
    # non-en strata untouched at default rate 1.0
    assert (
        small.filter(F.col("lang") != "en").count()
        == docs.filter(F.col("lang") != "en").count()
    )


# --- round-4 operators vs pure-python models --------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "spark", "table"])
_doc_text = st.lists(_word, min_size=0, max_size=30).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_doc_text, min_size=1, max_size=12))
def test_ngram_repetition_matches_model(spark, texts):
    """top/dup n-gram character fractions equal a direct Counter-based
    model, incl. the (cnt, gram) tie-break."""
    import collections

    from cloud_optimized_data_pipelines_spark.operators.quality import (
        ngram_repetition,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_repetition(df, "doc_id", "text").collect()}
    for i, text in enumerate(texts):
        toks = text.split()

        def fracs(n):
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            if not grams or not text:
                return 0.0, 0.0
            c = collections.Counter(grams)
            top = max(c.items(), key=lambda kv: (kv[1], kv[0]))
            topf = top[1] * len(top[0]) / len(text)
            dupf = sum(v * len(g) for g, v in c.items() if v > 1) / len(text)
            return topf, dupf

        t2, _ = fracs(2)
        t3, _ = fracs(3)
        _, d5 = fracs(5)
        assert rows[i].top2_char_frac == pytest.approx(t2, abs=1e-12)
        assert rows[i].top3_char_frac == pytest.approx(t3, abs=1e-12)
        assert rows[i].dup5_char_frac == pytest.approx(d5, abs=1e-12)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_doc_text.filter(lambda t: t.strip()), min_size=2, max_size=12))
def test_bm25_matches_model(spark, texts):
    """BM25 scores equal the textbook formula computed in python with
    the same rounding discipline."""
    import math

    from cloud_optimized_data_pipelines_spark.operators.ranking import (
        bm25_scores,
    )

    terms = ["spark", "table"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {
        r.doc_id: r for r in bm25_scores(df, "doc_id", "text", terms).collect()
    }
    docs = [t.split() for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    dfreq = {
        t: sum(1 for d in docs if t in d) for t in terms
    }
    for i, d in enumerate(docs):
        expected = 0.0
        hits = 0
        for t in sorted(set(terms)):
            tf = d.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = round(math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0), 9)
            expected += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
        if hits == 0:
            assert i not in rows
        else:
            assert rows[i].n_hits == hits
            assert rows[i].score == pytest.approx(expected, rel=1e-12)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_doc_text, min_size=1, max_size=10))
def test_cut_duplicate_spans_invariants(spark, texts):
    """Cut output is always a subsequence of the input tokens, never
    longer, and byte-equal to the original re-join when no spans
    exist."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spans = duplicate_spans(df, "doc_id", "text", n=4)
    rows = {
        r.doc_id: r
        for r in cut_duplicate_spans(df, "doc_id", "text", spans).collect()
    }
    span_docs = {r.doc_b for r in spans.collect()}
    for i, text in enumerate(texts):
        toks = text.split()
        r = rows[i]
        assert r.n_tokens_before == len(toks)
        assert r.n_tokens_after <= r.n_tokens_before
        kept = r.text_dedup.split() if r.text_dedup else []
        assert len(kept) == r.n_tokens_after
        # subsequence check
        it = iter(toks)
        assert all(any(k == t for t in it) for k in kept)
        if i not in span_docs:
            assert r.text_dedup == " ".join(toks)


def test_doremi_weights_properties(spark):
    """KL >= 0 per domain (Gibbs), weights form a smoothed softmax
    (sum ~1, each >= smoothing/k), and the domain farthest from the
    corpus mixture gets the largest weight."""
    import math

    from pyspark.sql import Row

    from cloud_optimized_data_pipelines_spark.operators.sampling import (
        doremi_weights,
    )

    rows = []
    # two near-identical domains + one wildly different vocabulary
    for i in range(40):
        rows.append(Row(doc_id=i, text="the cat sat on the mat", dom="a"))
    for i in range(40, 80):
        rows.append(Row(doc_id=i, text="the cat sat on the rug", dom="b"))
    for i in range(80, 120):
        rows.append(
            Row(doc_id=i, text="zx qv jkl wpt mnb vcx", dom="weird")
        )
    df = spark.createDataFrame(rows)
    got = {
        r.domain: r
        for r in doremi_weights(
            df, "doc_id", "text", "dom", smoothing=0.01
        ).collect()
    }
    assert set(got) == {"a", "b", "weird"}
    for r in got.values():
        assert r.kl_excess >= 0.0
        assert r.weight >= 0.01 / 3 - 1e-9
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-6
    assert got["weird"].kl_excess > got["a"].kl_excess
    assert got["weird"].weight == max(r.weight for r in got.values())
    # same token counts per domain
    assert got["a"].n_tokens == 240 and got["weird"].n_tokens == 240
    # eta tilts harder: higher eta -> more mass on the outlier
    hot = {
        r.domain: r.weight
        for r in doremi_weights(
            df, "doc_id", "text", "dom", eta=5.0, smoothing=0.01
        ).collect()
    }
    assert hot["weird"] > got["weird"].weight


def test_unigram_viterbi_properties(spark):
    """Segmentation pieces reconstruct the text, best_cost is the
    true DP optimum (<= any manual split, == brute force on short
    strings), and hard-EM keeps the dominant piece."""
    import itertools
    import math

    from pyspark.sql import Row

    from cloud_optimized_data_pipelines_spark.operators.unigram_lm import (
        build_vocab,
        candidate_pieces,
        hard_em_train,
        viterbi_segment,
    )

    texts = ["abcabcabc", "abcxyzabc", "xyzxyzxyz", "abcabcxyz"] * 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    vocab = build_vocab(
        candidate_pieces(df, "doc_id", "text", 3), min_count=5
    )
    costs = {p: c for p, _, c in vocab}
    assert all(len(p) == 1 or cnt >= 5 for p, cnt, _ in vocab)
    assert "abc" in costs  # frequent trigram survives the threshold

    segs = viterbi_segment(df, "doc_id", "text", vocab, 3).collect()
    for r in segs:
        t = texts[r.doc_id]
        assert r.prefix_len == len(t)
        assert "".join(r.pieces.split("|")) == t
        assert r.n_pieces == len(r.pieces.split("|"))
        # exhaustive check: enumerate every split of the 9-char text
        def all_splits(s):
            if not s:
                yield []
                return
            for l in range(1, min(3, len(s)) + 1):
                if s[:l] in costs:
                    for rest in all_splits(s[l:]):
                        yield [s[:l]] + rest
        brute = min(
            sum(costs[p] for p in sp) for sp in all_splits(t)
        )
        assert math.isclose(r.best_cost, brute, rel_tol=0, abs_tol=1e-12)

    trained = hard_em_train(
        df, "doc_id", "text", max_len=3, min_count=5, iters=2
    )
    tp = {p: (c, cost) for p, c, cost in trained}
    assert "abc" in tp  # the dominant piece survives EM pruning
    # every char still present (segmentability invariant)
    for ch in "abcxyz":
        assert ch in tp
    # EM is deterministic
    again = hard_em_train(
        df, "doc_id", "text", max_len=3, min_count=5, iters=2
    )
    assert trained == again


def test_ks_statistic_properties(spark):
    """Integer-exact KS: hand-checkable D on a tiny sample, identical
    samples give 0, disjoint supports give 1, and the binned variant
    equals exact when every value gets its own bin."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.operators.drift import (
        ks_statistic,
        ks_statistic_binned,
    )

    # A = {1,2,3}, B = {2,3,4}: D = 1/3 at x=1 (and x=3)
    df = spark.createDataFrame(
        [Row(v=float(x), a=True) for x in (1, 2, 3)]
        + [Row(v=float(x), a=False) for x in (2, 3, 4)]
    )
    r = ks_statistic(df, "v", "a").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.d_num == 3 and r.d_den == 9
    assert abs(r.ks_d - 1 / 3) < 1e-15

    same = spark.createDataFrame(
        [Row(v=float(x % 7), a=x % 2 == 0) for x in range(100)]
    )
    # x%2 alternates over the same x%7 values -> nearly identical
    # empirical distributions; with 100 evenly split they are EQUAL
    # within each value class up to the odd remainder
    r2 = ks_statistic(same, "v", "a").collect()[0]
    assert r2.ks_d <= 0.05

    disjoint = spark.createDataFrame(
        [Row(v=float(x), a=True) for x in range(5)]
        + [Row(v=float(x + 100), a=False) for x in range(5)]
    )
    r3 = ks_statistic(disjoint, "v", "a").collect()[0]
    assert r3.ks_d == 1.0

    # grouped: per-group results match per-group exact runs
    g = spark.createDataFrame(
        [Row(grp="x", v=float(x), a=x < 50) for x in range(100)]
        + [Row(grp="y", v=float(x % 10), a=x % 2 == 0) for x in range(100)]
    )
    by_group = {
        r.grp: r for r in ks_statistic(g, "v", "a", "grp").collect()
    }
    for key in ("x", "y"):
        solo = ks_statistic(
            g.filter(F.col("grp") == key), "v", "a"
        ).collect()[0]
        assert (by_group[key].d_num, by_group[key].d_den) == (
            solo.d_num, solo.d_den,
        )

    # binned == exact when bins resolve every distinct value
    rb = ks_statistic_binned(df, "v", "a", bins=1024).collect()[0]
    assert (rb.d_num, rb.d_den) == (r.d_num, r.d_den)


def test_label_propagation_planted_communities(spark):
    """Two planted cliques joined by one weak bridge resolve into two
    communities; the result is deterministic across runs."""
    from pyspark.sql import Row

    from cloud_optimized_data_pipelines_spark.operators.graph import (
        label_propagation,
    )

    def clique(names):
        return [
            (a, b) for a in names for b in names if a != b
        ]

    edges_l = clique(["a1", "a2", "a3", "a4"]) + clique(
        ["b1", "b2", "b3", "b4"]
    ) + [("a1", "b1"), ("b1", "a1")]
    edges = spark.createDataFrame(edges_l, "src string, dst string")
    lab = {r.node: r.label for r in label_propagation(edges, 4).collect()}
    a = {lab[n] for n in ("a1", "a2", "a3", "a4")}
    b = {lab[n] for n in ("b1", "b2", "b3", "b4")}
    assert len(a) == 1 and len(b) == 1 and a != b
    lab2 = {r.node: r.label for r in label_propagation(edges, 4).collect()}
    assert lab == lab2
