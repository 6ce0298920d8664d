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
