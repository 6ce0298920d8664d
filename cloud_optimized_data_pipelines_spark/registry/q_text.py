"""text-analysis family: language id, quality, fingerprints, token stats

Split out of the single-file registry in round 11 (VERDICT r10 task
9); registration order is preserved by the import order in
``cloud_optimized_data_pipelines_spark.queries`` and pinned by
``tests/test_registry_order.py``.  Code is unchanged — only moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cloud_optimized_data_pipelines_spark.functions.dates import extract_dates  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.functions.ids import item_id  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import text as T  # noqa: F401
from cloud_optimized_data_pipelines_spark.functions import vectors as V  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import dedup as D  # noqa: F401
from cloud_optimized_data_pipelines_spark.operators import similarity as S  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.operators.transfer import plan_transfer  # noqa: F401,E501
from cloud_optimized_data_pipelines_spark.sources import cmr as cmr_src  # noqa: F401
from cloud_optimized_data_pipelines_spark.sources import inventory as inv_src  # noqa: F401,E501

from cloud_optimized_data_pipelines_spark.queries import (  # noqa: F401
    load_tables,
    query,
)
from cloud_optimized_data_pipelines_spark.registry.q_dedup import (  # noqa: F401,E501
    _DUCK_SHINGLES,
)
from cloud_optimized_data_pipelines_spark.registry.q_similarity import (  # noqa: F401,E501
    _DUCK_LTOKS,
    _LANG_CASE,
    _duck_lang_count,
)

_LANG_ID = f"""
WITH t1 AS (SELECT doc_id, lang, {_DUCK_LTOKS} AS ltoks FROM documents),
t2 AS (
  SELECT doc_id, lang,
         {", ".join(f"{_duck_lang_count(lang)} AS c_{lang}" for lang in T.LANG_ORDER)}
  FROM t1
),
t3 AS (
  SELECT doc_id, lang, c_en, c_es, c_de, c_fr,
         greatest(c_en, c_es, c_de, c_fr) AS best
  FROM t2
)
SELECT doc_id, lang, {_LANG_CASE} AS pred,
       (lang = {_LANG_CASE}) AS agree
FROM t3
"""


@query("text_lang_id", _LANG_ID)
def lang_id_q(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    pred = T.detect_language(F.col("text"))
    return t["documents"].select(
        "doc_id", "lang", pred.alias("pred"), (F.col("lang") == pred).alias("agree")
    )


_TEXT_QUALITY = """
WITH t1 AS (
  SELECT doc_id, text,
    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(length(text) AS DOUBLE) AS n_chars_d,
    CAST(len(list_filter(list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), t -> lower(t)),
         t -> list_contains(['the','and','of','to','in','is','that','it','for','was'], t))) AS DOUBLE) AS sw_hits
  FROM documents
),
t2 AS (
  SELECT doc_id, n_tokens, bpe_tokens,
    CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_tokens > 0 THEN sw_hits / n_tokens ELSE 0.0 END AS stopword_ratio
  FROM t1
)
SELECT doc_id, n_tokens, bpe_tokens,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round((least(n_tokens / 20.0, 1.0)
              + (1.0 - least(punct_ratio * 4.0, 1.0))
              + least(stopword_ratio * 4.0, 1.0)) / 3.0, 6) AS quality
FROM t2
"""


@query("text_quality", _TEXT_QUALITY)
def text_quality_q(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        T.bpe_token_count("text").cast("long").alias("bpe_tokens"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
    )


_FINGERPRINT = f"""
WITH {_DUCK_SHINGLES.format(src="documents")}
SELECT doc_id, list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
FROM sh
"""


@query("text_fingerprint", _FINGERPRINT)
def fingerprint_q(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id", T.doc_fingerprint("text", 3).alias("fingerprint")
    )


_DOC_TOP_TOKENS = """
WITH tok AS (
  SELECT doc_id,
         UNNEST(list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                t -> lower(t))) AS token
  FROM documents
),
cnt AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY doc_id, token
),
rk AS (
  SELECT doc_id, token, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, token) AS rn
  FROM cnt
)
SELECT doc_id, token, n, CAST(rn AS BIGINT) AS rn FROM rk WHERE rn <= 3
"""


@query("text_doc_top_tokens", _DOC_TOP_TOKENS)
def doc_top_tokens_q(spark, sf_dir):
    """Per-doc top-3 tokens (keyword extraction baseline): explode →
    partial-agg count → per-key window rank.  The window partitions by
    doc_id, so rank state never crosses documents — embarrassingly
    parallel at any corpus size."""
    t = load_tables(spark, sf_dir)
    toks = F.explode(
        F.transform(T.tokens(F.col("text")), lambda x: F.lower(x))
    ).alias("token")
    cnt = (
        t["documents"]
        .select("doc_id", toks)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), "token")
    return (
        cnt.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "n", "rn")
    )


_TOKEN_TOP20 = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT UNNEST(list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                t -> lower(t))) AS token
  FROM documents
) t
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


@query("text_token_top20", _TOKEN_TOP20)
def token_top20_q(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    toks = F.explode(
        F.transform(T.tokens(F.col("text")), lambda x: F.lower(x))
    ).alias("token")
    return (
        t["documents"]
        .select(toks)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )




# ---------------------------------------------------------------------------
# WARC -> WET charset correctness (r12 — VERDICT r11 "Next round #6")
# ---------------------------------------------------------------------------


def _warc_charsets_oracle() -> str:
    """Oracle for text_warc_charsets: expected decoded texts derive
    from the CHARSET_CASES design table using python's codecs DIRECTLY
    (the reference binding — NOT through decode_http_body, so the
    engine's charset resolution is what the hash actually checks);
    per-variant pins become CASE literals."""
    import hashlib

    from cloud_optimized_data_pipelines_spark.sources.warc import (
        charset_case,
    )

    rows = []
    for v in range(8):
        n_resp = 3 + v % 3
        texts, charsets = [], []
        for i in range(n_resp):
            _ctype, _body, resolved, expected = charset_case(v, i)
            texts.append(expected)
            charsets.append(resolved)
        rows.append(
            {
                "v": v,
                "n_records": n_resp,
                "charsets": ",".join(sorted(charsets)),
                "char_sum": sum(len(t) for t in texts),
                "bodies_md5": hashlib.md5(
                    "\x1f".join(texts).encode("utf-8")
                ).hexdigest(),
            }
        )

    def case(col, quote=True):
        return (
            "CASE d.doc_id % 8 "
            + " ".join(
                f"WHEN {r['v']} THEN "
                + (f"'{r[col]}'" if quote else str(r[col]))
                for r in rows
            )
            + " END"
        )

    return f"""
SELECT d.doc_id,
       d.doc_id % 8 AS variant,
       CAST({case('n_records', quote=False)} AS BIGINT) AS n_records,
       {case('charsets')} AS charsets,
       CAST({case('char_sum', quote=False)} AS BIGINT) AS char_sum,
       {case('bodies_md5')} AS bodies_md5
FROM documents d
"""


@query("text_warc_charsets", _warc_charsets_oracle)
def text_warc_charsets_q(spark, sf_dir):
    """REAL-bytes WARC->WET charset probe: per variant a .warc.gz of
    HTTP responses whose bodies rotate through 8 charset cases
    (declared UTF-8 / ISO-8859-1 / windows-1251 / Shift_JIS / quoted
    EUC-JP, plus the three fallbacks: undeclared non-UTF-8 ->
    latin-1, unknown label -> UTF-8, plain ASCII) builds on
    executors; warc_records explodes it, http_text_bodies decodes
    each body via the Content-Type charset chain, and the graded md5
    is over the ORDERED decoded texts — real Common Crawl is ~30%
    non-UTF-8, so this is the correctness gate for the WET step
    feeding every downstream text operator.  Scan shape: pure map,
    payload bytes never shuffle."""
    from cloud_optimized_data_pipelines_spark.sources.warc import (
        http_text_bodies,
        warc_charset_probe_table,
        warc_records,
    )

    t = load_tables(spark, sf_dir)
    probe = warc_charset_probe_table(spark, 8)
    recs = warc_records(probe, "file_id", "blob")
    bodies = http_text_bodies(
        recs.filter(F.col("warc_type") == "response")
    )
    agg = bodies.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.array_join(
            F.array_sort(F.collect_list("charset")), ","
        ).alias("charsets"),
        F.sum(F.length("body")).cast("bigint").alias("char_sum"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("record_index", "body")
                        )
                    ),
                    lambda x: x.body,
                ),
                "\x1f",
            )
        ).alias("bodies_md5"),
    ).withColumnRenamed("file_id", "variant")
    docs = t["documents"].select(
        "doc_id", (F.col("doc_id") % 8).alias("variant")
    )
    return docs.join(F.broadcast(agg), "variant").select(
        "doc_id", "variant", "n_records", "charsets", "char_sum",
        "bodies_md5",
    )
