"""dedup extras: incremental, fuzzy-prefix with guards, substring/line dedup, bloom-gated streaming

Split out of q_survey_misc.py in round 14 (VERDICT r13 task 5); registration order is preserved by the import order in
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
from cloud_optimized_data_pipelines_spark.registry.q_similarity import (  # noqa: F401,E501
    _DUCK_LTOKS,
    _LANG_CASE,
    _duck_lang_count,
)

_INCR_DEDUP = """
WITH corpus AS (
  SELECT md5(text) AS d FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1
), batch AS (
  SELECT doc_id, lang, md5(text) AS d FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 100000, lang, md5(text) FROM documents WHERE doc_id % 8 = 1
  UNION ALL
  SELECT doc_id + 200000, lang, md5(text) FROM documents WHERE doc_id % 16 = 4
), fresh AS (
  SELECT b.doc_id, b.lang, b.d FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.d = b.d)
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY d ORDER BY doc_id) AS rn
  FROM fresh
) t WHERE rn = 1
"""


@query("dedup_incremental", _INCR_DEDUP)
def dedup_incremental_q(spark, sf_dir):
    """Continual-ingest dedup (operators/dedup.py::incremental_dedup):
    a new batch is anti-joined against the distinct digest set of the
    historical corpus, then first-per-digest within the batch.  History
    is never re-deduped; only digests shuffle.

    The fixture is scale-proportional (modular split, nonzero at every
    sf) and exercises all three paths: re-ingested history dups
    (doc_id%8==1, shifted ids — dropped by the anti-join), in-batch
    dups (doc_id%16==4 shifted — dropped by first-per-digest), and
    genuinely new docs (doc_id%4==0 — survive)."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        incremental_dedup,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang", "text")
        .unionAll(
            docs.filter(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "lang", "text"
            )
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 16 == 4).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "lang", "text"
            )
        )
    )
    return incremental_dedup(batch, corpus, "text", "doc_id").select(
        "doc_id", "lang"
    )


_FUZZY_PAIRS = """
WITH pref AS (
  SELECT doc_id, substr(text, 1, 40) AS p FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN length(p) >= 3
         THEN list_distinct(list_transform(range(1, length(p) - 1),
                            i -> substr(p, i, 3)))
         ELSE [p] END AS shingles
  FROM pref
),
idx0 AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
freq AS (SELECT shingle FROM idx0 GROUP BY shingle HAVING COUNT(*) <= 1000),
idx AS (SELECT idx0.* FROM idx0 JOIN freq USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc < b.doc
)
SELECT doc_a, doc_b,
       CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS distance
FROM cand
JOIN pref pa ON pa.doc_id = doc_a
JOIN pref pb ON pb.doc_id = doc_b
WHERE levenshtein(pa.p, pb.p) <= 10
"""


@query("dedup_fuzzy_prefix", _FUZZY_PAIRS)
def dedup_fuzzy_prefix_q(spark, sf_dir):
    """Bounded edit-distance join (operators/dedup.py::fuzzy_pairs):
    doc pairs whose 40-char prefixes are within levenshtein 10 —
    character-3-gram blocking (COMPLETE for these bounds: 40 - 3 + 1 -
    10*3 = 8 shared grams guaranteed, Gravano et al.) then exact
    engine-native levenshtein verification on candidates only.
    Integer distances are bit-identical across engines."""
    t = load_tables(spark, sf_dir)
    return D.fuzzy_pairs(
        t["documents"], "doc_id", "text", max_distance=10, prefix_len=40, q=3
    )


_FUZZY_GUARD_REPORT = """
WITH pref AS (
  SELECT doc_id, substr(text, 1, 40) AS p FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN length(p) >= 3
         THEN list_distinct(list_transform(range(1, length(p) - 1),
                            i -> substr(p, i, 3)))
         ELSE [p] END AS shingles
  FROM pref
),
idx AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
f AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS freq FROM idx GROUP BY shingle),
per_doc AS (
  SELECT i.doc, CAST(COUNT(*) AS BIGINT) AS grams,
         CAST(SUM(CASE WHEN f.freq > 50 THEN 1 ELSE 0 END) AS BIGINT) AS pruned
  FROM idx i JOIN f USING (shingle) GROUP BY i.doc
)
SELECT CAST(SUM(grams) AS BIGINT) AS total_grams,
       CAST(SUM(pruned) AS BIGINT) AS pruned_grams,
       CAST(SUM(pruned) AS DOUBLE) / CAST(SUM(grams) AS DOUBLE) AS pruned_frac,
       CAST(COUNT(*) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN pruned = grams THEN 1 ELSE 0 END) AS BIGINT) AS docs_zero_grams
FROM per_doc
"""


@query("dedup_fuzzy_guard_report", _FUZZY_GUARD_REPORT)
def dedup_fuzzy_guard_report_q(spark, sf_dir):
    """The guard's alarm channel as a checkable one-row report
    (operators/dedup.py::guard_prune_stats over fuzzy_prefix_index):
    how many q-gram postings a freq-50 guard would drop and how many
    docs lose EVERY gram.  Threshold 50 is deliberately below the
    corpus's common-gram frequencies so the report is exercised, not
    vacuous — a pipeline alarms when pruned_frac nears 1.0 instead of
    reading an empty fuzzy join as clean."""
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        fuzzy_prefix_index,
        guard_prune_stats,
    )

    t = load_tables(spark, sf_dir)
    idx = fuzzy_prefix_index(t["documents"], "doc_id", "text", 40, 3)
    return guard_prune_stats(idx, 50)


# shared CTE chain: guarded positional-shingle span detection (n=8,
# max_shingle_freq=1000) — interpolated into BOTH the spans and the
# cut oracles so the definitions cannot drift apart
_SUBSTR_CTES = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
),
idx0 AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(tk, i, i + 7), ' ') AS shingle
  FROM toks, UNNEST(range(1, len(tk) - 6)) AS t(i)
),
freq AS (SELECT shingle FROM idx0 GROUP BY shingle HAVING COUNT(*) <= 1000),
idx AS (SELECT idx0.* FROM idx0 JOIN freq USING (shingle)),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
runs AS (
  SELECT *, pos_a - ROW_NUMBER() OVER (
      PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
  FROM m
),
spans AS (
  SELECT doc_a, doc_b,
         MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
         CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diag, grp
)
"""

_SUBSTR_SPANS = f"""
WITH {_SUBSTR_CTES.strip()}
SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans
"""


@query("dedup_substring_spans", _SUBSTR_SPANS)
def dedup_substring_spans_q(spark, sf_dir):
    """ExactSubstr span dedup (operators/dedup.py::duplicate_spans):
    maximal cross-document duplicated word-8-gram runs with positions —
    the cut-the-span operator (Lee et al. 2021), detected with the
    diagonal-run trick (one window + one aggregate, no sequential
    scan).  The shingle self-join runs with the default skew guard
    (max_shingle_freq=1000) and the oracle applies the identical
    HAVING COUNT(*) <= 1000 pruning."""
    t = load_tables(spark, sf_dir)
    return D.duplicate_spans(t["documents"], "doc_id", "text", n=8)


_SUBSTR_CUT = f"""
WITH {_SUBSTR_CTES.strip()},
ivs AS (
  SELECT doc_b AS doc,
         list(struct_pack(s := start_b, e := start_b + span_tokens)) AS ivs
  FROM spans GROUP BY doc_b
),
sel AS (
  SELECT t.doc_id, t.tk, COALESCE(v.ivs, []) AS ivs
  FROM toks t LEFT JOIN ivs v ON v.doc = t.doc_id
),
cutx AS (
  SELECT doc_id, tk,
         list_filter(tk, (x, i) ->
           len(list_filter(ivs, iv -> i >= iv.s AND i < iv.e)) = 0) AS kept
  FROM sel
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens_before,
       CAST(len(kept) AS BIGINT) AS n_tokens_after,
       COALESCE(array_to_string(kept, ' '), '') AS text_dedup
FROM cutx
"""


@query("dedup_substring_cut", _SUBSTR_CUT)
def dedup_substring_cut_q(spark, sf_dir):
    """The CUT step of ExactSubstr dedup (operators/dedup.py::
    cut_duplicate_spans over duplicate_spans): every duplicated
    word-8-gram run is excised from the higher-id document of its pair;
    first occurrences survive.  The oracle rebuilds the cut text
    independently (index-aware list_filter over the same guarded span
    table), so the hash covers the full detect→cut pipeline including
    the rebuilt text bytes."""
    t = load_tables(spark, sf_dir)
    spans = D.duplicate_spans(t["documents"], "doc_id", "text", n=8)
    out = D.cut_duplicate_spans(t["documents"], "doc_id", "text", spans)
    return out.select(
        "doc_id", "n_tokens_before", "n_tokens_after", "text_dedup"
    )


_LINE_DEDUP = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS pos, array_to_string(t[(i*10+1):(i*10+10)], ' ') AS line
  FROM toks, UNNEST(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)
  WHERE len(t) > 0
),
over_freq AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) > 1
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line, (o.line IS NOT NULL) AS rm
  FROM lines l LEFT JOIN over_freq o USING (line)
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT rm), '')
           AS text_dedup
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_lines, 0) AS n_lines,
       COALESCE(p.n_removed, 0) AS n_removed,
       md5(COALESCE(p.text_dedup, '')) AS kept_md5
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@query("dedup_lines", _LINE_DEDUP)
def dedup_lines_q(spark, sf_dir):
    """Corpus-frequency line dedup (operators/dedup.py::line_dedup —
    the RefinedWeb/Dolma boilerplate-removal recipe): any 10-token
    "line" occurring in more than one distinct document is excised
    everywhere; kept lines are re-joined in position order and the md5
    covers the rebuilt bytes.  One global line-frequency table decides
    every removal — no doc-pair reasoning, which is what makes this the
    cheapest cross-document dedup at corpus scale."""
    t = load_tables(spark, sf_dir)
    out = D.line_dedup(
        t["documents"], "doc_id", "text", max_doc_freq=1, line_tokens=10
    )
    return out.select(
        "doc_id", "n_lines", "n_removed", F.md5("text_dedup").alias("kept_md5")
    )


_BLOOM_GATED = """
WITH inc AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS digest FROM documents
  WHERE doc_id % 2 = 1 OR doc_id % 4 = 0
),
hist AS (
  SELECT DISTINCT md5(COALESCE(text, '')) AS digest FROM documents
  WHERE doc_id % 2 = 0
),
surv AS (
  SELECT digest, CAST(MIN(doc_id) AS BIGINT) AS doc_id
  FROM inc GROUP BY digest
)
SELECT doc_id, digest FROM surv
WHERE digest NOT IN (SELECT digest FROM hist)
"""


@query("dedup_bloom_gated", _BLOOM_GATED)
def dedup_bloom_gated_q(spark, sf_dir):
    """Bloom-gated incremental exact dedup, batch form (the plan
    ``streaming/dedup_stream.py::process_dedup_batch`` runs per
    micro-batch, reference parity: the SQS-driven re-crawl loop in
    `/root/reference/lambdas/cmr-query/handler.py` re-discovers already
    -ingested granules every run): history = even doc_ids' digests,
    incoming = odd doc_ids plus every multiple of 4 (so half the
    incoming rows ARE duplicates and must be rejected).  The filter —
    auto-sized from the history count (~1% FPR, power-of-two m) — is
    probed first; digests it has definitely never seen (no false
    negatives) skip the history anti-join entirely, so at crawl scale
    the common all-new batch never touches the big digest table.  The
    oracle is the PLAIN anti-join: the gate is a pure pre-filter, so
    any divergence is a correctness bug, not tolerance."""
    from cloud_optimized_data_pipelines_spark.operators.sketches import (
        bloom_contains,
        bloom_partial,
    )
    from cloud_optimized_data_pipelines_spark.streaming.dedup_stream import (
        _auto_bloom_size,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    digest = F.md5(F.coalesce(F.col("text"), F.lit("")))
    hist = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(digest.alias("digest"))
        .distinct()
    )
    m, k = _auto_bloom_size(hist.count())
    incoming = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0)
    ).select("doc_id", digest.alias("digest"))
    surv = incoming.groupBy("digest").agg(
        F.min("doc_id").cast("long").alias("doc_id")
    )
    bloom = bloom_partial(hist, "digest", m_bits=m, k_hashes=k)
    flagged = bloom_contains(bloom, surv, "digest", m_bits=m, k_hashes=k)
    # r14 (guide §2.4): one left-anti join with the gate folded into
    # the join condition, instead of union(fresh, checked) — the union
    # form referenced `flagged` twice, planning the whole probe chain
    # (explode, broadcast join, groupBy, join-back) in two branches.
    # A maybe_present=false row can never match the compound
    # condition, so it survives without a history comparison — the
    # identical row set, with the probe chain planned once.
    h = hist.select(F.col("digest").alias("_hist_digest"))
    return flagged.join(
        h,
        (flagged["digest"] == h["_hist_digest"]) & F.col("maybe_present"),
        "left_anti",
    ).select("doc_id", "digest")
