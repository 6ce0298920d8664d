"""similarity family: brute force / ANN / IVF / PQ / SemDeDup / decontamination

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
    _ANN_TOPK,
    _DUCK_DOT,
    _DUCK_SQDIST,
)

_QUANTIZED_TOPK = f"""
WITH q8 AS (
  SELECT vec_id,
         list_reduce(list_transform(embedding, v -> abs(v::DOUBLE)),
                     (a, b) -> greatest(a, b)) / 127 AS scale,
         embedding
  FROM embeddings
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0
              THEN list_transform(embedding, v -> 0.0)
              ELSE list_transform(
                     list_transform(embedding,
                                    v -> CAST(round(v::DOUBLE / scale, 0)
                                              AS INTEGER)),
                     c -> c::DOUBLE * scale)
         END AS dv
  FROM q8
),
q AS (SELECT dv AS qv FROM deq WHERE vec_id = 0)
SELECT vec_id,
       round({_DUCK_DOT.format(a="d.dv", b="q.qv")}
             / (sqrt({_DUCK_DOT.format(a="d.dv", b="d.dv")})
                * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})), 6) AS cos
FROM deq d CROSS JOIN q
ORDER BY {_DUCK_DOT.format(a="d.dv", b="q.qv")}
         / (sqrt({_DUCK_DOT.format(a="d.dv", b="d.dv")})
            * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})) DESC, vec_id
LIMIT 10
"""


@query("similarity_quantized_topk", _QUANTIZED_TOPK)
def quantized_topk_q(spark, sf_dir):
    """Brute-force top-10 over INT8-QUANTIZED embeddings (operators/
    similarity.py::quantize_embeddings_int8 — symmetric per-vector
    scalar quantization, the standard 4x storage cut for embedding
    tables at corpus scale): quantize, dequantize, cosine top-k
    against the dequantized vec_id=0 query.  Pure column expressions
    both sides; the oracle replays the exact round(v/scale) -> c*scale
    arithmetic, so any quantizer drift breaks the hash.  Recall vs the
    float path is pytest-gated."""
    from cloud_optimized_data_pipelines_spark.operators.similarity import (
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    t = load_tables(spark, sf_dir)
    deq = dequantize_embeddings_int8(
        quantize_embeddings_int8(t["embeddings"])
    ).select("vec_id", F.col("embedding_deq").alias("dv"))
    q = (
        deq.filter(F.col("vec_id") == 0)
        .select(F.col("dv").alias("qv"))
        .alias("q")
    )
    d = deq.alias("d")
    cos = V.cosine_similarity(F.col("d.dv"), F.col("q.qv"))
    return (
        d.crossJoin(F.broadcast(q))
        .select(F.col("d.vec_id").alias("vec_id"), cos.alias("_c"))
        .orderBy(F.desc("_c"), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round(F.col("_c"), 6).alias("cos"))
    )


_TRUNCATED_RERANK = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pre AS (
  SELECT e.vec_id, e.embedding,
         round({_DUCK_DOT.format(a="e.embedding[1:16]", b="q.qv[1:16]")}
               / (sqrt({_DUCK_DOT.format(a="e.embedding[1:16]",
                                         b="e.embedding[1:16]")})
                  * sqrt({_DUCK_DOT.format(a="q.qv[1:16]", b="q.qv[1:16]")})),
               6) AS cos_prefix,
         q.qv
  FROM embeddings e CROSS JOIN q
),
coarse AS (
  SELECT * FROM pre ORDER BY cos_prefix DESC, vec_id LIMIT 50
),
exact AS (
  SELECT vec_id, cos_prefix,
         round({_DUCK_DOT.format(a="embedding", b="qv")}
               / (sqrt({_DUCK_DOT.format(a="embedding", b="embedding")})
                  * sqrt({_DUCK_DOT.format(a="qv", b="qv")})), 6) AS cos
  FROM coarse
)
SELECT vec_id, cos_prefix, cos,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
      FROM exact)
WHERE rank <= 10
"""


@query("similarity_truncated_rerank", _TRUNCATED_RERANK)
def truncated_rerank_q(spark, sf_dir):
    """Two-stage Matryoshka-style retrieval (operators/similarity.py::
    truncated_rerank_topk): a coarse pass scores only the FIRST 16 of
    64 dimensions (at scale: a pruned d/4-wide column scan +
    TakeOrderedAndProject, never a global sort), keeps 50 candidates,
    then reranks just those with the exact full-dimension cosine —
    the standard cheap-filter/exact-rerank serving shape.  Oracle
    replays both stages; recall vs single-stage brute force is
    pytest-gated."""
    from cloud_optimized_data_pipelines_spark.operators.similarity import (
        truncated_rerank_topk,
    )

    t = load_tables(spark, sf_dir)
    qvec = [
        float(x)
        for x in t["embeddings"]
        .filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]
    return truncated_rerank_topk(
        t["embeddings"], "embedding", qvec, k=10, prefix_dims=16,
        candidates=50,
    )


@query("similarity_bruteforce_topk", _ANN_TOPK)
def ann_topk_q(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 vector, via a crossJoin
    with the (broadcast) query row — no driver collect."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].alias("e")
    q = (
        t["embeddings"]
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
        .alias("q")
    )
    cos = V.cosine_similarity(F.col("e.embedding"), F.col("q.qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .select(F.col("e.vec_id").alias("vec_id"), cos.alias("_cos_exact"))
        .orderBy(F.desc("_cos_exact"), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round(F.col("_cos_exact"), 6).alias("cos"))
    )


_DUCK_BUCKET = "concat(" + ", ".join(
    f"CASE WHEN {{v}}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(4)
) + ")"

_ANN_BUCKET_TOPK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_DUCK_BUCKET.format(v="embedding")} AS bucket
  FROM embeddings
),
q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
SELECT vec_id,
       round({_DUCK_DOT.format(a="b.embedding", b="q.qv")}
             / (sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})
                * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})), 6) AS cos
FROM b JOIN q ON b.bucket = q.qb
ORDER BY {_DUCK_DOT.format(a="b.embedding", b="q.qv")}
         / (sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})
            * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})) DESC, vec_id
LIMIT 10
"""


@query("similarity_ann_topk", _ANN_BUCKET_TOPK)
def ann_bucket_topk_q(spark, sf_dir):
    """Sign-bucket ANN top-10 (the IVF/LSH scale path): only the query's
    bucket (~1/2^4 of the corpus) is scored."""
    t = load_tables(spark, sf_dir)
    return S.ann_topk_by_id(
        t["embeddings"], "embedding", 0, k=10, num_dims=4
    )


_ANN_MULTIPROBE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_DUCK_BUCKET.format(v="embedding")} AS bucket
  FROM embeddings
),
q0 AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
probes AS (
  SELECT qv, qb AS pb FROM q0
  UNION ALL
  SELECT qv,
         substr(qb, 1, i)
         || (CASE WHEN substr(qb, i + 1, 1) = '1' THEN '0' ELSE '1' END)
         || substr(qb, i + 2) AS pb
  FROM q0, UNNEST([0, 1, 2, 3]) AS t(i)
)
SELECT vec_id,
       round({_DUCK_DOT.format(a="b.embedding", b="p.qv")}
             / (sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})
                * sqrt({_DUCK_DOT.format(a="p.qv", b="p.qv")})), 6) AS cos
FROM b JOIN probes p ON b.bucket = p.pb
ORDER BY {_DUCK_DOT.format(a="b.embedding", b="p.qv")}
         / (sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})
            * sqrt({_DUCK_DOT.format(a="p.qv", b="p.qv")})) DESC, vec_id
LIMIT 10
"""


@query("similarity_ann_multiprobe", _ANN_MULTIPROBE)
def ann_multiprobe_q(spark, sf_dir):
    """MULTIPROBE sign-bucket ANN top-10 (operators/similarity.py::
    ann_topk_multiprobe, the Lv et al. multi-probe LSH recall lever):
    the query's bucket plus its 4 Hamming-1 neighbors are scored —
    5/16 of the corpus instead of 1/16, recovering neighbors that
    differ in a single sign bit (the dominant ann_topk miss mode;
    recall-vs-exact pytest-gated).  Deterministic probe set, so the
    oracle reproduces the result bit-exactly."""
    t = load_tables(spark, sf_dir)
    return S.ann_topk_multiprobe(
        t["embeddings"], "embedding", 0, k=10, num_dims=4
    )


_IVF_PROBE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_DUCK_DOT.format(a="e.embedding", b="c.cvec")}
           / (sqrt({_DUCK_DOT.format(a="e.embedding", b="e.embedding")})
              * sqrt({_DUCK_DOT.format(a="c.cvec", b="c.cvec")})) AS cos_c
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
    FROM scored
  ) t WHERE rn = 1
),
probe AS (
  SELECT cid FROM cents CROSS JOIN q
  ORDER BY {_DUCK_DOT.format(a="cvec", b="qv")}
           / (sqrt({_DUCK_DOT.format(a="cvec", b="cvec")})
              * sqrt({_DUCK_DOT.format(a="qv", b="qv")})) DESC, cid
  LIMIT 4
)
SELECT a.vec_id,
       round({_DUCK_DOT.format(a="a.embedding", b="q.qv")}
             / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
                * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})), 6) AS cos
FROM assigned a JOIN probe USING (cid) CROSS JOIN q
ORDER BY {_DUCK_DOT.format(a="a.embedding", b="q.qv")}
         / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
            * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})) DESC, a.vec_id
LIMIT 10
"""


@query("similarity_ivf_probe", _IVF_PROBE)
def ivf_probe_q(spark, sf_dir):
    """IVF probe with FIXED spherical centroids (operators/similarity.py
    ::ivf_probe_fixed): assignment + nprobe=4/16 pruned scoring, fully
    oracle-checkable because nothing depends on reduction order — the
    cross-engine proof of the IVF pruning semantics that the learned-
    centroid ivf_topk (rows-only) can't give."""
    t = load_tables(spark, sf_dir)
    return S.ivf_probe_fixed(
        t["embeddings"], "embedding", 0, k=10, k_lists=16, nprobe=4
    )


# Learned-centroid IVF, unrolled: the whole pipeline is deterministic
# once the per-dimension Lloyd means are rounded (seeds = 16 smallest
# md5(id), one assignment + mean step, probe = 4 nearest learned
# centroids to the query, exact cosine over the probed lists), so the
# single iteration unrolls into CTEs the same way BPE merges and
# PageRank did.  Mirrors operators/similarity.py::ivf_build/ivf_topk
# stage for stage: argmin ties break to the lowest centroid id
# (array_position-of-min <=> ROW_NUMBER ORDER BY d, cid), empty lists
# keep their seed vector, means round to 6 digits (reduction-order
# independence across engines), final ordering is the ROUNDED cosine
# then vec_id exactly as brute_force_topk emits it.
_IVF_TOPK_LEARNED = f"""
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         list_transform(embedding, x -> x::DOUBLE) AS cvec
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16
),
a0 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="e.embedding", b="s.cvec")}, s.cid
           ) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) t WHERE rn = 1
),
upd AS (
  SELECT cid, list(m ORDER BY i) AS cvec FROM (
    SELECT cid, i, round(AVG(v::DOUBLE), 6) AS m FROM (
      SELECT a.cid, generate_subscripts(a.embedding, 1) AS i,
             unnest(a.embedding) AS v
      FROM a0 a
    ) x GROUP BY cid, i
  ) g GROUP BY cid
),
cents AS (
  SELECT s.cid, COALESCE(u.cvec, s.cvec) AS cvec
  FROM seeds s LEFT JOIN upd u USING (cid)
),
a1 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="e.embedding", b="c.cvec")}, c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) t WHERE rn = 1
),
q AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
  FROM embeddings WHERE vec_id = 0
),
probe AS (
  SELECT cid FROM cents CROSS JOIN q
  ORDER BY {_DUCK_SQDIST.format(a="cvec", b="qv")}, cid
  LIMIT 4
)
SELECT a.vec_id,
       round({_DUCK_DOT.format(a="a.embedding", b="q.qv")}
             / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
                * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})), 6) AS cos
FROM a1 a JOIN probe USING (cid) CROSS JOIN q
ORDER BY cos DESC, a.vec_id
LIMIT 10
"""


@query("similarity_ivf_topk", _IVF_TOPK_LEARNED)
def ivf_topk_q(spark, sf_dir):
    """IVF ANN top-10 on LEARNED centroids (second scale path):
    deterministic k-means lists (seeds = smallest md5(id), one Lloyd
    step, means rounded to 6 digits so the learned index is
    reduction-order independent), nprobe=4 of 16 probed.  Oracle-
    checked as of r9 by unrolling the iteration into CTEs (it was
    rows-only while the centroids were raw float avgs); recall vs
    brute force and the nprobe==k_lists exactness degeneracy stay
    pytest-checked in tests/test_similarity.py."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # iters=1 keeps the registered entry cheap (each Lloyd step is a
    # driver collect); the 2-iter quality path is exercised in tests
    return S.ivf_topk(
        emb, "embedding", qv, k=10, k_lists=16, nprobe=4, iters=1,
        centroid_round=6,
    )


# Product quantization, unrolled: seeds' subvector slices seed every
# subspace, one Lloyd step per subspace in a single exploded groupBy
# (means rounded to 6 digits), encode = per-subspace argmin (ties to
# the lowest code), ADC = per-code query distances folded in subspace
# order.  Every stage mirrors operators/similarity.py::pq_train/
# pq_encode/pq_topk; the score fold and the engine's driver-computed
# distance table accumulate left-to-right over the same doubles, so
# the comparison is bit-exact.
_PQ_CTE = f"""
WITH params AS (SELECT unnest(range(0, 8)) AS s),
vecs AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
sub AS (
  SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM vecs CROSS JOIN params
),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS code,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16
),
seedsub AS (
  SELECT code, s, v[s*8+1 : s*8+8] AS cv FROM seeds CROSS JOIN params
),
a0 AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT x.vec_id, x.s, x.sv, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_DUCK_SQDIST.format(a="x.sv", b="c.cv")}, c.code
           ) AS rn
    FROM sub x JOIN seedsub c USING (s)
  ) t WHERE rn = 1
),
upd AS (
  SELECT s, code, list(m ORDER BY i) AS cv FROM (
    SELECT s, code, i, round(AVG(v), 6) AS m FROM (
      SELECT a.s, a.code, generate_subscripts(a.sv, 1) AS i,
             unnest(a.sv) AS v
      FROM a0 a
    ) z GROUP BY s, code, i
  ) g GROUP BY s, code
),
cb AS (
  SELECT ss.s, ss.code, COALESCE(u.cv, ss.cv) AS cv
  FROM seedsub ss LEFT JOIN upd u ON ss.s = u.s AND ss.code = u.code
),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_DUCK_SQDIST.format(a="x.sv", b="c.cv")}, c.code
           ) AS rn
    FROM sub x JOIN cb c USING (s)
  ) t WHERE rn = 1
),
qsub AS (
  SELECT s, sv AS qv FROM sub WHERE vec_id = 0
),
dtable AS (
  SELECT c.s, c.code,
         {_DUCK_SQDIST.format(a="q.qv", b="c.cv")} AS d
  FROM cb c JOIN qsub q USING (s)
),
scored AS (
  SELECT k.vec_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(t.d ORDER BY k.s)),
           (x, y) -> x + y
         ) AS raw
  FROM codes k JOIN dtable t ON k.s = t.s AND k.code = t.code
  GROUP BY k.vec_id
)"""

_PQ_TOPK = _PQ_CTE + """
SELECT vec_id, round(raw, 6) AS adc
FROM scored
ORDER BY round(raw, 6), vec_id
LIMIT 10
"""

# ADC shortlist (rounded score, then id — a total order, so the
# candidate set is deterministic) + exact squared-L2 re-rank of the
# shortlist only: pq_refine_topk's IVFADC+R shape
_PQ_REFINE = _PQ_CTE + f""",
short AS (
  SELECT vec_id FROM scored ORDER BY round(raw, 6), vec_id LIMIT 100
),
q0 AS (SELECT v AS qv FROM vecs WHERE vec_id = 0)
SELECT s.vec_id,
       round({_DUCK_SQDIST.format(a="v.v", b="q0.qv")}, 6) AS dist
FROM short s JOIN vecs v USING (vec_id) CROSS JOIN q0
ORDER BY round({_DUCK_SQDIST.format(a="v.v", b="q0.qv")}, 6), s.vec_id
LIMIT 10
"""


@query("similarity_pq_topk", _PQ_TOPK)
def pq_topk_q(spark, sf_dir):
    """Product-quantization ADC top-10 (operators/similarity.py::
    pq_train/pq_encode/pq_topk — Jégou et al. 2011): 8 subspaces x 16
    codes over the 64-dim embeddings, codebooks trained with one
    rounded Lloyd step (the same determinism recipe as the learned
    IVF), query-to-centroid distance table embedded as plan literals,
    per-row score = an 8-term lookup fold over the 8-byte code array —
    the compressed-domain scan that never touches raw vectors (32x
    narrower I/O at 100 TB).  Recall vs brute force is pytest-gated;
    the oracle unrolls train/encode/ADC into CTEs."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    books = S.pq_train(emb, "embedding", m_sub=8, k_codes=16, iters=1)
    return S.pq_topk(emb, "embedding", qv, books, k=10)


# IVFADC, fully unrolled: coarse IVF (k_lists=8, one rounded Lloyd
# step), residuals against the learned centroids, PQ codebooks trained
# on the residuals (16 codes x 8 subspaces, one rounded Lloyd step),
# per-probed-list ADC tables from the query's per-list residual, and
# an s-ordered fold for the final score — every stage mirrors
# operators/similarity.py::ivf_pq_topk (which composes ivf_build +
# pq_train + pq_encode), with the same rounding points.
_IVFPQ_TOPK = f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
params AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         v AS cvec
  FROM vecs
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8
),
a0 AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="e.v", b="s.cvec")}, s.cid
           ) AS rn
    FROM vecs e CROSS JOIN seeds s
  ) t WHERE rn = 1
),
upd AS (
  SELECT cid, list(m ORDER BY i) AS cvec FROM (
    SELECT cid, i, round(AVG(x), 6) AS m FROM (
      SELECT a.cid, generate_subscripts(a.v, 1) AS i, unnest(a.v) AS x
      FROM a0 a
    ) z GROUP BY cid, i
  ) g GROUP BY cid
),
cents AS (
  SELECT s.cid, COALESCE(u.cvec, s.cvec) AS cvec
  FROM seeds s LEFT JOIN upd u USING (cid)
),
a1 AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="e.v", b="c.cvec")}, c.cid
           ) AS rn
    FROM vecs e CROSS JOIN cents c
  ) t WHERE rn = 1
),
res AS (
  SELECT a.vec_id, a.cid,
         list_transform(list_zip(a.v, c.cvec), z -> z[1] - z[2]) AS rv
  FROM a1 a JOIN cents c USING (cid)
),
rsub AS (
  SELECT vec_id, cid, s, rv[s*8+1 : s*8+8] AS sv FROM res CROSS JOIN params
),
pqseeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS code,
         rv
  FROM res
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16
),
pqseedsub AS (
  SELECT code, s, rv[s*8+1 : s*8+8] AS cv FROM pqseeds CROSS JOIN params
),
pa0 AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT x.vec_id, x.s, x.sv, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_DUCK_SQDIST.format(a="x.sv", b="c.cv")}, c.code
           ) AS rn
    FROM rsub x JOIN pqseedsub c USING (s)
  ) t WHERE rn = 1
),
pupd AS (
  SELECT s, code, list(m ORDER BY i) AS cv FROM (
    SELECT s, code, i, round(AVG(x), 6) AS m FROM (
      SELECT a.s, a.code, generate_subscripts(a.sv, 1) AS i,
             unnest(a.sv) AS x
      FROM pa0 a
    ) z GROUP BY s, code, i
  ) g GROUP BY s, code
),
cb AS (
  SELECT ss.s, ss.code, COALESCE(u.cv, ss.cv) AS cv
  FROM pqseedsub ss LEFT JOIN pupd u ON ss.s = u.s AND ss.code = u.code
),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.cid, x.s, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_DUCK_SQDIST.format(a="x.sv", b="c.cv")}, c.code
           ) AS rn
    FROM rsub x JOIN cb c USING (s)
  ) t WHERE rn = 1
),
q AS (SELECT v FROM vecs WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cents CROSS JOIN q
  ORDER BY {_DUCK_SQDIST.format(a="cvec", b="v")}, cid
  LIMIT 4
),
qres AS (
  SELECT c.cid, list_transform(list_zip(q.v, c.cvec), z -> z[1] - z[2]) AS qr
  FROM cents c JOIN probe USING (cid) CROSS JOIN q
),
dtable AS (
  SELECT r.cid, b.s, b.code,
         {_DUCK_SQDIST.format(a="r.qr[b.s*8+1 : b.s*8+8]", b="b.cv")} AS d
  FROM qres r CROSS JOIN cb b
),
scored AS (
  SELECT a.vec_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(t.d ORDER BY k.s)),
           (x, y) -> x + y
         ) AS raw
  FROM a1 a
  JOIN probe p ON a.cid = p.cid
  JOIN codes k ON a.vec_id = k.vec_id
  JOIN dtable t ON t.cid = a.cid AND t.s = k.s AND t.code = k.code
  GROUP BY a.vec_id
)
SELECT vec_id, round(raw, 6) AS adc
FROM scored
ORDER BY round(raw, 6), vec_id
LIMIT 10
"""


@query("similarity_ivfpq_topk", _IVFPQ_TOPK)
def ivfpq_topk_q(spark, sf_dir):
    """IVFADC (operators/similarity.py::ivf_pq_topk — Jégou et al.
    2011 §IV, the billion-scale ANN layout): coarse IVF prunes to 4 of
    8 learned lists, PQ codebooks trained on RESIDUALS score the
    survivors in the compressed domain with per-list ADC tables (the
    query's residual differs per probed list — the precision lever
    flat PQ lacks; recall 0.3 vs 0.2 here, pytest-gated).  At 100 TB:
    codes partitioned by list_id, a query scans nprobe partitions of
    m-byte codes with plan-literal tables.  Both Lloyd steps use
    rounded means, so the whole composition unrolls into one oracle
    CTE chain."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return S.ivf_pq_topk(emb, "embedding", qv, k=10, k_lists=8, nprobe=4)


# Sign random projection: the md5-parity matrix is derived identically
# on both engines, every fold is the same ordered sequence of exact
# IEEE ops (x * ±1.0 is exact; scale 1/sqrt(16) = 0.25 is a power of
# two), so the comparison needs NO rounding.
_RANDOM_PROJ = """
SELECT vec_id, j AS dim_idx,
       0.25 * list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(0, 64), i ->
             embedding[i + 1]::DOUBLE *
             (CASE WHEN (('0x' || substr(md5(j::VARCHAR || ':' || i::VARCHAR),
                          1, 8))::BIGINT % 2) = 0
                   THEN 1.0 ELSE -1.0 END))),
         (x, y) -> x + y) AS val
FROM embeddings CROSS JOIN (SELECT unnest(range(0, 16)) AS j) dims
"""


@query("similarity_random_projection", _RANDOM_PROJ)
def random_projection_q(spark, sf_dir):
    """Sign random projection 64 -> 16 dims (operators/similarity.py::
    random_projection — Achlioptas 2003's database-friendly JL
    transform): the 4x dimension cut a 100 TB embedding table takes
    before indexing.  The +-1 matrix is md5 parity — never
    materialized, embedded as plan literals — so the transform is 16
    codegen'd folds per row: no UDF, no shuffle, no broadcast, and the
    oracle rederives the identical matrix (bit-exact, unrounded).
    Distance preservation is pytest-gated."""
    t = load_tables(spark, sf_dir)
    proj = S.random_projection(t["embeddings"], "embedding", out_dims=16)
    return proj.select(
        "vec_id", F.posexplode("projected").alias("dim_idx", "val")
    ).select("vec_id", F.col("dim_idx").cast("long").alias("dim_idx"), "val")


@query("similarity_pq_refine", _PQ_REFINE)
def pq_refine_q(spark, sf_dir):
    """ADC shortlist + exact re-rank (operators/similarity.py::
    pq_refine_topk — Jégou et al. 2011 §VI): the compressed-code scan
    picks 100 candidates, then ONLY those rows' raw vectors are read
    back for an exact squared-L2 top-10.  The production PQ shape at
    100 TB: full scan touches the 32x narrower code column, the raw
    read is a 100-row broadcast join; recovers the recall pure ADC
    loses (0.8 vs 0.2 recall@10 on this corpus, pytest-gated)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    books = S.pq_train(emb, "embedding", m_sub=8, k_codes=16, iters=1)
    return S.pq_refine_topk(emb, "embedding", qv, books, k=10, refine=100)


_NEAR_DUP = f"""
WITH b AS (
  SELECT vec_id AS id, embedding AS vec, {_DUCK_BUCKET.format(v="embedding")} AS bucket
  FROM embeddings
)
SELECT l.id AS id_a, r.id AS id_b,
       round({_DUCK_DOT.format(a="l.vec", b="r.vec")}
             / (sqrt({_DUCK_DOT.format(a="l.vec", b="l.vec")})
                * sqrt({_DUCK_DOT.format(a="r.vec", b="r.vec")})), 6) AS cos
FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
WHERE round({_DUCK_DOT.format(a="l.vec", b="r.vec")}
            / (sqrt({_DUCK_DOT.format(a="l.vec", b="l.vec")})
               * sqrt({_DUCK_DOT.format(a="r.vec", b="r.vec")})), 6) >= 0.2
"""


@query("similarity_embedding_near_dup", _NEAR_DUP)
def near_dup_q(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return S.embedding_near_dup_pairs(
        t["embeddings"], "embedding", "vec_id", threshold=0.2, num_dims=4
    )


_SEMANTIC_DEDUP = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_DUCK_DOT.format(a="e.embedding", b="c.cvec")}
           / (sqrt({_DUCK_DOT.format(a="e.embedding", b="e.embedding")})
              * sqrt({_DUCK_DOT.format(a="c.cvec", b="c.cvec")})) AS cos_c
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
    FROM scored
  ) t WHERE rn = 1
),
dups AS (
  SELECT DISTINCT r.vec_id
  FROM assigned l JOIN assigned r ON l.cid = r.cid AND l.vec_id < r.vec_id
  WHERE round({_DUCK_DOT.format(a="l.embedding", b="r.embedding")}
              / (sqrt({_DUCK_DOT.format(a="l.embedding", b="l.embedding")})
                 * sqrt({_DUCK_DOT.format(a="r.embedding", b="r.embedding")})), 6)
        >= 0.35
)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
       (d.vec_id IS NOT NULL) AS is_dup
FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""


@query("similarity_semantic_dedup", _SEMANTIC_DEDUP)
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup (operators/similarity.py::semantic_dedup): cluster the
    embedding space with the fixed spherical quantizer, flag
    within-cluster semantic duplicates (cosine >= tau to a lower-id
    cluster-mate) via a pair-free LEFT SEMI self-join.  The
    cluster-then-dedup composition is what makes embedding dedup
    tractable at corpus scale — pairwise work is confined to clusters
    whose size k_lists controls."""
    t = load_tables(spark, sf_dir)
    return S.semantic_dedup(
        t["embeddings"], "embedding", "vec_id", k_lists=16, threshold=0.35
    )


@query("similarity_semantic_dedup_fast", _SEMANTIC_DEDUP)
def semantic_dedup_fast_q(spark, sf_dir):
    """Vectorized SemDeDup (operators/similarity.py::
    semantic_dedup_fast): same flags as similarity_semantic_dedup —
    identical oracle — but both stages run as Arrow-batched numpy
    matmuls (mapInPandas assignment against the broadcast k x d
    centroid matrix, applyInPandas per-cid tiled Gram) instead of
    interpreted Catalyst array folds.  The declarative path measures
    ~0.7M candidate folds/s, which caps SemDeDup's k ~ sqrt(n) design
    point; this path runs the 2M x 64 / k=1414 probe in ~1 min where
    the fold path needs hours (SCALE.md round 8).  Property test pins
    fast == fold on the shipped data (tests/test_text_vectors.py)."""
    t = load_tables(spark, sf_dir)
    return S.semantic_dedup_fast(
        t["embeddings"], "embedding", "vec_id", k_lists=16, threshold=0.35
    )


_KNN_JOIN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
),
s AS (
  SELECT q.query_id, e.vec_id,
         round({_DUCK_DOT.format(a="e.embedding", b="q.qv")}
               / (sqrt({_DUCK_DOT.format(a="e.embedding", b="e.embedding")})
                  * sqrt({_DUCK_DOT.format(a="q.qv", b="q.qv")})), 6) AS cos
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC NULLS LAST, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cos, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


@query("similarity_knn_join", _KNN_JOIN)
def knn_join_q(spark, sf_dir):
    """Batch k-NN join (operators/similarity.py::knn_join): top-5
    corpus neighbors for EVERY row of an 8-query batch — retrieval
    augmentation / neighbor labeling over a whole query table.  The
    Spark side broadcasts the query batch and runs a TWO-PHASE top-k
    (per-partition ROW_NUMBER prune, then a final rank over the k x P
    survivors), which must exactly reproduce the oracle's naive
    cross-join ROW_NUMBER — the proof that the balanced two-phase
    shuffle loses nothing."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.knn_join(queries, emb, "embedding", k=5)


_EMB_DECON = f"""
WITH tst AS (
  SELECT embedding AS tv FROM embeddings WHERE vec_id < 50
),
trn AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
hits AS (
  SELECT t.vec_id, CAST(COUNT(*) AS BIGINT) AS n_close
  FROM trn t JOIN tst s
    ON round({_DUCK_DOT.format(a="t.embedding", b="s.tv")}
             / (sqrt({_DUCK_DOT.format(a="t.embedding", b="t.embedding")})
                * sqrt({_DUCK_DOT.format(a="s.tv", b="s.tv")})), 6) >= 0.35
  GROUP BY t.vec_id
)
SELECT t.vec_id, COALESCE(h.n_close, 0) AS n_close,
       COALESCE(h.n_close, 0) > 0 AS contaminated
FROM trn t LEFT JOIN hits h USING (vec_id)
"""


@query("similarity_embedding_decontaminate", _EMB_DECON)
def embedding_decontaminate_q(spark, sf_dir):
    """SEMANTIC decontamination (operators/decontaminate.py::
    embedding_contamination_flags): train rows within cosine 0.35 of
    any eval-set embedding are flagged — catches paraphrased eval
    leakage the 5-gram decontaminator can't see.  Eval side broadcast
    (metadata-sized next to a corpus), norms hoisted once per side,
    per-doc count aggregation is the only shuffle."""
    from cloud_optimized_data_pipelines_spark.operators.decontaminate import (
        embedding_contamination_flags,
    )

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    test = emb.filter(F.col("vec_id") < 50)
    train = emb.filter(F.col("vec_id") >= 50)
    return embedding_contamination_flags(
        train, test, "embedding", "vec_id", threshold=0.35
    ).select("vec_id", "n_close", "contaminated")


_EMB_DECON_BLOCKED = f"""
WITH tst AS (
  SELECT embedding AS tv, {_DUCK_BUCKET.format(v="embedding")} AS tb
  FROM embeddings WHERE vec_id < 50
),
trn AS (
  SELECT vec_id, embedding, {_DUCK_BUCKET.format(v="embedding")} AS b
  FROM embeddings WHERE vec_id >= 50
),
hits AS (
  SELECT t.vec_id, CAST(COUNT(*) AS BIGINT) AS n_close
  FROM trn t JOIN tst s
    ON t.b = s.tb
   AND round({_DUCK_DOT.format(a="t.embedding", b="s.tv")}
             / (sqrt({_DUCK_DOT.format(a="t.embedding", b="t.embedding")})
                * sqrt({_DUCK_DOT.format(a="s.tv", b="s.tv")})), 6) >= 0.35
  GROUP BY t.vec_id
)
SELECT t.vec_id, COALESCE(h.n_close, 0) AS n_close,
       COALESCE(h.n_close, 0) > 0 AS contaminated
FROM trn t LEFT JOIN hits h USING (vec_id)
"""


@query("similarity_decontaminate_blocked", _EMB_DECON_BLOCKED)
def embedding_decontaminate_blocked_q(spark, sf_dir):
    """ANN-blocked semantic decontamination (operators/decontaminate.py
    ::embedding_contamination_flags_blocked): the sign-bucket blocked
    composition of similarity_embedding_decontaminate — bucket equality
    is the join key, exact cosine runs only within buckets, cutting the
    10^9-train x 10^4-eval nested loop by ~2^num_dims.  Deterministic
    blocking, so the oracle reproduces the blocked result bit-exactly;
    recall vs the exact form is pytest-gated (the ann_topk pattern)."""
    from cloud_optimized_data_pipelines_spark.operators.decontaminate import (
        embedding_contamination_flags_blocked,
    )

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    test = emb.filter(F.col("vec_id") < 50)
    train = emb.filter(F.col("vec_id") >= 50)
    return embedding_contamination_flags_blocked(
        train, test, "embedding", "vec_id", threshold=0.35, num_dims=4
    ).select("vec_id", "n_close", "contaminated")


def _emb_decon_multiprobe_sql() -> str:
    """Oracle for similarity_decontaminate_multiprobe: the eval side's
    d+1 Hamming-1 probe buckets are generated with string flips and
    UNNESTed, then the same bucket equi-join + exact-cosine check as
    the blocked oracle.  The probe strings are pairwise distinct so no
    (train, eval) pair is double counted — n_close semantics match the
    single-bucket form exactly."""
    d = 4
    flips = ["tb"]
    for i in range(1, d + 1):
        flipped = (
            f"CASE WHEN substr(tb, {i}, 1) = '1' THEN '0' ELSE '1' END"
        )
        parts = []
        if i > 1:
            parts.append(f"substr(tb, 1, {i - 1})")
        parts.append(flipped)
        if i < d:
            parts.append(f"substr(tb, {i + 1}, {d - i})")
        flips.append("concat(" + ", ".join(parts) + ")")
    probe_list = "[" + ", ".join(flips) + "]"
    return f"""
WITH tst AS (
  SELECT embedding AS tv, {_DUCK_BUCKET.format(v="embedding")} AS tb
  FROM embeddings WHERE vec_id < 50
),
tstp AS (
  SELECT tv, UNNEST({probe_list}) AS pb FROM tst
),
trn AS (
  SELECT vec_id, embedding, {_DUCK_BUCKET.format(v="embedding")} AS b
  FROM embeddings WHERE vec_id >= 50
),
hits AS (
  SELECT t.vec_id, CAST(COUNT(*) AS BIGINT) AS n_close
  FROM trn t JOIN tstp s
    ON t.b = s.pb
   AND round({_DUCK_DOT.format(a="t.embedding", b="s.tv")}
             / (sqrt({_DUCK_DOT.format(a="t.embedding", b="t.embedding")})
                * sqrt({_DUCK_DOT.format(a="s.tv", b="s.tv")})), 6) >= 0.35
  GROUP BY t.vec_id
)
SELECT t.vec_id, COALESCE(h.n_close, 0) AS n_close,
       COALESCE(h.n_close, 0) > 0 AS contaminated
FROM trn t LEFT JOIN hits h USING (vec_id)
"""


@query("similarity_decontaminate_multiprobe", _emb_decon_multiprobe_sql)
def embedding_decontaminate_multiprobe_q(spark, sf_dir):
    """MULTIPROBE-blocked semantic decontamination (operators/
    decontaminate.py::embedding_contamination_flags_blocked with
    multiprobe=True): the round-6 verdict's one `weak` closed — the
    blocked decontaminator now probes each eval point's own sign
    bucket PLUS its 4 Hamming-1 neighbors (exploded on the broadcast
    eval side; the join stays a hashable bucket equi-join), so a
    contaminated train row whose embedding crosses ONE hyperplane from
    its eval near-neighbor is no longer missed.  Candidates are
    (d+1)/2^d of the corpus — still ~2^d/(d+1) fewer cosine folds than
    the exact scan — and recall on planted near-dups is pytest-gated
    >= 99%.  Deterministic probing, so the oracle reproduces the
    result bit-exactly."""
    from cloud_optimized_data_pipelines_spark.operators.decontaminate import (
        embedding_contamination_flags_blocked,
    )

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    test = emb.filter(F.col("vec_id") < 50)
    train = emb.filter(F.col("vec_id") >= 50)
    return embedding_contamination_flags_blocked(
        train, test, "embedding", "vec_id", threshold=0.35, num_dims=4,
        multiprobe=True,
    ).select("vec_id", "n_close", "contaminated")


@query("similarity_semantic_dedup_indexed", _SEMANTIC_DEDUP)
def semantic_dedup_indexed_q(spark, sf_dir):
    """SemDeDup over a PERSISTED assignment (operators/similarity.py::
    semantic_dedup_write_assignment / semantic_dedup_indexed): the n x
    k_lists assignment crossJoin — which dominates at the paper's
    k ~ sqrt(n) design point and which the in-memory form evaluates
    once per self-join side (measured 270 s at k=448 on the 100x
    probe) — is written ONCE partitioned by cid; both sides of the
    within-cluster join then read n parquet rows.  Same oracle as
    similarity_semantic_dedup: parquet round-trips doubles losslessly,
    so the flags are bit-identical."""
    import os
    import tempfile

    t = load_tables(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_semdedup_idx"
    )
    S.semantic_dedup_write_assignment(
        t["embeddings"], path, "embedding", "vec_id", k_lists=16
    )
    return S.semantic_dedup_indexed(
        spark, path, "embedding", "vec_id", threshold=0.35
    )


_DUCK_LTOKS = (
    "list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), "
    "t -> lower(t))"
)


def _duck_lang_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS[lang])
    return f"len(list_filter(ltoks, t -> list_contains([{words}], t)))"


_LANG_CASE = (
    "CASE WHEN best = 0 THEN 'und' "
    + " ".join(
        f"WHEN c_{lang} = best THEN '{lang}'" for lang in T.LANG_ORDER
    )
    + " END"
)

