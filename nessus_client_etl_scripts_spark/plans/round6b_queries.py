"""Round-6 second wave — q132…q134: BM25 keyword retrieval, hybrid
lexical+dense reciprocal-rank fusion, and sorted-neighborhood
blocking.

These extend the retrieval/dedup side of the LLM-data-pipeline
surface (SURVEY.md §7 Phase 4): mining a corpus for topical
documents (BM25), fusing a lexical ranking with an embedding
ranking (RRF — the standard hybrid-search combiner), and a third
candidate-generation family (sorted neighborhood) whose candidate
count is linear and data-independent, complementing LSH banding
(q28) and posting self-joins (q26/q127).

Float portability per PLANS.md: BM25 uses the raw RSJ odds-ratio
idf (no log), per-term contributions micro-round before an exact
BIGINT sum; RRF terms are single divisions of exact integers summed
in a fixed 2-term order; Jaccard is one division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import sorted_neighborhood_pairs
from ..operators.ranking import bm25_scores, bm25_topk, rrf_fuse
from ..operators.similarity import cosine
from .corpus_queries import _NORM_SQL
from .testdata_queries import register

_BM25_TERMS = ("vector", "merge", "scan")
_BM25_TERMS_SQL = "['vector', 'merge', 'scan']"

# ---------------------------------------------------------------------------
# q132 — BM25 keyword top-k
# ---------------------------------------------------------------------------

_BM25_CORE_SQL = f"""
  t AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS l FROM documents
  ), lens AS (
    SELECT doc_id, len(l) AS dl, l FROM t
  ), stats AS (
    SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM lens
  ), tf AS (
    SELECT doc_id, dl, term,
           len(list_filter(l, x -> x = term)) AS tf
    FROM lens, unnest({_BM25_TERMS_SQL}) AS u(term)
  ), hits AS (
    SELECT * FROM tf WHERE tf > 0
  ), dfc AS (
    SELECT term, count(*) AS df_t FROM hits GROUP BY term
  ), contrib AS (
    SELECT h.doc_id,
           CAST(round(
             ((CAST(s.n_docs AS DOUBLE) - CAST(d.df_t AS DOUBLE) + 0.5)
              / (CAST(d.df_t AS DOUBLE) + 0.5))
             * ((CAST(h.tf AS DOUBLE) * 2.2)
                / (CAST(h.tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (CAST(h.dl AS DOUBLE)
                       / (CAST(s.sum_dl AS DOUBLE)
                          / CAST(s.n_docs AS DOUBLE))))))
             * 1000000.0) AS BIGINT) AS contrib_micro
    FROM hits h JOIN dfc d USING (term) CROSS JOIN stats s
  ), scores AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(contrib_micro) AS BIGINT) AS score_micro
    FROM contrib GROUP BY doc_id
  )
"""

_Q132_ORACLE = f"""
WITH {_BM25_CORE_SQL},
ranked AS (
  SELECT doc_id, n_terms, score_micro,
         row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT doc_id, n_terms, score_micro, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
"""


@register("q132_bm25_topk", _Q132_ORACLE)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword retrieval (operators/ranking.bm25_topk):
    term frequencies computed ROW-LOCALLY against a |Q|-element
    literal term array (no corpus posting explode), corpus stats two
    tiny broadcast aggregates, idf the libm-free RSJ odds ratio,
    per-term contributions micro-rounded into an exact BIGINT sum.
    The global top-20 cut is a TakeOrderedAndProject; the rank
    window runs on 20 rows. The corpus is scanned once and never
    shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


# ---------------------------------------------------------------------------
# q133 — hybrid retrieval: BM25 ⊕ embedding-cosine via RRF
# ---------------------------------------------------------------------------

_Q133_ORACLE = f"""
WITH {_BM25_CORE_SQL},
bm25_full AS (
  SELECT doc_id, score_micro,
         row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scores
), bm25_top AS (
  SELECT doc_id, rank AS rank_a FROM bm25_full WHERE rank <= 100
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), cos AS (
  SELECT vec_id AS doc_id,
         list_dot_product(embedding::DOUBLE[], qv)
           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
              * sqrt(list_dot_product(qv, qv))) AS score
  FROM embeddings CROSS JOIN q WHERE vec_id != 0
), cos_full AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM cos
), cos_top AS (
  SELECT doc_id, rank AS rank_b FROM cos_full WHERE rank <= 100
), fused AS (
  SELECT a.doc_id,
         CAST(rank_a AS BIGINT) AS rank_a,
         CAST(rank_b AS BIGINT) AS rank_b,
         (CAST(1 AS DOUBLE) / CAST(60 + rank_a AS DOUBLE))
         + (CAST(1 AS DOUBLE) / CAST(60 + rank_b AS DOUBLE)) AS rrf_score
  FROM bm25_top a JOIN cos_top b USING (doc_id)
), cut AS (
  SELECT *,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
           AS fused_rank
  FROM fused
)
SELECT doc_id, rank_a, rank_b, rrf_score, CAST(fused_rank AS BIGINT)
         AS fused_rank
FROM cut WHERE fused_rank <= 20
"""


@register("q133_rrf_hybrid", _Q133_ORACLE)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — fuse the BM25 lexical ranking with a dense
    embedding-cosine ranking by reciprocal-rank fusion (Cormack et
    al. 2009), the standard hybrid-search combiner. Each retriever
    produces its own top-100 scale-safely (TakeOrderedAndProject
    heaps); fusion is then a broadcast join of two 100-row frames —
    the corpus never shuffles for the fusion step. The RRF terms are
    single IEEE divisions of exact integers summed in fixed order,
    bit-identical cross-engine with no rounding."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical side: full BM25 score frame, top-100 cut + dense rank
    from pyspark.sql import Window

    bm = (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(100)
    )
    wa = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    bm_ranked = bm.withColumn("rank", F.row_number().over(wa)).select(
        "doc_id", "rank"
    )

    # dense side: cosine to query vec 0, top-100 cut + dense rank
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(
                F.col("embedding").cast("array<double>"), F.col("qv")
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(100)
    )
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    cos_ranked = cos.withColumn("rank", F.row_number().over(wb)).select(
        "doc_id", "rank"
    )
    return rrf_fuse(bm_ranked, cos_ranked, id_col="doc_id", top=20)


# ---------------------------------------------------------------------------
# q134 — sorted-neighborhood candidate pairs
# ---------------------------------------------------------------------------

_Q134_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang,
         {_NORM_SQL} AS norm,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split({_NORM_SQL}, ' ')) - 2, 1)),
           i -> array_to_string(string_split({_NORM_SQL}, ' ')[i:i+2], ' ')
         )) AS sh
  FROM documents
), rn AS (
  SELECT doc_id, lang, sh, len(sh) AS n_sh,
         row_number() OVER (PARTITION BY lang ORDER BY norm, doc_id) AS rn
  FROM base
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(b.rn - a.rn AS BIGINT) AS dist,
         len(list_intersect(a.sh, b.sh)) AS inter,
         a.n_sh AS n_a, b.n_sh AS n_b
  FROM rn a JOIN rn b
    ON a.lang = b.lang AND b.rn - a.rn BETWEEN 1 AND 4
)
SELECT doc_a, doc_b, dist,
       CAST(inter AS BIGINT) AS inter,
       CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
FROM pairs
"""


@register("q134_sorted_neighborhood", _Q134_ORACLE)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    third candidate-generation family next to LSH banding and the
    shingle-posting self-join: sort each language block by the
    normalized text, compare each doc only with its 4 successors.
    Candidate count is exactly n·4 per block — linear and
    data-independent, immune to hot-shingle skew. One shuffle+sort
    serves the single window; successors arrive row-locally via
    lead() structs and pairing is an in-row explode, never a
    self-join (operators/dedup.sorted_neighborhood_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs, block_cols=("lang",), k=3, window=5
    )
