"""Round-6 declared queries — q125…q131: Gopher-style quality rules,
corpus bigram-LM novelty scoring, asymmetric containment dedup,
interval-overlap session analytics, exact stratified splits,
time-decayed engagement, and embedding standardization.

Each entry extends the LLM-data-pipeline surface (SURVEY.md §7
Phase 4) with the same contract as every other declared query: a
Spark-first plan plus a hand-written DuckDB oracle producing
identically-named, identically-valued columns. Float portability
follows PLANS.md's rules — integer-exact aggregation everywhere,
doubles only as single IEEE ops on identical inputs (no log/exp in
any hot path, no order-dependent double sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_for_compute
from ..operators.dedup import containment_pairs
from ..operators.lm import bigram_novelty
from ..operators.sampling import stratified_exact_split
from ..operators.similarity import embedding_standardize_checksum
from ..operators.temporal import decayed_sum_pow2, interval_bucket_overlap
from ..operators.text import gopher_rules, normalize_text, tokens
from .corpus_queries import _NORM_SQL
from .testdata_queries import register

# ---------------------------------------------------------------------------
# q125 — Gopher-style quality rule census
# ---------------------------------------------------------------------------

_Q125_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS l FROM documents
), f AS (
  SELECT doc_id,
         len(l) AS n_tokens,
         CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE)
           / len(l) AS mean_token_len,
         CAST(list_max(list_transform(list_distinct(l),
                t2 -> len(list_filter(l, x -> x = t2)))) AS DOUBLE)
           / len(l) AS most_common_frac,
         CAST(len(list_filter(l, x -> regexp_full_match(x, '[a-z]+')))
              AS DOUBLE) / len(l) AS alpha_frac,
         len(list_filter(l, x -> list_contains(['the', 'a'], x)))
           AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       mean_token_len,
       most_common_frac,
       alpha_frac,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       (n_tokens >= 15 AND n_tokens <= 100000
        AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
        AND most_common_frac <= 0.125
        AND alpha_frac >= 0.8
        AND stop_hits >= 2) AS keep
FROM f
"""


@register("q125_gopher_quality", _Q125_ORACLE)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality census (Rae et al. 2021 table A1 adapted):
    token-count band, mean-token-length band, most-common-word
    fraction cap, alphabetic floor, stopword floor — emitted per
    document WITH the individual features so the per-rule rejection
    census stays queryable (the tuning surface of a production
    filter). Entirely row-local array algebra in the scan projection
    (operators/text.gopher_rules): zero shuffle, zero UDF; every
    double is one IEEE division of exact integers. Tokens staged as an
    attribute so the tokenizer runs once (q58 staging rule) — the
    most-common scan is O(d·n) per row but d is the per-doc distinct
    count, bounded by doc length, not corpus size."""
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id", tokens(normalize_text("text")).alias("toks")
    )
    r = gopher_rules(F.col("toks"))
    return staged.select(
        "doc_id",
        r["n_tokens"].alias("n_tokens"),
        r["mean_token_len"].alias("mean_token_len"),
        r["most_common_frac"].alias("most_common_frac"),
        r["alpha_frac"].alias("alpha_frac"),
        r["stop_hits"].alias("stop_hits"),
        r["keep"].alias("keep"),
    )


# ---------------------------------------------------------------------------
# q126 — corpus bigram-LM novelty (the integer-exact perplexity band)
# ---------------------------------------------------------------------------

_Q126_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS l FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS bigram
  FROM t WHERE len(l) >= 2
), c AS (
  SELECT bigram, count(*) AS bg_count FROM bg GROUP BY 1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(bg_count) AS BIGINT) AS sum_count,
       CAST(sum(CASE WHEN bg_count <= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       CAST(sum(CASE WHEN bg_count <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS rare_ratio,
       CAST(sum(bg_count) AS DOUBLE) / count(*) AS mean_count
FROM bg JOIN c USING (bigram)
GROUP BY doc_id
"""


@register("q126_bigram_novelty", _Q126_ORACLE)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass corpus LM scoring — train global bigram counts, score
    every document against them (operators/lm.bigram_novelty): the
    engine-native, integer-exact stand-in for CCNet/Dolma's KenLM
    perplexity filter. High rare-bigram ratio flags OOD/noisy text,
    near-zero flags boilerplate. The model side is one map-side-
    combined aggregation (shuffle carries (bigram, count) longs); the
    scoring side one equi-join on the bigram key that AQE broadcasts
    while the vocabulary fits and hash-shuffles beyond. No logs — a
    rare-count band is libm-free, hence portable (PLANS.md rule #2)."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_novelty(docs, rare_max_count=2)


# ---------------------------------------------------------------------------
# q127 — asymmetric shingle containment (quote / subset detection)
# ---------------------------------------------------------------------------

_Q127_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split({_NORM_SQL}, ' ')) - 2, 1)),
           i -> array_to_string(string_split({_NORM_SQL}, ' ')[i:i+2], ' ')
         )) AS sh
  FROM documents
), sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM base
), posting AS (
  SELECT doc_id, lang, unnest(sh) AS shingle FROM base
), pairs AS (
  SELECT l.doc_id AS doc_lo, r.doc_id AS doc_hi, COUNT(*) AS inter
  FROM posting l JOIN posting r
    ON l.lang = r.lang AND l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
), directed AS (
  SELECT doc_lo AS doc_a, doc_hi AS doc_b, inter FROM pairs
  UNION ALL
  SELECT doc_hi AS doc_a, doc_lo AS doc_b, inter FROM pairs
)
SELECT d.doc_a, d.doc_b,
       CAST(d.inter AS BIGINT) AS inter,
       CAST(s.n_sh AS BIGINT) AS n_a,
       (CAST(d.inter AS DOUBLE) / s.n_sh) AS containment
FROM directed d JOIN sizes s ON d.doc_a = s.doc_id
WHERE (CAST(d.inter AS DOUBLE) / s.n_sh) >= 0.5
"""


@register("q127_containment_pairs", _Q127_ORACLE)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment |A∩B|/|A| ≥ 0.5 — the directional subset
    detector Jaccard misses (a short doc quoted inside a long one has
    low Jaccard but containment ≈ 1 from the short side). Same
    inverted-index single-shuffle shape as q26, with both directions
    derived from ONE `<`-half intersection count
    (operators/dedup.containment_pairs); max_df caps boilerplate
    shingles before the self-join at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, block_cols=("lang",), k=3, threshold=0.5, max_df=1000
    )


# ---------------------------------------------------------------------------
# q128 — active sessions per hour (interval-overlap via bucket explode)
# ---------------------------------------------------------------------------

_Q128_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), sessions AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM sess GROUP BY user_id, session_id
), buckets AS (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', session_start),
                                date_trunc('hour', session_end),
                                INTERVAL 1 HOUR)) AS bucket_start
  FROM sessions
)
SELECT CAST(bucket_start AS TIMESTAMP) AS bucket_start,
       CAST(count(*) AS BIGINT) AS active_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM buckets GROUP BY 1
"""


@register("q128_active_sessions_hourly", _Q128_ORACLE)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency-over-time: how many sessions are live in each hour.
    The interval⋈spine theta join a naive plan needs is a
    BroadcastNestedLoop (the first plan to die at 100 TB); instead
    each session row-locally generates exactly the hour buckets it
    spans (operators/temporal.interval_bucket_overlap — fan-out
    bounded by session duration / 1 h) and a plain hash aggregate
    counts per bucket. Sessionization reuses the q19 gap-islands
    shape: the user_id shuffle serves both windows and the session
    aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
            <= 1800,
            0,
        ).otherwise(1),
    )
    sessions = (
        marked.withColumn(
            "session_id", F.sum("new_session").over(wrun).cast("long")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    buckets = interval_bucket_overlap(
        sessions, "session_start", "session_end", bucket_sec=3600
    )
    return buckets.groupBy("bucket_start").agg(
        F.count(F.lit(1)).cast("long").alias("active_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# q129 — exact-count stratified eval split
# ---------------------------------------------------------------------------

_Q129_ORACLE = """
WITH h AS (
  SELECT doc_id, lang, source,
         ('0x' || substring(md5('strata-v1' || (doc_id)::VARCHAR), 1, 12))::BIGINT
           AS sk
  FROM documents
), m AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY sk, doc_id)
           AS rn,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM h
)
SELECT doc_id, lang, source,
       CASE WHEN rn <= ceil(n * 0.1) THEN 'eval' ELSE 'train' END AS split
FROM m
"""


@register("q129_stratified_split", _Q129_ORACLE)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified holdout: within every (lang, source)
    stratum the first ceil(0.1·n) rows by salted content hash go to
    eval (operators/sampling.stratified_exact_split). hash_split's
    per-row Bernoulli gives binomial jitter per stratum — a small
    stratum can land far from 10% or empty; benchmark evals need the
    exact proportion. One shuffle on the strata key serves both
    window functions; the assignment is deterministic from
    (salt, doc_id) alone, so it survives re-partitioning and re-runs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return stratified_exact_split(
        docs, ("lang", "source"), 0.1, key_col="doc_id", salt="strata-v1"
    )


# ---------------------------------------------------------------------------
# q130 — exponentially time-decayed engagement (power-of-two exact)
# ---------------------------------------------------------------------------

_Q130_ORACLE = """
WITH ref AS (
  SELECT max(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS r FROM events
), s AS (
  SELECT user_id,
         least(floor(((SELECT r FROM ref)
                       - epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                     / 86400.0), 20) AS k,
         value
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k < 20
                     THEN CAST(round(value * 100) AS BIGINT)
                          * (CAST(1 AS BIGINT) << CAST(20 - k AS INTEGER))
                     ELSE 0 END) AS DOUBLE) / 104857600.0 AS decayed_value
FROM s GROUP BY user_id
"""


@register("q130_decayed_engagement", _Q130_ORACLE)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score: each event contributes
    value·2^-(age_days), ages ≥ 20 half-lives contribute 0. The decay
    base is a power of two ON PURPOSE (operators/temporal.
    decayed_sum_pow2): contributions become exact integers
    (round(value·100) << (20−k)), the per-user sum is ONE exact BIGINT
    aggregation (map-side combined — no order-dependent double sum, no
    exp() libm divergence), and a single final division rescales. The
    reference timestamp is the corpus max — a 1-row watermark collect,
    the accepted driver-side pattern (PLANS.md)."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.col("ts").cast("long"))).collect()[0][0]
    return decayed_sum_pow2(
        ev,
        ["user_id"],
        "ts",
        "value",
        ref,
        half_life_days=1,
        max_age_halvings=20,
        out_col="decayed_value",
    )


# ---------------------------------------------------------------------------
# q131 — per-dimension embedding standardization (fit + transform)
# ---------------------------------------------------------------------------

_Q131_ORACLE = """
WITH ex0 AS (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), ei AS (
  SELECT vec_id, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE) AS x,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS e_int
  FROM ex0
), st AS (
  SELECT dim, count(*) AS n, sum(e_int) AS s1, sum(e_int * e_int) AS s2
  FROM ei GROUP BY dim
), stats AS (
  SELECT dim,
         CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean,
         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 * 1000000000000.0)) AS std
  FROM st
), z AS (
  SELECT e.vec_id,
         CAST(round(((e.x - s.mean) / s.std) * 1000) AS BIGINT) AS zm
  FROM ei e JOIN stats s USING (dim)
)
SELECT vec_id,
       CAST(sum(zm) AS BIGINT) AS z_sum_milli,
       CAST(min(zm) AS BIGINT) AS z_min_milli,
       CAST(max(zm) AS BIGINT) AS z_max_milli
FROM z GROUP BY vec_id
"""


@register("q131_embedding_standardize", _Q131_ORACLE)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding column —
    the feature-scaling fit+transform before clustering/ANN indexing —
    verified value-exactly through integer-microunit moments
    (operators/similarity.embedding_standardize_checksum): elements
    quantize ONCE to round(x·1e6), all moments are exact integer sums
    (variance numerator in DECIMAL(38,0) — BIGINT overflows at corpus
    scale), and every double is a single IEEE op on identical inputs.
    The d-row stats frame broadcasts back into the transform, so the
    corpus side never shuffles for the join; the per-vector reduce is
    one hash agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_standardize_checksum(emb)
