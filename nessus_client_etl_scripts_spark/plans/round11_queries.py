"""Round-11 wave — the serving/eval-tier shapes from the r10 growth
plan (PLANS.md note #6): off-policy evaluation, best-of-n selection
audit, RAG chunking with chunk-level dedup, mutual-kNN filtering,
mergeable Misra-Gries heavy hitters, incremental IVF re-assignment,
prompt prefix-cache savings, crowd-label aggregation, speculative-
decode acceptance, and a semantic query-cache audit.

Engine-parity rules carried from rounds 8-10: every ratio is an
integer cross-multiplied milli with shared half-away-from-zero
rounding (`(2000·num ± den) div (2·den)` — Spark `div` and DuckDB
`//` both truncate toward zero, verified on negatives); floats enter
comparisons only as round()-quantized BIGINTs (the q131/q332
precedent — both engines round half away from zero); pinned
pseudo-randomness is the q299 portable LCG, never engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .testdata_queries import register
from ..pins import pin as _pin


def _milli_sql(num: str, den: str) -> str:
    """Half-away-from-zero round(1000*num/den) in pure BIGINT algebra
    (both engines truncate integer division toward zero)."""
    return (
        f"(2000 * ({num}) + (CASE WHEN ({num}) < 0 THEN -({den}) "
        f"ELSE ({den}) END)) // (2 * ({den}))"
    )


def _milli_col(num: str, den: str):
    return F.expr(
        f"(2000 * ({num}) + (CASE WHEN ({num}) < 0 THEN -({den}) "
        f"ELSE ({den}) END)) div (2 * ({den}))"
    ).cast("long")


def _round_half_away(x):
    """Exact round-half-away-from-zero on doubles — bit-identical to
    DuckDB round() / std::round. NOT floor(abs+0.5): for v just below
    a half (e.g. 0.49999999999999994) the +0.5 ADDITION rounds up
    across the boundary and floor then misrounds; the fractional-part
    comparison involves only exact FP ops (a − floor(a) is exact for
    every double: Sterbenz for a ≥ 1, trivially for a < 1). Delegates
    to the shared matmul-kernel helper."""
    from ..operators.similarity import round_half_away

    return round_half_away(x)


def _nano_pair_scores(M):
    """Engine-exact nano cosine matrix for a cell (q337/q343): micro-
    quantize (exact half-away, the DuckDB round() twin), take the
    gram matrix — EXACT integers in any summation order because every
    term and partial sum is an integer-valued double < 2^53 — then
    the shared scalar chain 1e9·(dot/(na·nb)) rounded half-away.
    Raises loudly on a zero-norm quantized vector (cosine undefined;
    silent NaN→int64 garbage would win rank 1 via sentinel-negation
    overflow) — the corpus precondition pinned by
    test_q337_q343_exactness_precondition."""
    import numpy as np

    Mq = _round_half_away(M * 1e6)
    G = Mq @ Mq.T
    nrm2 = np.diag(G)
    if np.any(nrm2 == 0):
        raise ValueError(
            "zero-norm micro-quantized vector: cosine undefined "
            "(every |component| < 5e-7) — violates the q337/q343 "
            "corpus precondition"
        )
    nrm = np.sqrt(nrm2)
    S = G / np.outer(nrm, nrm) * 1e9
    return _round_half_away(S).astype(np.int64)


# ---------------------------------------------------------------------------
# q334 — IPS / SNIPS off-policy evaluation over a logged decision stream
# ---------------------------------------------------------------------------

# logging policy propensity of the LOGGED action: (1 + k%10)/20, so the
# importance weight 20/(1+k%10) scaled by lcm(1..10)=2520 is the exact
# integer 50400/(1+k%10).
_Q334_WSCALE = 2520 * 20

_Q334_ORACLE = f"""
WITH logged AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'purchase' ELSE 'click' END
           AS target_action,
         CASE WHEN event_type =
              CASE WHEN user_id % 2 = 0 THEN 'purchase' ELSE 'click' END
              THEN 1 ELSE 0 END AS matched,
         {_Q334_WSCALE} // (1 + CAST(props->>'$.k' AS BIGINT) % 10)
           AS w_scaled,
         CAST(round(value * 100) AS BIGINT) AS reward_cents
  FROM events
)
SELECT target_action,
       CAST(count(*) AS BIGINT) AS n_logged,
       CAST(sum(matched) AS BIGINT) AS n_matched,
       CAST(sum(matched * w_scaled * reward_cents) AS BIGINT) AS ips_num,
       CAST(sum(matched * w_scaled) AS BIGINT) AS w_sum,
       CAST({_milli_sql('sum(matched * w_scaled * reward_cents)',
                        '2520 * count(*)')} AS BIGINT)
         AS ips_milli_cents,
       CAST({_milli_sql('sum(matched * w_scaled * reward_cents)',
                        'sum(matched * w_scaled)')} AS BIGINT)
         AS snips_milli_cents
FROM logged GROUP BY target_action
"""


@register("q334_ips_offpolicy", _Q334_ORACLE)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFF-POLICY EVALUATION by inverse-propensity scoring — the
    counterfactual estimator behind every logged-bandit / recsys /
    LLM-router eval (Horvitz-Thompson; SNIPS per Swaminathan-Joachims
    2015): estimate the value of a DETERMINISTIC target policy
    (purchase for even users, click for odd) from decisions logged
    under a known stochastic logging policy, weighting each matching
    decision by 1/propensity. Propensities are the exact rationals
    (1+k%10)/20, so scaling by lcm(1..10)·20 = 50400 keeps every
    weight an exact BIGINT — IPS and the self-normalized SNIPS are
    emitted as cross-multiplied milli-cents with no float division.

    Scale: one events scan into a 2-group rollup; all sums are
    map-side partial BIGINTs, no joins, no windows — the estimator a
    1000-executor cluster evaluates in one shuffle-light pass."""
    ev = load_table(spark, sf_dir, "events")
    tgt = F.when(F.col("user_id") % 2 == 0, F.lit("purchase")).otherwise(
        F.lit("click")
    )
    k = F.get_json_object("props", "$.k").cast("long")
    logged = ev.select(
        tgt.alias("target_action"),
        (F.col("event_type") == tgt).cast("long").alias("matched"),
        (F.lit(_Q334_WSCALE) / (1 + k % 10))
        .cast("long")
        .alias("w_scaled"),
        F.round(F.col("value") * 100).cast("long").alias("reward_cents"),
    )
    agg = logged.groupBy("target_action").agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.sum("matched").cast("long").alias("n_matched"),
        F.sum(F.col("matched") * F.col("w_scaled") * F.col("reward_cents"))
        .cast("long")
        .alias("ips_num"),
        F.sum(F.col("matched") * F.col("w_scaled"))
        .cast("long")
        .alias("w_sum"),
    )
    return agg.select(
        "target_action",
        "n_logged",
        "n_matched",
        "ips_num",
        "w_sum",
        _milli_col("ips_num", "2520 * n_logged").alias("ips_milli_cents"),
        _milli_col("ips_num", "w_sum").alias("snips_milli_cents"),
    )


# ---------------------------------------------------------------------------
# q335 — best-of-n selection audit over candidate generations
# ---------------------------------------------------------------------------

_Q335_NS = (1, 2, 4, 8)

_Q335_ORACLE = f"""
WITH cand AS (
  SELECT event_id // 8 AS prompt_id,
         event_id % 8 AS pos,
         CAST(round(value * 100) AS BIGINT) AS reward_cents
  FROM events
), fanned AS (
  SELECT n.n, c.prompt_id, c.pos, c.reward_cents
  FROM cand c
  CROSS JOIN (VALUES (1), (2), (4), (8)) AS n(n)
  WHERE c.pos < n.n
), per_prompt AS (
  SELECT n, prompt_id,
         max(reward_cents) AS best_cents,
         count(*) AS n_cand
  FROM fanned GROUP BY n, prompt_id
), winners AS (
  SELECT p.n, p.prompt_id, p.best_cents,
         min(f.pos) AS win_pos
  FROM per_prompt p
  JOIN fanned f
    ON f.n = p.n AND f.prompt_id = p.prompt_id
   AND f.reward_cents = p.best_cents
  WHERE p.n_cand = p.n
  GROUP BY p.n, p.prompt_id, p.best_cents
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_prompts,
       CAST(sum(best_cents) AS BIGINT) AS sum_best_cents,
       CAST({_milli_sql('sum(best_cents)', 'count(*)')} AS BIGINT)
         AS mean_best_milli_cents,
       CAST(sum(CASE WHEN win_pos = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS pos0_wins,
       CAST({_milli_sql(
           'sum(CASE WHEN win_pos = 0 THEN 1 ELSE 0 END)', 'count(*)'
       )} AS BIGINT) AS pos0_share_milli
FROM winners GROUP BY n
"""


@register("q335_best_of_n_audit", _Q335_ORACLE)
def q335(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEST-OF-N selection audit — the reward-uplift curve every
    best-of-n / rejection-sampling pipeline is sized by (how much does
    a 2nd/4th/8th sample buy?) plus the position-bias check (does the
    first candidate win more than 1/n of the time?). Candidates are
    the logged generations (8 per prompt: prompt = event_id div 8,
    position = event_id mod 8, reward in exact cents); for each
    n ∈ {1,2,4,8} the selector takes the max-reward candidate among
    the FIRST n, ties resolved to the lowest position.

    Scale: the 4-row n-frame is broadcast into a nested-loop fan-out
    (≤4× the scan, no shuffle), then ONE shuffle keyed (n, prompt) for
    the per-prompt max — winner position rides the same aggregate as
    min(pos) FILTER (reward = max) — and a 4-group final rollup."""
    ev = load_table(spark, sf_dir, "events")
    cand = ev.select(
        F.expr("event_id div 8").alias("prompt_id"),
        (F.col("event_id") % 8).alias("pos"),
        F.round(F.col("value") * 100).cast("long").alias("reward_cents"),
    )
    ns = spark.createDataFrame([(n,) for n in _Q335_NS], "n long")
    fanned = cand.join(F.broadcast(ns), F.col("pos") < F.col("n"))
    per_prompt = fanned.groupBy("n", "prompt_id").agg(
        F.max("reward_cents").alias("best_cents"),
        F.count(F.lit(1)).alias("n_cand"),
        # min(pos) among max-reward candidates == argmin-by tiebreak:
        # min_by on the (neg reward, pos) struct is order-insensitive
        F.min(
            F.struct((-F.col("reward_cents")).alias("nr"), F.col("pos"))
        )["pos"].alias("win_pos"),
    )
    winners = per_prompt.filter(F.col("n_cand") == F.col("n"))
    return winners.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_prompts"),
        F.sum("best_cents").cast("long").alias("sum_best_cents"),
        _milli_col("sum(best_cents)", "count(*)").alias(
            "mean_best_milli_cents"
        ),
        F.sum((F.col("win_pos") == 0).cast("long"))
        .cast("long")
        .alias("pos0_wins"),
        _milli_col(
            "sum(CASE WHEN win_pos = 0 THEN 1 ELSE 0 END)", "count(*)"
        ).alias("pos0_share_milli"),
    )


# ---------------------------------------------------------------------------
# q336 — RAG sliding-window chunker with chunk-level dedup
# ---------------------------------------------------------------------------

_Q336_W = 32  # chunk width (words)
_Q336_S = 16  # stride (50 % overlap)

_Q336_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), starts AS (
  SELECT doc_id, source, toks,
         unnest(generate_series(0, (len(toks) - 1) // {_Q336_S})) AS i
  FROM w
), chunks AS (
  SELECT doc_id, source,
         md5(array_to_string(
           list_slice(toks, i * {_Q336_S} + 1,
                      i * {_Q336_S} + {_Q336_W}), ' ')) AS chunk_hash
  FROM starts
), global_counts AS (
  SELECT chunk_hash, count(*) AS n_copies FROM chunks GROUP BY chunk_hash
)
SELECT c.source,
       CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT c.chunk_hash) AS BIGINT) AS n_local_distinct,
       CAST(sum(CASE WHEN g.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_global,
       CAST({_milli_sql(
           'sum(CASE WHEN g.n_copies > 1 THEN 1 ELSE 0 END)', 'count(*)'
       )} AS BIGINT) AS dup_share_milli
FROM chunks c JOIN global_counts g USING (chunk_hash)
GROUP BY c.source
"""


@register("q336_rag_chunk_dedup", _Q336_ORACLE)
def q336(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG SLIDING-WINDOW CHUNKER with chunk-level dedup — the index-
    build preprocessing every retrieval corpus runs: split each
    document into {w}-word windows at stride {s} (50 % overlap so no
    answer span straddles a boundary unseen), fingerprint each chunk,
    and audit per source how much of the chunk stream is corpus-wide
    duplicated (boilerplate chunks poison retrieval twice — they waste
    index space AND surface as near-identical contexts).

    Scale: chunking is ROW-LOCAL (split + slice + md5 inside one
    projection — no explode of text, only of the start index); the
    copy-count is ONE window over the 32-char hash — a single corpus
    scan and a single hash exchange that never carries chunk text
    (the q97/q111 rule); hash cardinality is maximal so the window
    partitions spread evenly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    chunks = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.sequence(
                F.lit(0), ((F.size(toks) - 1) / _Q336_S).cast("long")
            )
        ).alias("_p", "i"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("toks"),
                    F.col("i").cast("int") * _Q336_S + 1,
                    _Q336_W,
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
    # global copy-counts as a window over the hash instead of an
    # agg + self-join: ONE corpus scan and one hash exchange (the
    # join form scans the corpus twice for the same answer);
    # chunk_hash is maximal-cardinality so the partition spread is
    # even by construction
    joined = chunks.withColumn(
        "n_copies",
        F.count(F.lit(1)).over(Window.partitionBy("chunk_hash")),
    )
    return joined.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("chunk_hash").cast("long").alias(
            "n_local_distinct"
        ),
        F.sum((F.col("n_copies") > 1).cast("long"))
        .cast("long")
        .alias("n_dup_global"),
        _milli_col(
            "sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)", "count(*)"
        ).alias("dup_share_milli"),
    )


q336.__doc__ = q336.__doc__.format(w=_Q336_W, s=_Q336_S)


# ---------------------------------------------------------------------------
# q337 — mutual-kNN (reciprocal) filtering over ANN winners
# ---------------------------------------------------------------------------

_Q337_K = 5

# The pair score is cosine over MICRO-QUANTIZED vectors: every dot
# term is an integer-valued double, and every partial sum stays below
# 2^53 (|eq| ≤ ~5e6, 64 dims → |dot| ≤ ~2e15... per-term ≤ 2.5e13,
# 64-term sum ≤ 1.6e15 < 9.007e15), so the accumulation is EXACT in
# any order — numpy's blocked matmul, DuckDB's sequential
# list_dot_product and a python fold all produce the identical
# integer. The only float ops left (sqrt, multiply, divide, ×1e9,
# round) are single correctly-rounded scalar ops on identical
# inputs, so the nano score is engine-exact by construction (no
# margin argument needed — the r11 lesson: with millions of pairs,
# SOME true cosine always sits within reorder noise of a rounding
# boundary). test_q337_q343_exactness_precondition pins the 2^53
# bound on real data.
_Q337_COS_NANO = (
    "CAST(round(1000000000 * (list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))))) AS BIGINT)"
)

_Q337_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> round(x * 1000000)) AS e
  FROM embeddings
), scored AS (
  SELECT a.label, a.vec_id AS src, b.vec_id AS dst,
         {_Q337_COS_NANO.format(a="a.e", b="b.e")} AS score_nano
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
), edges AS (
  SELECT label, src, dst, score_nano,
         row_number() OVER (PARTITION BY src
                            ORDER BY score_nano DESC, dst) AS rank
  FROM scored
), topk AS (
  SELECT * FROM edges WHERE rank <= {_Q337_K}
)
SELECT f.label,
       f.src AS u, f.dst AS v,
       CAST(f.rank AS BIGINT) AS rank_uv,
       CAST(r.rank AS BIGINT) AS rank_vu,
       f.score_nano
FROM topk f JOIN topk r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
"""


@register("q337_mutual_knn", _Q337_ORACLE)
def q337(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL-kNN (reciprocal-neighbor) filtering over ANN winners —
    the hubness-robust edge filter kNN-graph pipelines apply before
    clustering or diffusion (a hub that everyone ranks highly but that
    ranks nobody back contributes no mutual edge; Jégou et al.'s
    reciprocal-rank family): keep pair (u,v) only if v is in u's
    top-{k} AND u is in v's top-{k}.

    Scale: candidate generation is confined to the ANN index's coarse
    cells (label = the given quantizer cell, the q114/q339 contract) —
    quadratic only within a cell, never across the corpus, computed
    as ONE Arrow-batched numpy matmul per cell (the q114 scale path;
    cell sizes are posting-list sized, ~sqrt(N) with a sqrt(N)-cell
    codebook, so the in-memory pair block is executor-sized); the
    reciprocity check is a self-join of the n·k EDGE LIST keyed on
    the (src,dst) pair, so the post-matmul stage is data-bounded by
    k. Scores are cosine over MICRO-QUANTIZED vectors, nano-rounded
    BEFORE ranking — engine-exact by construction (integer-valued
    doubles sum exactly in any order; the _Q337_COS_NANO note) with
    neighbor-id tie pinning; the 2^53 exactness precondition is
    pinned by test_q337_q343_exactness_precondition."""
    import numpy as np
    import pandas as pd

    # NULL-cell rows emit no edges: the oracle's a.label = b.label
    # equi-join never matches NULL, and the pandas scorer's int cast
    # would crash on a NULL group
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )

    # Per-cell blocked matmul instead of a cell self-join with a
    # per-pair interpreted fold (the q114 lesson: 6.4 s → ~1 s at
    # sf0.1). Exactness: vectors are micro-quantized first, so the
    # gram matrix is integer-exact in ANY summation order (see the
    # _Q337_COS_NANO note) — ranks are functions of engine-exact
    # integers with dst tiebreak.
    k = _Q337_K

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int32"),
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                    "score_nano": pd.Series([], dtype="int64"),
                }
            )
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)[order]
        M = np.stack(pdf["e"].to_numpy()[order]).astype(
            np.float64, copy=False
        )
        nano = _nano_pair_scores(M)
        # sentinel must survive the lexsort negation (int64 min would
        # overflow back to itself and sort the self-pair FIRST)
        np.fill_diagonal(nano, -(2**62))
        kk = min(k, n - 1)
        srcs, dsts, ranks, scores = [], [], [], []
        for i in range(n):
            # top-k by (score desc, dst asc): lexsort is stable
            idx = np.lexsort((ids, -nano[i]))[:kk]
            srcs.extend([ids[i]] * kk)
            dsts.extend(ids[idx])
            ranks.extend(range(1, kk + 1))
            scores.extend(nano[i][idx])
        return pd.DataFrame(
            {
                "label": np.full(len(srcs), pdf["label"].iloc[0]),
                "src": np.asarray(srcs, dtype=np.int64),
                "dst": np.asarray(dsts, dtype=np.int64),
                "rank": np.asarray(ranks, dtype=np.int64),
                "score_nano": np.asarray(scores, dtype=np.int64),
            }
        )

    topk = emb.groupBy("label").applyInPandas(
        cell_topk,
        "label int, src long, dst long, rank long, score_nano long",
    )
    rev = topk.select(
        F.col("src").alias("r_src"),
        F.col("dst").alias("r_dst"),
        F.col("rank").alias("rank_vu"),
    )
    return (
        topk.join(
            rev,
            (F.col("src") == F.col("r_dst")) & (F.col("dst") == F.col("r_src")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(
            "label",
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("rank").cast("long").alias("rank_uv"),
            F.col("rank_vu").cast("long").alias("rank_vu"),
            "score_nano",
        )
    )


q337.__doc__ = q337.__doc__.format(k=_Q337_K)


# ---------------------------------------------------------------------------
# q338 — mergeable Misra-Gries heavy hitters (space-saving class)
# ---------------------------------------------------------------------------

_Q338_M = 12  # summary capacity (counters kept)
_Q338_P = 8  # pinned partition count

_Q338_ORACLE = f"""
WITH keyed AS (
  SELECT event_id % {_Q338_P} AS part,
         CAST(props->>'$.k' AS BIGINT) AS k
  FROM events
), part_counts AS (
  SELECT part, k, count(*) AS c FROM keyed GROUP BY part, k
), part_ranked AS (
  SELECT part, k, c,
         row_number() OVER (PARTITION BY part ORDER BY c DESC, k) AS rnk
  FROM part_counts
), part_t AS (
  SELECT part,
         coalesce(max(CASE WHEN rnk = {_Q338_M} + 1 THEN c END), 0) AS t
  FROM part_ranked GROUP BY part
), compressed AS (
  SELECT r.part, r.k, r.c - t.t AS cc
  FROM part_ranked r JOIN part_t t USING (part)
  WHERE r.c - t.t > 0
), merged AS (
  SELECT k, sum(cc) AS mc FROM compressed GROUP BY k
), merged_ranked AS (
  SELECT k, mc, row_number() OVER (ORDER BY mc DESC, k) AS rnk
  FROM merged
), t_fin AS (
  SELECT coalesce(max(CASE WHEN rnk = {_Q338_M} + 1 THEN mc END), 0) AS tf
  FROM merged_ranked
), err AS (
  SELECT (SELECT sum(t) FROM part_t) + (SELECT tf FROM t_fin) AS eb
), truth AS (
  SELECT CAST(props->>'$.k' AS BIGINT) AS k, count(*) AS tc
  FROM events GROUP BY 1
)
SELECT m.k,
       CAST(m.mc - (SELECT tf FROM t_fin) AS BIGINT) AS mg_count,
       CAST((SELECT eb FROM err) AS BIGINT) AS err_bound,
       CAST(t.tc AS BIGINT) AS true_count,
       (t.tc >= m.mc - (SELECT tf FROM t_fin)
        AND t.tc <= m.mc - (SELECT tf FROM t_fin)
                    + (SELECT eb FROM err)) AS within_bound
FROM merged_ranked m JOIN truth t USING (k)
WHERE m.mc - (SELECT tf FROM t_fin) > 0
"""


@register("q338_misra_gries_topk", _Q338_ORACLE)
def q338(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HEAVY-HITTERS summary (Misra-Gries / space-saving
    class, the Agarwal et al. 2013 mergeable formulation): each of
    {p} pinned partitions builds an exact per-key count then
    compresses it to ≤{m} counters by subtracting the ({m}+1)-th
    largest count and dropping non-positives; summaries merge by
    summing and re-compressing. Unlike the streaming textbook form
    this is ORDER-INSENSITIVE (a pure function of each partition's
    multiset), which is what makes it a distributed sketch: the same
    answer on any executor layout. Emitted with the deterministic
    error bound Σ t_part + t_final and the exact counts as the audit
    (every surviving key's true count must lie in [est, est+bound]
    — the MG guarantee).

    Scale: the only data-size shuffle is the exact per-(partition,key)
    count (map-side partial); everything after operates on ≤{p}·|keys|
    summary rows. At 100 TB the pinned partition id becomes the real
    executor partition and the merge tree deepens — the bound
    telescopes identically."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    keyed = ev.select(
        (F.col("event_id") % _Q338_P).alias("part"), k.alias("k")
    )
    # pc feeds FOUR consumers (rank, threshold, merge, audit); it is
    # summary-scale (≤ P·|keys| rows) so pin it once — one events
    # scan + one exchange total (the q282 multi-consumer rule)
    pc = (
        keyed.groupBy("part", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_pin)
    )
    # asc_nulls_last: a NULL key (malformed props) must tie-rank the
    # same as the oracle's default ASC NULLS LAST — Spark's bare asc
    # is NULLS FIRST, which would shift the (m+1)-th threshold
    wp = Window.partitionBy("part").orderBy(
        F.desc("c"), F.asc_nulls_last("k")
    )
    pr = pc.withColumn("rnk", F.row_number().over(wp))
    pt = pr.groupBy("part").agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == _Q338_M + 1, F.col("c"))),
            F.lit(0),
        ).alias("t")
    )
    compressed = (
        pr.join(pt, "part")
        .withColumn("cc", F.col("c") - F.col("t"))
        .filter(F.col("cc") > 0)
    )
    merged = compressed.groupBy("k").agg(F.sum("cc").alias("mc"))
    # global window is legal here (rule #14): `merged` is bounded by
    # construction at ≤ P·m = 96 summary rows, not data-proportional
    wm = Window.orderBy(F.desc("mc"), F.asc_nulls_last("k"))
    mr = merged.withColumn("rnk", F.row_number().over(wm))
    tf = mr.agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == _Q338_M + 1, F.col("mc"))),
            F.lit(0),
        ).alias("tf")
    )
    eb = pt.agg(F.sum("t").alias("st")).crossJoin(F.broadcast(tf)).select(
        (F.col("st") + F.col("tf")).alias("eb"), "tf"
    )
    # exact audit counts derive from the SAME per-(partition,key)
    # frame the sketch compresses — no second events scan
    truth = pc.groupBy("k").agg(F.sum("c").alias("tc"))
    return (
        mr.crossJoin(F.broadcast(eb))
        .withColumn("mg_count", (F.col("mc") - F.col("tf")).cast("long"))
        .filter(F.col("mg_count") > 0)
        .join(truth, "k")
        .select(
            "k",
            "mg_count",
            F.col("eb").cast("long").alias("err_bound"),
            F.col("tc").cast("long").alias("true_count"),
            (
                (F.col("tc") >= F.col("mg_count"))
                & (F.col("tc") <= F.col("mg_count") + F.col("eb"))
            ).alias("within_bound"),
        )
    )


q338.__doc__ = q338.__doc__.format(m=_Q338_M, p=_Q338_P)


# ---------------------------------------------------------------------------
# q339 — incremental IVF re-assignment delta (one Lloyd step of churn)
# ---------------------------------------------------------------------------

_Q339_ORACLE = """
WITH ex0 AS (
  SELECT vec_id, label, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), ei AS (
  SELECT vec_id, label, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS eq
  FROM ex0
), cent AS (
  SELECT label AS cell, dim,
         (2 * sum(eq) + (CASE WHEN sum(eq) < 0 THEN -count(*)
                         ELSE count(*) END)) // (2 * count(*)) AS cq
  FROM ei GROUP BY label, dim
), dists AS (
  SELECT e.vec_id, e.label, c.cell,
         sum((e.eq - c.cq) * (e.eq - c.cq)) AS d2
  FROM ei e JOIN cent c USING (dim)
  GROUP BY e.vec_id, e.label, c.cell
), assigned AS (
  SELECT vec_id, label,
         cell AS new_cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dists
)
SELECT CAST(label AS BIGINT) AS old_cell,
       CAST(new_cell AS BIGINT) AS new_cell,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM assigned WHERE rn = 1
GROUP BY label, new_cell
"""


@register("q339_ivf_reassign_delta", _Q339_ORACLE)
def q339(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL IVF RE-ASSIGNMENT DELTA — the index-maintenance
    step every IVF deployment runs after re-training its centroids
    (one Lloyd step here): recompute each cell's centroid from its
    current members, re-assign every vector to the nearest NEW
    centroid, and report the churn matrix (old cell → new cell →
    vector count) that sizes the physical data movement of the index
    rebuild. All arithmetic is exact BIGINT: embeddings quantize to
    micro units (the q131 precedent), centroids round half-away to
    integer coordinates, and distances are integer squared-L2 — so
    the argmin is engine-exact with (distance, cell) tie pinning.

    Scale: the centroid aggregate is map-side partial over the
    dim-exploded frame; the re-assignment joins each vector against
    the |cells|·|dims| centroid table REDUCED to |cells| array rows
    and BROADCAST (constant size in the corpus — the q79 serving
    shape), so the scan never shuffles; the churn rollup is
    |cells|² rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    eq = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("long"),
    )
    vecs = emb.select("vec_id", "label", eq.alias("eq"))
    ei = vecs.select(
        "vec_id", "label", F.posexplode("eq").alias("dim", "v")
    )
    cent = ei.groupBy(F.col("label").alias("cell"), "dim").agg(
        F.expr(
            "(2 * sum(v) + (CASE WHEN sum(v) < 0 THEN -count(*)"
            " ELSE count(*) END)) div (2 * count(*))"
        ).alias("cq")
    )
    # |cells| array rows: sort by dim inside the cell, assemble once
    cent_arr = (
        cent.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cq"))
            ).alias("pairs")
        )
        .select(
            "cell",
            F.transform(F.col("pairs"), lambda p: p["cq"]).alias("cvec"),
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("eq"), F.col("cvec"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dists = vecs.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "label", "cell", d2.alias("d2")
    )
    # NULL-cell parity (r11 ADVICE): oracle ORDER BY d2, cell is NULLS
    # LAST; pin asc_nulls_last so a NULL-labelled centroid cell (never
    # present today, but q337/q343 defend the same case) ties the same
    # way in both engines.
    w = Window.partitionBy("vec_id").orderBy(
        F.asc_nulls_last("d2"), F.asc_nulls_last("cell")
    )
    assigned = dists.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return assigned.groupBy(
        F.col("label").cast("long").alias("old_cell"),
        F.col("cell").cast("long").alias("new_cell"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))


# ---------------------------------------------------------------------------
# q340 — prompt prefix-cache savings audit
# ---------------------------------------------------------------------------

_Q340_DEPTHS = (4, 8, 16)

_Q340_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), fanned AS (
  SELECT d.d, doc_id,
         md5(array_to_string(list_slice(toks, 1, d.d), ' ')) AS pref
  FROM w CROSS JOIN (VALUES (4), (8), (16)) AS d(d)
  WHERE len(toks) >= d.d
), groups AS (
  SELECT d, pref, count(*) AS cnt FROM fanned GROUP BY d, pref
)
SELECT CAST(d AS BIGINT) AS depth,
       CAST(sum(cnt) AS BIGINT) AS n_prompts,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(cnt - 1) AS BIGINT) AS dup_prompts,
       CAST(sum(cnt - 1) * d AS BIGINT) AS saved_tokens,
       CAST(max(cnt) AS BIGINT) AS max_group,
       CAST({_milli_sql('sum(cnt - 1)', 'sum(cnt)')} AS BIGINT)
         AS saved_share_milli
FROM groups GROUP BY d
"""


@register("q340_prefix_cache_savings", _Q340_ORACLE)
def q340(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-CACHE SAVINGS audit — the capacity-planning query behind
    radix-tree / prefix KV-cache serving (vLLM automatic prefix
    caching, SGLang RadixAttention): at depth d, every prompt sharing
    its first d tokens with an earlier prompt re-uses the cached KV
    block, so the savable token count is (group_size − 1)·d summed
    over prefix groups. Reported per depth ∈ {depths} with group
    counts, the largest shared-prefix family, and the savable share.

    Scale: the depth frame (3 rows) broadcasts into a nested-loop
    fan-out; the prefix key is hashed ROW-LOCALLY (md5 of the joined
    d-token slice — shuffles carry 32-char digests, never prompt
    text), and each depth is one map-side-partial groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("nt"))
    ds = spark.createDataFrame([(d,) for d in _Q340_DEPTHS], "d long")
    fanned = base.join(
        F.broadcast(ds), F.col("nt") >= F.col("d")
    ).select(
        "d",
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.col("toks"), 1, F.col("d").cast("int")), " ")
        ).alias("pref"),
    )
    groups = fanned.groupBy("d", "pref").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        groups.groupBy("d")
        .agg(
            F.sum("cnt").cast("long").alias("n_prompts"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.col("cnt") - 1).cast("long").alias("dup_prompts"),
            F.max("cnt").cast("long").alias("max_group"),
            _milli_col("sum(cnt - 1)", "sum(cnt)").alias(
                "saved_share_milli"
            ),
        )
        .select(
            F.col("d").cast("long").alias("depth"),
            "n_prompts",
            "n_groups",
            "dup_prompts",
            (F.col("dup_prompts") * F.col("d")).cast("long").alias(
                "saved_tokens"
            ),
            "max_group",
            "saved_share_milli",
        )
    )


q340.__doc__ = q340.__doc__.format(depths=_Q340_DEPTHS)


# ---------------------------------------------------------------------------
# q341 — crowd-label aggregation: majority vote + one quality-weighted step
# ---------------------------------------------------------------------------

_Q341_ORACLE = f"""
WITH ann AS (
  SELECT event_id // 5 AS item_id,
         event_id % 5 AS worker_id,
         CAST(props->>'$.k' AS BIGINT) % 3 AS label
  FROM events
), votes AS (
  SELECT item_id, label, count(*) AS c FROM ann GROUP BY item_id, label
), maj AS (
  SELECT item_id, label AS maj_label
  FROM (SELECT item_id, label,
               row_number() OVER (PARTITION BY item_id
                                  ORDER BY c DESC, label) AS rn
        FROM votes) t
  WHERE rn = 1
), acc AS (
  SELECT a.worker_id,
         count(*) AS n_annot,
         sum(CASE WHEN a.label = m.maj_label THEN 1 ELSE 0 END)
           AS n_agree_maj,
         {_milli_sql(
             'sum(CASE WHEN a.label = m.maj_label THEN 1 ELSE 0 END)',
             'count(*)'
         )} AS acc_milli
  FROM ann a JOIN maj m USING (item_id)
  GROUP BY a.worker_id
), wvotes AS (
  SELECT a.item_id, a.label, sum(c.acc_milli) AS wsum
  FROM ann a JOIN acc c USING (worker_id)
  GROUP BY a.item_id, a.label
), wlab AS (
  SELECT item_id, label AS w_label
  FROM (SELECT item_id, label,
               row_number() OVER (PARTITION BY item_id
                                  ORDER BY wsum DESC, label) AS rn
        FROM wvotes) t
  WHERE rn = 1
)
SELECT a.worker_id,
       CAST(count(*) AS BIGINT) AS n_annot,
       CAST(sum(CASE WHEN a.label = m.maj_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree_maj,
       CAST(max(c.acc_milli) AS BIGINT) AS acc_milli,
       CAST(sum(CASE WHEN a.label = w.w_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree_weighted
FROM ann a
JOIN maj m USING (item_id)
JOIN wlab w USING (item_id)
JOIN acc c USING (worker_id)
GROUP BY a.worker_id
"""


@register("q341_dawid_skene_vote", _Q341_ORACLE)
def q341(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROWD-LABEL AGGREGATION with one quality-weighted refinement —
    the first EM step of Dawid-Skene (1979), the estimator behind
    every RLHF/annotation QA pipeline: (1) majority vote per item
    (ties to the smallest label — deterministic), (2) score each
    worker's accuracy against the majority as an exact milli ratio,
    (3) re-vote with workers weighted by that accuracy, (4) report per
    worker how often they agree with the majority vs the weighted
    consensus. Annotations are the logged grid (item = event id div 5,
    worker = event id mod 5, label = k mod 3).

    Scale: three shuffles all keyed on item_id (vote count, weighted
    vote, final compare — co-partitioned, AQE coalesces), one keyed on
    worker_id; the worker-accuracy table is |workers| rows and
    broadcast into the re-vote."""
    ev = load_table(spark, sf_dir, "events")
    ann = ev.select(
        F.expr("event_id div 5").alias("item_id"),
        (F.col("event_id") % 5).alias("worker_id"),
        (F.get_json_object("props", "$.k").cast("long") % 3).alias("label"),
    )
    votes = ann.groupBy("item_id", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    # asc_nulls_last on the label tiebreaks: parity with the oracle's
    # default ASC NULLS LAST if a malformed props row yields NULL
    wv = Window.partitionBy("item_id").orderBy(
        F.desc("c"), F.asc_nulls_last("label")
    )
    maj = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("item_id", F.col("label").alias("maj_label"))
    )
    # acc is |workers| rows and feeds TWO consumers (the weighted
    # re-vote and the final compare); pin it once so the events scan
    # + majority-vote subtree beneath it runs a single time (the
    # q282/q338 multi-consumer rule — maj itself is item-scale, i.e.
    # data-proportional, so it is deliberately NOT pinned)
    acc = (
        ann.join(maj, "item_id")
        .groupBy("worker_id")
        .agg(
            F.count(F.lit(1)).alias("n_annot"),
            F.sum((F.col("label") == F.col("maj_label")).cast("long")).alias(
                "n_agree_maj"
            ),
            _milli_col(
                "sum(CASE WHEN label = maj_label THEN 1 ELSE 0 END)",
                "count(*)",
            ).alias("acc_milli"),
        )
        .transform(_pin)
    )
    wvotes = (
        ann.join(F.broadcast(acc.select("worker_id", "acc_milli")), "worker_id")
        .groupBy("item_id", "label")
        .agg(F.sum("acc_milli").alias("wsum"))
    )
    ww = Window.partitionBy("item_id").orderBy(
        F.desc("wsum"), F.asc_nulls_last("label")
    )
    wlab = (
        wvotes.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
        .select("item_id", F.col("label").alias("w_label"))
    )
    return (
        ann.join(maj, "item_id")
        .join(wlab, "item_id")
        .join(F.broadcast(acc.select("worker_id", "acc_milli")), "worker_id")
        .groupBy("worker_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_annot"),
            F.sum((F.col("label") == F.col("maj_label")).cast("long"))
            .cast("long")
            .alias("n_agree_maj"),
            F.max("acc_milli").cast("long").alias("acc_milli"),
            F.sum((F.col("label") == F.col("w_label")).cast("long"))
            .cast("long")
            .alias("n_agree_weighted"),
        )
    )


# ---------------------------------------------------------------------------
# q342 — speculative-decoding acceptance audit
# ---------------------------------------------------------------------------

# pinned portable md5 hash of the event id (the corpus_queries
# checksum idiom — the q299 LCG's low bits are periodic mod small
# powers of two) drives the synthetic accept/reject log: ~3/4 of
# draft positions accept
_Q342_HASH_SQL = "('0x' || substring(md5(event_id::VARCHAR), 1, 6))::BIGINT"

_Q342_ORACLE = f"""
WITH drafts AS (
  SELECT event_id // 10 AS request_id,
         event_id % 10 AS pos,
         CASE WHEN ({_Q342_HASH_SQL}) % 4 = 0 THEN 0 ELSE 1 END
           AS accepted
  FROM events
), runs AS (
  SELECT request_id,
         coalesce(min(CASE WHEN accepted = 0 THEN pos END), 10)
           AS run_len,
         count(*) AS n_pos
  FROM drafts GROUP BY request_id
), full_runs AS (
  SELECT run_len FROM runs WHERE n_pos = 10
), hist AS (
  SELECT run_len, count(*) AS n_requests,
         sum(count(*)) OVER (ORDER BY run_len
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(count(*)) OVER () AS total
  FROM full_runs GROUP BY run_len
)
SELECT CAST(run_len AS BIGINT) AS run_len,
       CAST(n_requests AS BIGINT) AS n_requests,
       CAST({_milli_sql('n_requests', 'total')} AS BIGINT) AS share_milli,
       CAST({_milli_sql('cum', 'total')} AS BIGINT) AS cum_share_milli
FROM hist
"""


@register("q342_specdecode_accept", _Q342_ORACLE)
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECULATIVE-DECODING acceptance audit — the distribution every
    draft-model deployment is tuned by (Leviathan et al. 2023): per
    verify step the target model accepts a PREFIX of the 10-token
    draft, so the accepted-run length is the position of the first
    rejection (10 if none). The audit emits the run-length histogram
    with exact milli shares and the cumulative curve — the direct
    input to expected-speedup = E[run_len]+1 per target pass.
    Accept/reject comes from a pinned md5 hash of the event id (the
    corpus_queries checksum idiom), never engine RNG.

    Scale: one scan, one shuffle keyed request_id for the per-request
    min-position fold (map-side partial min), then an 11-row
    histogram; the cumulative share is a window over those 11 rows."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    drafts = ev.select(
        F.expr("event_id div 10").alias("request_id"),
        (F.col("event_id") % 10).alias("pos"),
        (h % 4 != 0).cast("long").alias("accepted"),
    )
    runs = drafts.groupBy("request_id").agg(
        F.coalesce(
            F.min(F.when(F.col("accepted") == 0, F.col("pos"))), F.lit(10)
        ).alias("run_len"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    hist = (
        runs.filter(F.col("n_pos") == 10)
        .groupBy("run_len")
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )
    wcum = Window.orderBy("run_len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    return hist.select(
        F.col("run_len").cast("long").alias("run_len"),
        F.col("n_requests").cast("long").alias("n_requests"),
        F.sum("n_requests").over(wcum).alias("cum"),
        F.sum("n_requests").over(wtot).alias("total"),
    ).select(
        "run_len",
        "n_requests",
        _milli_col("n_requests", "total").alias("share_milli"),
        _milli_col("cum", "total").alias("cum_share_milli"),
    )


# ---------------------------------------------------------------------------
# q343 — semantic query-cache hit audit
# ---------------------------------------------------------------------------

_Q343_TAU_NANO = 150_000_000  # cosine ≥ 0.15 counts as a cache hit

_Q343_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> round(x * 1000000)) AS e
  FROM embeddings
), hits AS (
  SELECT a.label, a.vec_id AS q, b.vec_id AS provider
  FROM v a JOIN v b
    ON a.label = b.label AND b.vec_id < a.vec_id
  WHERE {_Q337_COS_NANO.format(a="a.e", b="b.e")} >= {_Q343_TAU_NANO}
), per_label AS (
  SELECT label, count(DISTINCT q) AS n_hits,
         count(DISTINCT provider) AS n_providers
  FROM hits GROUP BY label
), base AS (
  SELECT label, count(*) AS n_queries FROM v GROUP BY label
)
SELECT b.label,
       CAST(b.n_queries AS BIGINT) AS n_queries,
       CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
       CAST({_milli_sql('coalesce(p.n_hits, 0)', 'b.n_queries')} AS BIGINT)
         AS hit_rate_milli,
       CAST(coalesce(p.n_providers, 0) AS BIGINT) AS n_providers
FROM base b LEFT JOIN per_label p USING (label)
"""


@register("q343_semantic_cache_hits", _Q343_ORACLE)
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC QUERY-CACHE hit audit — the sizing query for an
    embedding-keyed response cache (GPTCache-style): replaying the
    query stream in arrival order (vec_id), a query is a HIT if any
    EARLIER query in its ANN bucket is within cosine ≥ {tau}; the
    per-bucket hit rate bounds the achievable cache offload and the
    provider count sizes the retained entry set.

    Scale: candidate pairing is confined to the ANN coarse cell
    (label — the q337/q114 contract; at 100 TB the cell is an LSH or
    IVF bucket), so the quadratic never crosses cells and runs as ONE
    Arrow-batched numpy matmul per cell (the q114 scale path) that
    emits a single summary row — the pair frame never materializes.
    The threshold decision happens on engine-exact nano integers
    (micro-quantized vectors, the _Q337_COS_NANO note); the 2^53
    exactness precondition is pinned by
    test_q337_q343_exactness_precondition."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    tau = _Q343_TAU_NANO

    def cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        lab = int(pdf["label"].iloc[0])
        if n < 2:
            return pd.DataFrame(
                {"label": [lab], "n_queries": [n], "n_hits": [0],
                 "n_providers": [0]}
            )
        order = np.argsort(pdf["vec_id"].to_numpy())
        M = np.stack(pdf["e"].to_numpy()[order]).astype(
            np.float64, copy=False
        )
        nano = _nano_pair_scores(M)
        # provider strictly earlier than the query in arrival order:
        # the strict lower triangle (rows = queries, cols = providers)
        hit = np.tril(nano >= tau, k=-1)
        return pd.DataFrame(
            {
                "label": [lab],
                "n_queries": [n],
                "n_hits": [int(hit.any(axis=1).sum())],
                "n_providers": [int(hit.any(axis=0).sum())],
            }
        )

    # NULL-bucket rows can never hit (the oracle's equi-join skips
    # NULL = NULL) but DO count as queries in its base CTE — keep them
    # out of the pandas scorer (int cast would crash) and union their
    # zero-hit summary row back
    stats = (
        emb.filter(F.col("label").isNotNull())
        .groupBy("label")
        .applyInPandas(
            cell_stats,
            "label int, n_queries long, n_hits long, n_providers long",
        )
    )
    null_bucket = (
        emb.filter(F.col("label").isNull())
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_queries"))
        .select(
            "label",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.lit(0).cast("long").alias("n_hits"),
            F.lit(0).cast("long").alias("n_providers"),
        )
    )
    return stats.unionByName(null_bucket).select(
        "label",
        "n_queries",
        "n_hits",
        _milli_col("n_hits", "n_queries").alias("hit_rate_milli"),
        "n_providers",
    )


q343.__doc__ = q343.__doc__.format(tau="0.15")
