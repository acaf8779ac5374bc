"""Similarity search over embedding columns (SURVEY.md §7 Phase 4).

Two tiers:
- Brute-force cosine top-k — the exact baseline. Query side broadcast,
  corpus side streamed: no shuffle of the corpus at all, so it scales
  to any corpus size as long as the query set stays broadcast-able.
- LSH-bucketed (random hyperplane / SimHash-for-vectors) — the scale
  path: sign-bit sketch → bucket equi-join, probing only same-bucket
  corpus vectors. Trades recall for a candidate set ~1/2^bits the size.

All vector math is within-row array algebra on ``array<float>`` cast to
double (zip_with product + left-fold sum — sequential, deterministic,
matching DuckDB's list_dot_product semantics for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic float order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: broadcast the query set against the corpus and rank
    per query. Output: (query_id, neighbor_id, score, rank).

    The corpus never shuffles — each task scans its partition once per
    plan, scoring |queries| vectors per row. The per-query rank window
    shuffles only (query_id, neighbor_id, score) triples.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    score = (
        cosine(F.col("qv"), F.col("cv"))
        if metric == "cosine"
        else -l2_distance(F.col("qv"), F.col("cv"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplanes(bits: int, dim: int, seed: int = 0x5EED) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, generated ONCE on the
    driver. Components ship to executors as folded literal arrays —
    they are row-independent, so computing them inside a row expression
    (the earlier form hashed (j·dim+i) per row per bit per component)
    was pure waste."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def hyperplane_sketch(vec: Column | str, bits: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane sign sketch: bit j = sign(v · h_j), h_j a
    deterministic literal array (reproducible across runs/executors,
    no per-row hyperplane recomputation).

    Pass an ALREADY-MATERIALIZED double-array column attribute: lambda
    bodies re-evaluate non-attribute expressions per element × per bit
    (see dedup.shingles_from_tokens for the rule)."""
    v = _as_double(vec)
    out = F.lit(0).cast("long")
    for j, plane in enumerate(_hyperplanes(bits, dim)):
        h = F.array(*[F.lit(x) for x in plane])  # constant-folded
        dotp = F.aggregate(
            F.zip_with(v, h, lambda x, y: F.coalesce(x * y, F.lit(0.0))),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bit = F.when(dotp >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        out = out.bitwiseOR(F.shiftleft(bit, j))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on the hyperplane bucket, exact
    cosine within the bucket. At 100 TB the bucket key shrinks the
    candidate pair space by ~2^bits; multi-probe (flipping one bit) can
    recover recall — left as a parameter sweep for tuning."""
    # stage the double-cast vector first; the sketch reads the staged
    # attribute so the cast-transform runs once, not per bit×component
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).select("query_id", "qv", hyperplane_sketch(F.col("qv"), bits).alias("bucket"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).select("neighbor_id", "cv", hyperplane_sketch(F.col("cv"), bits).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed search
# ---------------------------------------------------------------------------


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iterations in pure DataFrame algebra →
    (centroid_id, centroid array<double>).

    - init: the n_centroids rows with the smallest xxhash64(id) — a
      deterministic pseudo-random sample, no driver-side RNG state;
    - assign: broadcast the centroid table, pick argmin L2 per vector
      (a window over corpus×centroids, centroids side tiny);
    - update: element-wise mean via posexplode → groupBy(centroid,
      dim) → avg → collect_list ordered by dim. At 100 TB the shuffle
      carries (centroid, dim, partial sum/count) — dim×k cells per map
      partition, independent of corpus size.

    Fixed iteration count (no convergence test) keeps the plan static
    and the result reproducible.
    """
    v = corpus.select(
        F.col(id_col).alias("_vid"), _as_double(vec_col).alias("v")
    )
    cents = (
        v.withColumn("_h", F.xxhash64("_vid"))
        .orderBy("_h", "_vid")
        .limit(n_centroids)
        .select(
            (F.row_number().over(Window.orderBy("_h", "_vid")) - 1).alias(
                "centroid_id"
            ),
            F.col("v").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = assign_to_centroids(v, cents, vec_attr="v", id_attr="_vid")
        comps = assigned.join(v, "_vid").select(
            "centroid_id", F.posexplode("v").alias("dim", "x")
        )
        cents = (
            comps.groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("dm"), lambda s: s.getField("m")).alias(
                    "centroid"
                ),
            )
        )
    return cents


def assign_to_centroids(
    vecs: DataFrame,
    centroids: DataFrame,
    vec_attr: str = "v",
    id_attr: str = "_vid",
    nprobe: int = 1,
) -> DataFrame:
    """(id, centroid_id[, probe_rank]) — the nprobe nearest centroids
    per vector. Centroid table broadcasts; the rank window shuffles
    only (id, centroid_id, dist) triples."""
    scored = vecs.join(F.broadcast(centroids)).select(
        id_attr,
        "centroid_id",
        l2_distance(F.col(vec_attr), F.col("centroid")).alias("_d"),
    )
    w = Window.partitionBy(id_attr).orderBy("_d", "centroid_id")
    ranked = scored.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= nprobe
    )
    return ranked.select(id_attr, "centroid_id")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed under their
    nearest coarse centroid (the inverted file); each query probes its
    nprobe nearest centroids and scores exact cosine only within those
    buckets. nprobe = n_centroids degrades gracefully to brute force
    (the recall/test anchor); small nprobe prunes the candidate space
    to ~nprobe/n_centroids of the corpus.
    """
    cents = kmeans_centroids(corpus, n_centroids, iters, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c_assign = assign_to_centroids(
        c, cents, vec_attr="cv", id_attr="neighbor_id", nprobe=1
    )
    q_probe = assign_to_centroids(
        q, cents, vec_attr="qv", id_attr="query_id", nprobe=nprobe
    )
    candidates = (
        c_assign.join(q_probe, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        candidates.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
