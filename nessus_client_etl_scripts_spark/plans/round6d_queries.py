"""Round-6 tenth wave — q177…q179: pair-mining and feature-
engineering verbs a training-data pipeline still needs.

- q177 margin-based mutual-kNN pair mining (the bitext-mining verb of
  Artetxe & Schwenk 2019: score(x, y) = cos(x, y) normalized by the
  mean cosine of each side's k nearest neighbours, keep mutual best
  matches) — the alignment step that builds parallel-pair corpora.
- q178 leave-one-out target encoding with additive smoothing — the
  classical ML feature-engineering verb, leakage-safe by construction
  (each row's own target is subtracted from its group statistic; the
  q167 leakage theme applied to features instead of splits).
- q179 perceptual image dedup via dHash over the REAL PPM decode path
  — near-duplicate image detection as decode → integer difference
  hash → groupBy, value-proven end to end through the actual codec
  (the q105 proof upgraded from "roundtrip stats" to a full dedup
  verdict).

Float portability per PLANS.md: q177 quantizes embeddings to exact
integers (floor(x·4096), the q39/q176 rule) so every dot product and
norm is an exact integer; each emitted score is then a fixed chain of
correctly-rounded IEEE ops (sqrt/ mul/ div/ round) identical in both
engines. q178 emits exact integer cents plus micro-rounded divisions
of exact integer moments. q179 is integer-only end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .testdata_queries import register

# ---------------------------------------------------------------------------
# q177 — margin-based mutual-kNN pair mining (bitext-mining shape)
# ---------------------------------------------------------------------------

_Q177_SCALE = 4096.0
_Q177_K = 4

_Q177_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> floor(x * {_Q177_SCALE!r})) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v, list_dot_product(v, v) AS nv FROM e
), a AS (
  SELECT vec_id AS a_id, v AS av, nv AS na FROM n WHERE vec_id % 2 = 0
), b AS (
  SELECT vec_id AS b_id, v AS bv, nv AS nb FROM n WHERE vec_id % 2 = 1
), p AS (
  SELECT a_id, b_id,
         CAST(round(1000000000000.0
              * (list_dot_product(av, bv) / (sqrt(na) * sqrt(nb))))
              AS BIGINT) AS cos_pico
  FROM a CROSS JOIN b
), ranked AS (
  SELECT a_id, b_id, cos_pico,
         row_number() OVER (PARTITION BY a_id
                            ORDER BY cos_pico DESC, b_id) AS ra,
         row_number() OVER (PARTITION BY b_id
                            ORDER BY cos_pico DESC, a_id) AS rb
  FROM p
), sa AS (
  SELECT a_id, SUM(cos_pico) AS sa_pico FROM ranked
  WHERE ra <= {_Q177_K} GROUP BY a_id
), sb AS (
  SELECT b_id, SUM(cos_pico) AS sb_pico FROM ranked
  WHERE rb <= {_Q177_K} GROUP BY b_id
)
SELECT r.a_id, r.b_id, r.cos_pico,
       sa.sa_pico, sb.sb_pico,
       CAST(round(1000000.0 * (({2 * _Q177_K} * r.cos_pico)
            / (sa.sa_pico + sb.sb_pico))) AS BIGINT) AS margin_micro
FROM ranked r
JOIN sa USING (a_id) JOIN sb USING (b_id)
WHERE r.ra = 1 AND r.rb = 1
"""


@register("q177_margin_bitext_mine", _Q177_ORACLE)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mutual-kNN pair mining (the CCMatrix/LASER
    bitext-mining verb): two corpus sides (here the even/odd vec_id
    halves standing in for two languages), cosine kNN in BOTH
    directions, and a pair survives iff each side is the other's
    nearest neighbour; its margin score divides the pair cosine by
    the mean of the two sides' k-NN cosines, down-weighting hubs that
    are "near everything".

    Float rule: embeddings quantize to exact integers
    (floor(x·4096) — the q39/q176 rule), so dot products and norms
    are exact; cos_pico = round(1e12·num/(√na·√nb)) is a fixed
    4-op IEEE chain, the k-NN sums are exact integer sums of pico
    values, and the margin is ONE division of exact integers scaled
    and rounded — every step bit-equal in Spark and DuckDB.

    Scale: the candidate pair frame is the pluggable stage — here the
    exact cross of the two sides (the oracle-checkable baseline, like
    q27 vs q32); at 100 TB you feed the SAME ranking/margin algebra
    from LSH-bucketed candidates (q28/q95's path) so each side only
    meets its bucket. The two row_number windows partition on the
    high-cardinality pair endpoints — no low-cardinality funnel — and
    the kNN sums shuffle 16-byte (id, pico) pairs, never vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x * F.lit(_Q177_SCALE)).cast("double"),
    )
    n = emb.select(
        "vec_id",
        vq.alias("v"),
    ).withColumn(
        "nv",
        F.aggregate(
            F.zip_with("v", "v", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    a = n.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nv").alias("na"),
    )
    b = n.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nv").alias("nb"),
    )
    num = F.aggregate(
        F.zip_with("av", "bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(F.broadcast(b))
        .withColumn(
            "cos_pico",
            F.round(
                F.lit(1e12)
                * (num / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))))
            ).cast("long"),
        )
        .select("a_id", "b_id", "cos_pico")
    )
    ranked = pairs.withColumn(
        "ra",
        F.row_number().over(
            Window.partitionBy("a_id").orderBy(
                F.desc("cos_pico"), F.asc("b_id")
            )
        ),
    ).withColumn(
        "rb",
        F.row_number().over(
            Window.partitionBy("b_id").orderBy(
                F.desc("cos_pico"), F.asc("a_id")
            )
        ),
    )
    sa = (
        ranked.filter(F.col("ra") <= _Q177_K)
        .groupBy("a_id")
        .agg(F.sum("cos_pico").alias("sa_pico"))
    )
    sb = (
        ranked.filter(F.col("rb") <= _Q177_K)
        .groupBy("b_id")
        .agg(F.sum("cos_pico").alias("sb_pico"))
    )
    return (
        ranked.filter((F.col("ra") == 1) & (F.col("rb") == 1))
        .join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            "cos_pico",
            "sa_pico",
            "sb_pico",
            F.round(
                F.lit(1e6)
                * (
                    (F.lit(2 * _Q177_K) * F.col("cos_pico"))
                    / (F.col("sa_pico") + F.col("sb_pico"))
                )
            )
            .cast("long")
            .alias("margin_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q178 — leave-one-out target encoding with additive smoothing
# ---------------------------------------------------------------------------

_Q178_M = 20  # smoothing pseudo-count

_Q178_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), g AS (
  SELECT priority, SUM(cents) AS s_g, count(*) AS n_g
  FROM o GROUP BY priority
), tot AS (
  SELECT SUM(cents) AS s_all, count(*) AS n_all FROM o
)
SELECT o.o_orderkey, o.priority, o.cents,
       CAST(g.n_g AS BIGINT) AS n_g,
       CAST(round(1000000.0
            * ((g.s_g - o.cents) / CAST(g.n_g - 1 AS DOUBLE)))
            AS BIGINT) AS loo_micro,
       CAST(round(1000000.0
            * (((g.s_g - o.cents)
                + {_Q178_M} * (CAST(t.s_all AS DOUBLE) / t.n_all))
               / CAST(g.n_g - 1 + {_Q178_M} AS DOUBLE)))
            AS BIGINT) AS smooth_micro
FROM o JOIN g USING (priority) CROSS JOIN tot t
"""


@register("q178_target_encoding", _Q178_ORACLE)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the ML
    feature-engineering verb: each order's priority is replaced by
    the mean target (order value, exact cents) of the OTHER rows in
    its priority group, shrunk toward the global mean by m pseudo-
    counts. Subtracting the row's own target makes the feature
    leakage-safe by construction (q167's theme at the feature grain).

    Exactness: cents, group sums and counts are exact integers;
    loo = (S_g − y)/(n_g − 1) is one correctly-rounded division of
    exact integers; the smoothed variant adds one global-mean
    division and one fused multiply-add-free chain written
    identically in both engines — then micro-rounded.

    Scale: ONE partial-combine aggregation to |priorities| group
    rows, broadcast back into a row-local projection — no row-frame
    shuffle at all; adding more encoded columns costs more counters,
    not more scans."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    g = o.groupBy("priority").agg(
        F.sum("cents").alias("s_g"), F.count("*").alias("n_g")
    )
    tot = o.agg(
        F.sum("cents").alias("s_all"), F.count("*").alias("n_all")
    )
    gmean = F.col("s_all").cast("double") / F.col("n_all")
    return (
        o.join(F.broadcast(g), "priority")
        .join(F.broadcast(tot))
        .select(
            "o_orderkey",
            "priority",
            "cents",
            F.col("n_g").cast("long").alias("n_g"),
            F.round(
                F.lit(1e6)
                * (
                    (F.col("s_g") - F.col("cents"))
                    / (F.col("n_g") - 1).cast("double")
                )
            )
            .cast("long")
            .alias("loo_micro"),
            F.round(
                F.lit(1e6)
                * (
                    (
                        (F.col("s_g") - F.col("cents"))
                        + F.lit(_Q178_M) * gmean
                    )
                    / (F.col("n_g") - 1 + _Q178_M).cast("double")
                )
            )
            .cast("long")
            .alias("smooth_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q179 — perceptual image dedup: dHash over the REAL PPM decode path
# ---------------------------------------------------------------------------

_Q179_ORACLE = """
WITH d AS (
  SELECT doc_id, n_chars, 6 + (n_chars % 5) * 2 AS h FROM documents
), px AS (
  SELECT doc_id, h, n_chars, unnest(range(0, 24 * h)) AS i FROM d
), gray AS (
  SELECT doc_id, h, (i // 3) // 8 AS row, (i // 3) % 8 AS col,
         SUM((n_chars + i) % 256) AS gs
  FROM px GROUP BY doc_id, h, (i // 3) // 8, (i // 3) % 8
), bsum AS (
  SELECT doc_id, (8 * row + 7) // h AS band, col, SUM(gs) AS g
  FROM gray GROUP BY doc_id, (8 * row + 7) // h, col
), grid AS (
  SELECT d.doc_id, b.band, c.col, coalesce(s.g, 0) AS g
  FROM d
  CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
  CROSS JOIN (SELECT unnest(range(0, 8)) AS col) c
  LEFT JOIN bsum s
    ON s.doc_id = d.doc_id AND s.band = b.band AND s.col = c.col
), hash AS (
  SELECT lo.doc_id,
         SUM(CASE WHEN lo.g < hi.g
             THEN (1::BIGINT << (lo.band * 8 + lo.col))
             ELSE 0 END) AS dhash
  FROM grid lo
  JOIN grid hi ON hi.doc_id = lo.doc_id
             AND hi.band = lo.band + 1 AND hi.col = lo.col
  WHERE lo.band < 7
  GROUP BY lo.doc_id
)
SELECT hash.doc_id AS media_id, hash.dhash,
       CAST(10 + length(CAST(d.h AS VARCHAR)) + 24 * d.h AS BIGINT)
         AS n_bytes,
       CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT)
         AS group_size,
       hash.doc_id = MIN(hash.doc_id) OVER (PARTITION BY dhash)
         AS keep
FROM hash JOIN d ON d.doc_id = hash.doc_id
"""


@register("q179_image_dhash_dedup", _Q179_ORACLE)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: every document renders its q105
    gradient image, is ENCODED to real binary-PPM bytes, decoded back
    by the native P6 parser inside :func:`image_dhash`, and reduced
    to a 56-bit integer difference hash (integer band pooling +
    neighbour comparisons — no float anywhere); images sharing a hash
    form a duplicate group and the smallest media_id is kept. The
    DuckDB twin replays the hash in closed form from the gradient
    formula, so a bug in EITHER codec direction or in the band/bit
    packing breaks the value hash — this upgrades q105's roundtrip
    proof to a full dedup verdict (dHash ≅ the multimodal analogue of
    q25's text fingerprint).

    Scale: pixels never shuffle — the mapInPandas stage emits 24
    bytes per image; dedup is ONE groupBy on the hash (map-side
    combine) joined back for the verdict. Near-dup (Hamming ≤ t)
    upgrades reuse q103's band-bucketing on the same hash column."""
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        image_dhash,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )

    def render(batches):
        for pdf in batches:
            rows = []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                h = 6 + int(nc) % 5 * 2
                n_px = 8 * h * 3
                arr = (
                    ((int(nc) + np.arange(n_px)) % 256)
                    .astype(np.uint8)
                    .reshape(h, 8, 3)
                )
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "meta": {
                            "width": 8,
                            "height": h,
                            "channels": 3,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": "ppm",
                        },
                        "content": encode_ppm(arr),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA]
            )

    media = docs.mapInPandas(render, MEDIA_SCHEMA)
    hashed = image_dhash(media, codec="ppm")
    groups = hashed.groupBy("dhash").agg(
        F.count("*").cast("long").alias("group_size"),
        F.min("media_id").alias("_canon"),
    )
    return hashed.join(groups, "dhash").select(
        "media_id",
        "dhash",
        "n_bytes",
        "group_size",
        (F.col("media_id") == F.col("_canon")).alias("keep"),
    )
