"""Deduplication operators for training-data pipelines (SURVEY.md §7
Phase 4): exact, MinHash+LSH near-dup, SimHash, and n-gram Jaccard.

Scale posture: every variant is a groupBy/join pipeline whose shuffle
keys are short hashes, never raw documents. At 100 TB the text column
stays columnar in parquet until the final candidate-pair verification;
signatures (a few hundred bytes/doc) are what moves through shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via hash-groupBy on the normalized text: one
    representative (min id) per group plus the duplicate count.

    Map-side partial agg means the shuffle carries (hash(text) → min id,
    count) pairs, not documents. Deterministic keeper choice (min id)
    instead of dropDuplicates' arbitrary first-row.
    """
    return (
        df.groupBy(normalize_text(text_col).alias("norm_text"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def minhash_signature(
    text: Column | str, num_hashes: int = 64, k: int = 3
) -> Column:
    """MinHash signature: for seed s in 0..n-1, min over shingles of
    xxhash64(shingle, seed). Entirely within-row array algebra — the
    signature computation is embarrassingly parallel and codegen'd.

    xxhash64's seed parameter gives the independent hash family; no
    Python, no UDF.
    """
    sh = shingles(text, k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda x: F.xxhash64(x, s))
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows of
    ``num_hashes/bands`` values, hash each band to a bucket, and emit
    candidate pairs that share any (band, bucket).

    The shuffle key is (band_idx, bucket_hash) — 16 bytes/doc/band.
    Hot buckets (boilerplate docs) are the skew risk; AQE skew-join
    splitting handles them, and the band hash's 64-bit range keeps
    accidental collisions rare.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col, num_hashes, k).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash64(text: Column | str, bits: int = 64) -> Column:
    """SimHash over tokens: per bit position, majority vote of the
    token hashes' bits, packed into one long. Within-row algebra
    (bits × |tokens| bit ops per doc, all codegen'd). Bit positions are
    unrolled as Python ints because the shift builtins take literal
    shift amounts."""
    hs = F.transform(tokens(normalize_text(text)), lambda t: F.xxhash64(t))
    n = F.size(hs)

    def _bit_counter(j: int):
        # closure factory: the merge lambda must be exactly 2-ary for
        # the higher-order function binding, so j is captured, not a
        # default parameter
        return lambda acc, h: acc + F.shiftrightunsigned(h, j).bitwiseAND(
            F.lit(1).cast("long")
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        ones = F.aggregate(hs, F.lit(0).cast("long"), _bit_counter(j))
        bit = F.when(ones * 2 >= n, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = out.bitwiseOR(F.shiftleft(bit, j))
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = (),
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """n-gram Jaccard near-dup: explode distinct shingles, self-join on
    shingle (plus optional blocking columns to bound the pair space),
    count intersections, and compute |A∩B| / (|A|+|B|-|A∩B|).

    The explode → join on shingle IS the inverted index: identical to
    a posting-list intersection, executed as one shuffle on shingle.
    Blocking columns (e.g. language) keep hot shingles from exploding
    the candidate space at corpus scale.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in block_cols],
        shingles(text_col, k).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    sizes = base.select("doc_id", "n_sh")
    posting = base.select(
        "doc_id", *block_cols, F.explode("sh").alias("shingle")
    )
    joined = (
        posting.alias("l")
        .join(
            posting.alias("r"),
            [F.col(f"l.{c}") == F.col(f"r.{c}") for c in block_cols]
            + [
                F.col("l.shingle") == F.col("r.shingle"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    with_sizes = (
        joined.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
    )
    return with_sizes.select(
        "doc_a",
        "doc_b",
        (
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
