"""Deterministic sampling and dataset-splitting operators for
training-data pipelines.

Real corpus pipelines never use ``rand()`` for train/val/test splits:
the assignment must be (a) stable under re-partitioning and re-runs,
(b) reproducible from the row's identity alone, and (c) disjoint across
splits. The standard construction is a salted content-hash mapped to
the unit interval — implemented here as PURE INTEGER comparisons
against precomputed 48-bit thresholds (no float division at all), from
the same md5-truncation primitive as the dedup/sketch family, so every
assignment is bit-identical in any engine that has md5.

Scale shape: split assignment is row-local column algebra (zero
shuffle, survives any partitioning); per-group sampling reuses
``two_phase_rank`` so a handful of group values never funnels the
table into a handful of tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 48  # 12 hex chars of md5


def _u48(key: Column, salt: str) -> Column:
    """Salted 48-bit uniform hash of the key — the split coordinate."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(split_name, upper_bound) pairs: cumulative weights scaled to the
    48-bit hash space, floored — driver-computed literals any engine can
    compare against. The last bound is forced to 2^48 so rounding never
    leaves an unassigned sliver."""
    total = sum(weights.values())
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    for i, (name, w) in enumerate(weights.items()):
        cum += w / total
        hi = HASH_SPACE if i == len(weights) - 1 else int(cum * HASH_SPACE)
        bounds.append((name, hi))
    return bounds


def split_assign(
    key: Column, weights: dict[str, float], salt: str = "split-v1"
) -> Column:
    """Split label for a row: first threshold the salted hash falls
    under. Row-local, shuffle-free, stable across runs and engines."""
    u = _u48(key, salt)
    expr: Column | None = None
    for name, hi in split_thresholds(weights):
        cond = u < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def split_assign_sql(
    key_sql: str, weights: dict[str, float], salt: str = "split-v1"
) -> str:
    """DuckDB twin of :func:`split_assign` — same salt, same md5
    truncation, same integer thresholds."""
    u = (
        f"('0x' || substring(md5('{salt}' || ({key_sql})::VARCHAR), 1, 12))"
        "::BIGINT"
    )
    branches = " ".join(
        f"WHEN {u} < {hi} THEN '{name}'"
        for name, hi in split_thresholds(weights)
    )
    return f"CASE {branches} END"


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Append the deterministic split label keyed on ``key_col``."""
    return df.withColumn(
        out_col, split_assign(F.col(key_col), weights, salt)
    )


def group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic uniform sample of ``k`` rows per group: rank rows
    by salted content hash inside each group and keep the first ``k``.
    Uses :func:`two_phase_rank` so a low-cardinality ``group_col`` (the
    common case — a handful of sources/languages) still spreads the
    ranking across all cores instead of one task per group; md5 ties
    are broken by ``key_col`` inside the rank, so the sample is unique
    and reproducible."""
    from .windows import two_phase_rank

    hashed = df.withColumn("_skey", _u48(F.col(key_col), salt))
    ranked = two_phase_rank(
        hashed, part_col=group_col, val_col="_skey", key_col=key_col
    )
    return (
        ranked.filter(F.col("rank") <= k)
        .drop("_skey", "pct_rank", "gap_to_prev")
    )
