"""Window operators — SURVEY.md §2.5 (W1).

The reference's per-group "latest run" selection is a cursor loop over
scans with ``ORDER BY scan_start DESC LIMIT 1 OFFSET k`` scalar
subqueries (get_folder_stats.sql:12-57, get_scan_stats.sql:14-16).
In set semantics that's exactly a ranking window; one Catalyst window
exec replaces the loop + temp table, and at scale it's a single shuffle
on the partition key (no per-group round trips).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nth_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    offset: int = 0,
    rank_col: str = "_rn",
) -> DataFrame:
    """W1 — the (offset+1)-th row of each group under ``order_by``.

    MySQL's ``LIMIT 1 OFFSET k`` on ties is nondeterministic
    (SURVEY.md §2.5); callers pass a deterministic tiebreaker as the
    last ``order_by`` element (e.g. ``F.desc('scan_run_id')``).

    Scale: one hash shuffle on ``partition_by``; with AQE the partition
    count adapts to the data. No driver-side iteration.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == offset + 1)
        .drop(rank_col)
    )


def latest_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    tiebreaker: str,
    offset: int = 0,
) -> DataFrame:
    """Latest-per-group with deterministic tiebreak — the engine form of
    get_scan_stats.sql:14-16 ("latest scan_run per scan")."""
    return nth_per_group(
        df, partition_by, [F.desc(ts_col), F.desc(tiebreaker)], offset=offset
    )


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "_rn",
    keep_rank: str | None = None,
) -> DataFrame:
    """Generalized top-k per group (used by similarity search §2's
    cosine top-k). Optionally keeps the rank as ``keep_rank``."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    if keep_rank:
        return out.withColumnRenamed(rank_col, keep_rank)
    return out.drop(rank_col)
