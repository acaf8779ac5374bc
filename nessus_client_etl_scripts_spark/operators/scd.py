"""Snapshot diff / change-data-capture — the consumer side of the
reference's dimension-snapshot sink (SURVEY.md §2.1 S6).

The reference uploads a FULL folder/scan dimension snapshot each run
(`/root/reference/export.py:241-243`) — snapshot-per-partition-date is
the lake layout. Anything downstream that wants "what changed since
yesterday" must diff two snapshots; this operator is that diff:

    snapshot_diff(old, new, keys, compare) ->
        one row per key present in either snapshot, classified
        ``added`` / ``removed`` / ``changed`` / ``unchanged``

Scale shape: one FULL OUTER join hash-partitioned on the key columns —
dimension-sized inputs by construction (snapshots, not facts), and the
classification is row-local column algebra. At 100 TB-of-facts scale
the dimension snapshots are still MBs-to-GBs, so this plan broadcasts
or shuffles cheaply either way; AQE decides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Classify every key across two snapshots of the same entity.

    Output columns: ``key_cols``, then ``old_<c>`` / ``new_<c>`` for
    each compare column, then ``change_col``. ``changed`` uses
    null-safe equality (``<=>``) per compare column, so a value
    flipping to/from NULL counts as a change — the semantics an SCD
    Type-2 loader needs to decide row expiry."""
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, list(key_cols), "full_outer")

    same: Column = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *key_cols,
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
        change.alias(change_col),
    )
