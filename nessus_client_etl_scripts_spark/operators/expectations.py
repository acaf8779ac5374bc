"""Declarative data-quality expectations — the Deequ/Great
Expectations verb: a pipeline states constraints ("this column is
never null", "this key is unique", "every child row has a parent")
and the engine emits one audit row per constraint with checked /
violation counts and a pass flag. The gate a 100 TB ingest runs
before promoting a batch from bronze to silver — the reference's
export scripts assume upstream validity (export.py trusts completed
scan rows); this makes that assumption a checked, queryable fact.

Scale shape by construction:

- ``row_expectations`` folds EVERY row-local predicate on one table
  into a SINGLE conditional aggregation — one scan, map-side partial
  combine, one 1-row frame unpivoted to N audit rows. Adding a 50th
  check to a 100 TB table costs one more counter, not one more scan.
- ``unique_expectation`` is a two-level aggregate on the key (the
  exact-dedup shape): the shuffle carries (key, count) pairs with
  partial combine; excess = rows − distinct keys.
- ``subset_expectation`` (referential integrity) is a LEFT ANTI join
  against the parent key set — broadcastable when the parent is a
  dim, AQE-planned otherwise — counting orphans without moving any
  non-key column.

Every count is an exact BIGINT; ``passed`` is pure integer
comparison. Audit frames union into one result (all three shapes
emit the same 4-column schema).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = ("constraint", "n_checked", "n_violations", "passed")


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "constraint",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def row_expectations(
    df: DataFrame, violations: Mapping[str, Column]
) -> DataFrame:
    """One audit row per named row-local violation predicate, all
    counted in a single scan of ``df``."""
    named = list(violations.items())
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"__c{i}")
        for i, (_, pred) in enumerate(named)
    ]
    one = df.agg(*aggs)
    stack = ", ".join(f"'{n}', __c{i}" for i, (n, _) in enumerate(named))
    return _finish(
        one.select(
            F.expr(
                f"stack({len(violations)}, {stack}) AS"
                " (constraint, n_violations)"
            ),
            F.col("__n").alias("n_checked"),
        )
    )


def unique_expectation(df: DataFrame, key: str, name: str) -> DataFrame:
    """Audit row for key uniqueness: violations = rows in excess of
    one per key (0 when the key is unique)."""
    g = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    return _finish(
        g.agg(
            F.sum("c").alias("n_checked"),
            (F.sum("c") - F.count(F.lit(1))).alias("n_violations"),
        ).select(F.lit(name).alias("constraint"), "n_checked", "n_violations")
    )


def subset_expectation(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Audit row for referential integrity: violations = child rows
    whose NON-NULL key has no parent (LEFT ANTI on the parent key
    set).  SQL FK semantics: a NULL foreign key is not an RI
    violation — pair this with a null-rate ``row_expectations`` check
    when nullable FKs should also be flagged."""
    n = child.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return _finish(
        n.crossJoin(orphans).select(
            F.lit(name).alias("constraint"), "n_checked", "n_violations"
        )
    )


def fd_expectation(
    df: DataFrame, x_cols: list[str], y_col: str, name: str
) -> DataFrame:
    """Functional-dependency audit X → Y: one row with the number of
    X-groups, how many of them map to MORE than one distinct Y (the
    violating groups), the worst group's variant count, and the holds
    flag. Two-level aggregation — the inner groupBy carries only
    (X, Y) keys with partial combine; the violating-group check is a
    count-distinct per group, never a row explosion."""
    g = df.groupBy(*x_cols).agg(
        F.countDistinct(y_col).alias("nd")
    )
    return (
        g.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("nd").cast("long").alias("max_variants"),
        )
        .select(
            F.lit(name).alias("fd"),
            "n_groups",
            "n_violating",
            "max_variants",
            (F.col("n_violating") == 0).alias("holds"),
        )
    )
