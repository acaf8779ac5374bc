"""Known-answer tests for the temporal join operators (as-of, band).

These pin the semantic edges the oracle-differential check can't
isolate: inclusive-boundary matching, tie-breaking on equal
timestamps, no-prior-row null padding, and band boundary inclusion
across bucket edges.
"""

import datetime as dt

from pyspark.sql import functions as F

from nessus_client_etl_scripts_spark.operators.temporal import (
    as_of_join,
    band_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join_basic_backward(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (1, 101, _ts("2024-01-01 12:00:00")),
            (2, 200, _ts("2024-01-01 09:00:00")),
        ],
        "k long, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts("2024-01-01 09:30:00"), 1.0),
            (1, 901, _ts("2024-01-01 11:00:00"), 2.0),
            (2, 902, _ts("2024-01-01 09:30:00"), 3.0),  # after the probe
        ],
        "k long, rid long, ts timestamp, v double",
    )
    out = as_of_join(
        left, right, ["k"], "ts", "ts", ["rid", "v"], right_tiebreaker="rid"
    )
    rows = {r.lid: r for r in out.collect()}
    assert rows[100].asof_rid == 900 and rows[100].asof_v == 1.0
    assert rows[101].asof_rid == 901 and rows[101].asof_v == 2.0
    # no prior right row → left-outer null padding
    assert rows[200].asof_rid is None and rows[200].asof_ts is None


def test_as_of_join_inclusive_and_ties(spark):
    t = _ts("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, 100, t)], "k long, lid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 900, t, 1.0), (1, 901, t, 2.0)],
        "k long, rid long, ts timestamp, v double",
    )
    out = as_of_join(
        left, right, ["k"], "ts", "ts", ["rid", "v"], right_tiebreaker="rid"
    ).collect()
    # equal timestamp matches (inclusive); greatest tiebreaker wins
    assert out[0].asof_rid == 901 and out[0].asof_v == 2.0
    assert out[0].asof_ts == t


def test_as_of_join_does_not_leak_across_keys(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))], "k long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 900, _ts("2024-01-01 09:00:00"), 1.0)],
        "k long, rid long, ts timestamp, v double",
    )
    out = as_of_join(
        left, right, ["k"], "ts", "ts", ["rid", "v"], right_tiebreaker="rid"
    ).collect()
    assert out[0].asof_rid is None


def test_as_of_join_null_field_of_winning_row_stays_null(spark):
    """The most recent matching right row carries ALL its columns —
    including NULL ones. A per-column carry would back-fill the NULL
    from an older right row (mixing rows); the struct carry must not."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 12:00:00"))], "k long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts("2024-01-01 09:00:00"), 1.0),  # older, v NOT null
            (1, 901, _ts("2024-01-01 11:00:00"), None),  # winner, v IS null
        ],
        "k long, rid long, ts timestamp, v double",
    )
    out = as_of_join(
        left, right, ["k"], "ts", "ts", ["rid", "v"], right_tiebreaker="rid"
    ).collect()
    assert out[0].asof_rid == 901
    assert out[0].asof_v is None  # not back-filled from rid=900
    assert out[0].asof_ts == _ts("2024-01-01 11:00:00")


def test_band_join_boundaries_and_bucket_edges(spark):
    # band=10; pairs straddling bucket boundaries must still match,
    # and the exact |l-r|<=10 edge is inclusive.
    left = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 19), (1, "c", 100)], "k long, lid string, v long"
    )
    right = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 29), (1, "z", 111)], "k long, rid string, r long"
    )
    out = band_join(left, right, ["k"], "v", "r", 10)
    pairs = {(r.lid, r.rid) for r in out.collect()}
    # a(0)-x(10): inclusive edge, adjacent buckets; b(19)-x(10) same
    # bucket; b(19)-y(29): edge across buckets; c(100)-z(111): |Δ|=11
    # excluded even though buckets are adjacent.
    assert pairs == {("a", "x"), ("b", "x"), ("b", "y")}


def test_band_join_no_duplicate_pairs(spark):
    left = spark.createDataFrame([(1, "a", 15)], "k long, lid string, v long")
    right = spark.createDataFrame([(1, "x", 15)], "k long, rid string, r long")
    out = band_join(left, right, ["k"], "v", "r", 10)
    assert out.count() == 1  # same bucket, matched exactly once


def test_band_join_respects_keys(spark):
    left = spark.createDataFrame([(1, "a", 0)], "k long, lid string, v long")
    right = spark.createDataFrame([(2, "x", 0)], "k long, rid string, r long")
    assert band_join(left, right, ["k"], "v", "r", 10).count() == 0


def test_as_of_join_plan_is_single_window_shuffle(spark):
    """The as-of join must plan as union → one hash exchange → window,
    never a nested-loop or cartesian product."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))], "k long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 900, _ts("2024-01-01 09:00:00"), 1.0)],
        "k long, rid long, ts timestamp, v double",
    )
    plan = as_of_join(
        left, right, ["k"], "ts", "ts", ["rid", "v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
