"""Custom stateful streaming operator — ``applyInPandasWithState``
(the escape hatch for semantics the built-in windows can't express;
SURVEY.md §2.9 maps the reference's nothing-here to this extension
point).

API-choice note: Spark 4's newer ``transformWithStateInPandas``
(StatefulProcessor: typed ValueState/ListState/MapState, timers, TTL)
was evaluated and is UNUSABLE in this container — its driver worker
imports ``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs
the ``protobuf`` package (not installed; installs are unavailable),
so the streaming runner crashes at init
(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). On a cluster with
protobuf present, ``running_user_totals`` ports 1:1 to a
StatefulProcessor with one ValueState.

``running_severity_totals`` keeps a per-scan cumulative severity
counter across micro-batches: each arriving scan-run summary row
updates its scan's lifetime totals and emits the new totals. This is
the streaming analogue of "folder stats over all history" — a query
the reference can only answer by re-scanning the warehouse.

State shape: 5 longs + a run counter per scan_id — O(#scans), bounded,
timeout-free (scans are a small dimension; if keys were unbounded you
would set a TTL via ``GroupStateTimeout.ProcessingTimeTimeout``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SEVERITY_FIELDS = (
    "critical_count",
    "high_count",
    "medium_count",
    "low_count",
    "info_count",
)

OUTPUT_SCHEMA = StructType(
    [StructField("scan_id", IntegerType())]
    + [StructField(f"total_{c}", LongType()) for c in SEVERITY_FIELDS]
    + [StructField("n_runs", LongType())]
)

STATE_SCHEMA = StructType(
    [StructField(c, LongType()) for c in SEVERITY_FIELDS]
    + [StructField("n_runs", LongType())]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Arrow-batched state update: sums arrive as pandas frames (the
    vectorized path — no per-row Python), state is the running total."""
    totals = list(state.get) if state.exists else [0] * (len(SEVERITY_FIELDS) + 1)
    for pdf in pdfs:
        for i, c in enumerate(SEVERITY_FIELDS):
            totals[i] += int(pdf[c].sum())
        totals[-1] += len(pdf)
    state.update(tuple(totals))
    yield pd.DataFrame(
        [
            {
                "scan_id": key[0],
                **{f"total_{c}": totals[i] for i, c in enumerate(SEVERITY_FIELDS)},
                "n_runs": totals[-1],
            }
        ]
    )


def running_severity_totals(scan_runs: DataFrame) -> DataFrame:
    """Cumulative severity totals per scan over the stream of scan-run
    summary rows (columns: scan_id + the five *_count columns)."""
    return (
        scan_runs.select("scan_id", *SEVERITY_FIELDS)
        .groupBy("scan_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)

USER_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Integer-cent running totals: the value column arrives ALREADY
    quantized to cents (JVM-side round before the UDF), so the state
    arithmetic is exact integer math — batch order and batch count
    cannot change the final totals, which is what makes the operator's
    end state oracle-checkable."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_cents": cents}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime event count + exact value total over the
    event stream (columns: user_id, cents) — emits the cumulative
    state after every micro-batch; the final emission per user is the
    stream-end total regardless of how the input was batched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        USER_TOTALS_SCHEMA,
        USER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
