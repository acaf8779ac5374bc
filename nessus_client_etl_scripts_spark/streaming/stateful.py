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
    ArrayType,
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


RATE_LIMIT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_rate", LongType()),
        StructField("n_rejected", LongType()),
    ]
)

RATE_STATE_SCHEMA = StructType(
    [StructField("secs", ArrayType(LongType()))]
)


def _make_rate_update(window_s: int, limit: int):
    """Build the per-key update fn with the window/limit pinned at
    plan time (closure, not state) so the same operator serves any
    policy without schema changes."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Sliding-log rate audit per key: state is the FULL sorted
        event-second log, merged per batch and re-scored from scratch
        — order-INSENSITIVE by construction (the final log is the
        same multiset whatever the batch boundaries or arrival order,
        so the last emission equals the batch oracle exactly; q83's
        dominance contract).  Keeping every event is the exact-replay
        contract of a bounded backfill/audit; an enforcing production
        limiter would watermark-prune the log below max(sec) − window
        after each batch and accept late-arrival semantics, which is
        a policy choice this audit deliberately avoids.  The
        per-batch rescan is O(n log n) in numpy over the key's log —
        vectorized, no per-row Python."""
        import numpy as np

        prev = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            prev.extend(int(s) for s in pdf["sec"])
        secs = np.sort(np.asarray(prev, dtype=np.int64))
        state.update((secs.tolist(),))
        # RANGE-frame peer semantics (q311's batch twin): the count
        # for an event at second t is ALL events in [t-(W-1), t] —
        # including same-second peers — hence side='right' on t.
        hi = np.searchsorted(secs, secs, side="right")
        lo = np.searchsorted(secs, secs - (window_s - 1), side="left")
        in_window = hi - lo
        yield pd.DataFrame(
            [
                {
                    "user_id": int(key[0]),
                    "n_events": int(len(secs)),
                    "max_rate": int(in_window.max()) if len(secs) else 0,
                    "n_rejected": int((in_window > limit).sum()),
                }
            ]
        )

    return _update


def sliding_log_rate_audit(
    events: DataFrame, window_s: int, limit: int
) -> DataFrame:
    """Streaming sliding-log rate-limit audit over an UNBOUNDED event
    stream (columns: user_id, sec): per user the lifetime event
    count, the peak trailing-``window_s`` rate and how many events a
    ``limit``-per-window policy would have rejected, emitted after
    every micro-batch (the final emission per user is the stream-end
    answer — keep the max-n_events row downstream).  This is q311's
    batch audit made continuous: the serving-side shape the reference
    has no analogue for (SURVEY.md §2.9 extension surface)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_rate_update(window_s, limit),
        RATE_LIMIT_SCHEMA,
        RATE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
