"""Property tests for the round-6 second-wave operators, each
differenced against a driver-side Python reference on
hypothesis-generated inputs: BM25 scoring (q132), U-shaped
attribution credit conservation (q139), gap-fill interpolation
coverage (q137), and sorted-neighborhood pair-count exactness
(q134)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORD = st.sampled_from(["join", "hash", "scan", "sort", "row", "x"])


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(_WORD, min_size=1, max_size=25), min_size=1, max_size=8
    )
)
def test_bm25_matches_python_reference(spark, docs):
    from nessus_client_etl_scripts_spark.operators.ranking import bm25_scores

    terms = ("join", "hash", "scan")
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["score_micro"])
        for r in bm25_scores(df, terms).collect()
    }
    # driver-side float reference (k1=1.2, b=0.75, RSJ odds idf)
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(d) for d in toks) / n
    dfreq = {t: sum(1 for d in toks if t in d) for t in terms}
    for i, d in enumerate(toks):
        micro, hit = 0, 0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
            micro += round(c * 1e6)
        if hit:
            assert got[i] == (hit, micro)
        else:
            assert i not in got


@settings(**_SET)
@given(n_touches=st.integers(min_value=1, max_value=25))
def test_attribution_credit_always_sums_to_10000(spark, n_touches):
    from nessus_client_etl_scripts_spark.operators.temporal import (
        position_attribution,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click")
        for i in range(n_touches)
    ] + [(999, base + dt.timedelta(minutes=n_touches), 1, "purchase")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = position_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "user_id",
        "ts",
        "event_id",
    ).collect()
    assert sum(r["credited_bp"] for r in got) == 10000
    assert sum(r["n_touches"] for r in got) == n_touches


@settings(**_SET)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # hour offset
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_gap_fill_covers_span_and_preserves_observed(spark, obs):
    from nessus_client_etl_scripts_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    base = dt.datetime(2024, 5, 1)
    rows = [
        (1, base + dt.timedelta(hours=h), float(v)) for h, v in obs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = sorted(
        gap_fill_interpolate(df, ["user_id"], "ts", "value").collect(),
        key=lambda r: r["bucket_epoch"],
    )
    hours = sorted({h for h, _ in obs})
    lo, hi = hours[0], hours[-1]
    # exactly one row per hour in [first, last] observed bucket
    b0 = int(base.timestamp()) // 3600 * 3600
    assert [r["bucket_epoch"] for r in got] == [
        b0 + h * 3600 for h in range(lo, hi + 1)
    ]
    # observed buckets carry the exact integer-cent sum of their rows
    by_hour = {}
    for h, v in obs:
        by_hour.setdefault(h, []).append(v)
    for r in got:
        h = (r["bucket_epoch"] - b0) // 3600
        if h in by_hour:
            assert r["observed"]
            assert r["value_cents"] == sum(
                round(v * 100) for v in by_hour[h]
            )
            assert r["n_obs"] == len(by_hour[h])
        else:
            assert not r["observed"] and r["n_obs"] == 0


@settings(**_SET)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=9), min_size=1, max_size=3
    ),
    window=st.integers(min_value=2, max_value=5),
)
def test_snm_pair_count_exact(spark, sizes, window):
    from nessus_client_etl_scripts_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = []
    did = 0
    for b, n in enumerate(sizes):
        for _ in range(n):
            rows.append((did, f"tok{did} filler words", f"lang{b}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted_neighborhood_pairs(df, window=window).collect()
    expected = sum(
        sum(min(window - 1, n - i) for i in range(1, n)) for n in sizes
    )
    assert len(got) == expected
    # no pair crosses a block, distances bounded by the window
    assert all(1 <= r["dist"] <= window - 1 for r in got)
