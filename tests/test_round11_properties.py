"""Property tests for the round-11 wave: exhaustive cross-engine
verification of the signed half-away milli-division idiom, the
Misra-Gries mergeable-summary guarantee under arbitrary partitioning,
the matmul-vs-fold exactness of the quantized cosine, and the
half-away centroid rounding bound."""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

import duckdb
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_milli(num: int, den: int) -> int:
    """round-half-away-from-zero(1000·num/den) in exact rationals."""
    x = Fraction(1000 * num, den)
    q = abs(x) + Fraction(1, 2)
    r = q.numerator // q.denominator
    # Fraction floor(abs+1/2) == half-away magnitude except exact-.5
    # halves, where floor(abs+.5) IS the away value — so this is it
    return r if x >= 0 else -r


def test_milli_idiom_cross_engine_exhaustive(spark):
    """The `(2000·num ± den) div (2·den)` idiom must equal exact
    rational half-away rounding in BOTH engines, INCLUDING negative
    numerators (the r11 signed extension of PLANS.md rule #17).
    Exhaustive over a signed grid rather than sampled: num ∈
    [−600, 600], den ∈ [1, 24] — covers every residue class both
    division implementations can branch on."""
    rows = [
        (num, den)
        for num in range(-600, 601)
        for den in range(1, 25)
    ]
    want = [_ref_milli(num, den) for num, den in rows]

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (0::BIGINT, 1::BIGINT)) v(num, den) LIMIT 0")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = [
        r[0]
        for r in con.execute(
            "SELECT CAST((2000 * num + (CASE WHEN num < 0 THEN -den"
            " ELSE den END)) // (2 * den) AS BIGINT)"
            " FROM t ORDER BY rowid"
        ).fetchall()
    ]
    assert duck == want

    sdf = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(rows)], "i long, num long, den long"
    )
    got = (
        sdf.selectExpr(
            "i",
            "(2000 * num + (CASE WHEN num < 0 THEN -den ELSE den END))"
            " div (2 * den) AS m",
        )
        .orderBy("i")
        .collect()
    )
    assert [r["m"] for r in got] == want


def _mg_compress(counts: Counter, m: int):
    ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    t = ranked[m][1] if len(ranked) > m else 0
    return Counter({k: c - t for k, c in counts.items() if c - t > 0}), t


@settings(**_SET)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=2, max_value=10),
)
def test_misra_gries_guarantee_any_partitioning(stream, n_parts, m):
    """The q338 merge rule (per-partition exact counts → subtract the
    (m+1)-th largest → clip → sum → re-compress) must satisfy the MG
    guarantee est ≤ true ≤ est + (Σ t_part + t_final) for EVERY key it
    emits, under ANY assignment of items to partitions, and emit at
    most m keys. Partition by item index hash — hypothesis varies the
    stream AND the partition count."""
    per_part = [Counter() for _ in range(n_parts)]
    truth = Counter()
    for i, k in enumerate(stream):
        per_part[i % n_parts][k] += 1
        truth[k] += 1
    merged, sub_total = Counter(), 0
    for part in per_part:
        comp, t = _mg_compress(part, m)
        merged.update(comp)
        sub_total += t
    final, tf = _mg_compress(merged, m)
    err = sub_total + tf
    assert len(final) <= m
    for k, est in final.items():
        assert est >= 1
        assert est <= truth[k] <= est + err, (k, est, truth[k], err)
    # completeness side of the guarantee: any key the summary DROPPED
    # has true count ≤ err (a heavy hitter above the bound survives)
    for k, tc in truth.items():
        if k not in final:
            assert tc <= err, (k, tc, err)


@settings(**_SET)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_quantized_cosine_matmul_equals_fold(vecs):
    """_nano_pair_scores (numpy blocked matmul) must be BIT-IDENTICAL
    to the sequential python fold for arbitrary vectors in the data
    range — the exactness claim that replaced the r11 margin argument.
    Guard: at least one non-zero coordinate per vector (zero vectors
    have no cosine; the corpus precondition)."""
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _nano_pair_scores,
    )

    def half_away(x):
        a = abs(x)
        f = math.floor(a)
        r = f + 1 if a - f >= 0.5 else f
        return int(r) if x >= 0 else -int(r)

    def quant(v):
        return [half_away(x * 1_000_000) for x in v]

    qs = [quant(v) for v in vecs]
    if any(all(x == 0 for x in q) for q in qs):
        return  # zero vector after quantization: cosine undefined
    nano = _nano_pair_scores(np.asarray(vecs, dtype=np.float64))
    for i, qi in enumerate(qs):
        for j, qj in enumerate(qs):
            if i == j:
                continue
            d = sum(a * b for a, b in zip(qi, qj))
            naa = math.sqrt(sum(a * a for a in qi))
            nbb = math.sqrt(sum(b * b for b in qj))
            fold = half_away(1_000_000_000 * (d / (naa * nbb)))
            assert nano[i][j] == fold, (i, j, nano[i][j], fold)


@settings(**_SET)
@given(
    st.lists(
        st.integers(min_value=-(10**7), max_value=10**7),
        min_size=1,
        max_size=50,
    )
)
def test_centroid_half_away_rounding_bound(values):
    """The q339 integer centroid `(2s ± n) div (2n)` must sit within
    1/2 of the exact mean for any signed sum — the bound that keeps
    quantized-centroid distances within 1 unit² per dim of the exact
    Lloyd step."""
    s, n = sum(values), len(values)
    c = abs(2 * s + (n if s >= 0 else -n)) // (2 * n)
    c = c if (2 * s + (n if s >= 0 else -n)) >= 0 else -c
    assert abs(Fraction(s, n) - c) <= Fraction(1, 2)
