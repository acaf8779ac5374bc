"""Property tests for the round-12 wave: the encoded-scalar fold's
packing headroom and cross-engine parity (q344), the two-phase quota
selection's equivalence to the sequential greedy it distributes
(q345), ELO zero-sum / clamp symmetry under arbitrary grids (q346),
and the GRPO z-score's exactness envelope (q347)."""

from __future__ import annotations

import math

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_CAP = 60_000_000
_SLOT = 1_000_000


def _bucket_plain(seq):
    """Reference token-bucket simulation in unpacked state."""
    credit, adm = _CAP, 0
    for gap, code in seq:
        credit = min(_CAP, credit + gap)
        cost = code * 1_000_000
        if credit >= cost:
            credit -= cost
            adm += 1
    return credit, adm


def _bucket_encoded(seq):
    """The q344 fold over the single packed BIGINT accumulator,
    items encoded gap*64 + code — the exact lambda both engines run."""
    acc = _CAP * _SLOT
    for gap, code in seq:
        d = gap * 64 + code
        topped = min(_CAP, acc // _SLOT + d // 64)
        cost = (d % 64) * 1_000_000
        if topped >= cost:
            acc = (topped - cost) * _SLOT + acc % _SLOT + 1
        else:
            acc = topped * _SLOT + acc % _SLOT
    return acc // _SLOT, acc % _SLOT


_seq = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3_000_000_000),  # gap_ms
        st.sampled_from([15, 20, 25, 30, 35, 40, 45]),      # cost code
    ),
    min_size=0,
    max_size=200,
)


@given(_seq)
@settings(**_SET)
def test_q344_encoding_roundtrip(seq):
    """Packed fold == unpacked simulation, and every intermediate
    packed accumulator stays an integer-valued double (< 2^53) — the
    precondition for the Spark twin's (acc - acc % slot) / slot."""
    credit, adm = _bucket_plain(seq)
    credit_e, adm_e = _bucket_encoded(seq)
    assert (credit, adm) == (credit_e, adm_e)
    assert _CAP * _SLOT + len(seq) < 2**53
    for gap, code in seq:  # item encoding fits too
        assert gap * 64 + code < 2**53


@given(_seq)
@settings(max_examples=8, deadline=None)
def test_q344_fold_matches_duckdb(seq):
    """The DuckDB list_reduce lambda IS the python fold — pin parity
    on arbitrary sequences, not just the corpus."""
    import sys

    sys.path.insert(0, "/root/repo")
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q344_FOLD,
    )

    items = [gap * 64 + code for gap, code in seq]
    con = duckdb.connect()
    acc = con.execute(
        f"SELECT list_reduce([CAST({_CAP * _SLOT} AS BIGINT)] || ?,"
        f" {_Q344_FOLD})",
        [items],
    ).fetchone()[0]
    credit, adm = _bucket_plain(seq)
    assert (acc // _SLOT, acc % _SLOT) == (credit, adm)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # source id
            st.integers(min_value=1, max_value=50),  # tokens
            st.integers(min_value=0, max_value=50),  # content tokens
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(**_SET)
def test_q345_two_phase_equals_sequential_greedy(docs_raw):
    """The distributed two-phase form (per-source prefix cut, then
    global prefix cut over survivors) must equal the sequential
    restatement: walk each source in density order taking while under
    its cap, then walk survivors in global density order taking while
    under budget. (This is the SHIPPED semantics — deliberately NOT
    the lazy-greedy sequential-budget variant, which is unshardable;
    the equality here is what makes the audit well-defined.)"""
    docs = [
        (i, src, tok, min(content, tok))
        for i, (src, tok, content) in enumerate(docs_raw)
    ]

    def milli(num, den):
        q = abs(2000 * num + den) // (2 * den)
        return q if num >= 0 else -q

    scored = [
        (d, src, tok, milli(1000 * content, tok))
        for d, src, tok, content in docs
    ]
    stot = {}
    for _, src, tok, _dn in scored:
        stot[src] = stot.get(src, 0) + tok
    # two-phase
    surv, scum = [], {}
    for d, src, tok, dens in sorted(scored, key=lambda x: (x[1], -x[3], x[0])):
        scum[src] = scum.get(src, 0) + tok
        if scum[src] <= stot[src] * 2 // 5:
            surv.append((d, src, tok, dens))
    gtot = sum(tok for _, _, tok, _ in scored)
    sel, gcum = set(), 0
    for d, src, tok, dens in sorted(surv, key=lambda x: (-x[3], x[0])):
        gcum += tok
        if gcum <= gtot // 4:
            sel.add(d)
    # sequential restatement: per-source walks, then one global walk
    surv2 = []
    for src in stot:
        run = 0
        for d, s2, tok, dens in sorted(
            (x for x in scored if x[1] == src), key=lambda x: (-x[3], x[0])
        ):
            run += tok
            if run <= stot[src] * 2 // 5:
                surv2.append((d, s2, tok, dens))
    assert sorted(x[0] for x in surv) == sorted(x[0] for x in surv2)
    sel2, run = set(), 0
    for d, s2, tok, dens in sorted(surv2, key=lambda x: (-x[3], x[0])):
        run += tok
        if run <= gtot // 4:
            sel2.add(d)
    assert sel == sel2


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),   # round
            st.integers(min_value=0, max_value=7),   # a
            st.integers(min_value=1, max_value=7),   # b offset (≠ a)
            st.integers(min_value=1, max_value=30),  # n matches
            st.integers(min_value=0, max_value=30),  # a-side wins ≤ n
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(**_SET)
def test_q346_zero_sum_and_clamp_symmetry(cells):
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q346_ETAB,
        _Q346_K,
        _Q346_R0,
        _Q346_ROUNDS,
        _trunc_div,
    )

    grid = [
        (rnd, a, (a + off) % 8, n, min(ss, n))
        for rnd, a, off, n, ss in cells
    ]
    rat = [_Q346_R0] * 8
    for rnd in range(_Q346_ROUNDS):
        deltas = [0] * 8
        for g_rnd, a, b, n, ss in grid:
            if g_rnd != rnd:
                continue
            d = rat[b] - rat[a]
            k = max(-8, min(8, _trunc_div(d, 50_000)))
            # clamp/bucket antisymmetry + table complementarity: the
            # b-side expectation is exactly 1000 − E[a-side]
            krev = max(-8, min(8, _trunc_div(-d, 50_000)))
            assert krev == -k
            assert _Q346_ETAB[-k + 8] == 1000 - _Q346_ETAB[k + 8]
            da = _Q346_K * (ss * 1000 - n * _Q346_ETAB[k + 8])
            deltas[a] += da
            deltas[b] -= da
        rat = [rat[i] + deltas[i] for i in range(8)]
    assert sum(r - _Q346_R0 for r in rat) == 0


@given(
    st.lists(
        st.integers(min_value=0, max_value=56_100), min_size=1, max_size=8
    )
)
@settings(**_SET)
def test_q347_z_envelope_and_group_sum(rewards):
    """Exactness envelope: the ×1000 numerator and the radicand stay
    integer-valued doubles; unrounded z sums to ~0 within the group
    (Σ(n·r−S) = 0 exactly), so the rounded sum is bounded by n/2."""
    n, s = len(rewards), sum(rewards)
    ss = sum(r * r for r in rewards)
    var_num = n * ss - s * s
    assert abs(var_num) < 2**53
    zs = []
    for r in rewards:
        num = 1000 * (n * r - s)
        assert abs(num) < 2**53
        if var_num > 0:
            x = num / math.sqrt(var_num)
            a = abs(x)
            f = math.floor(a)
            z = (f + 1 if a - f >= 0.5 else f) * (1 if x >= 0 else -1)
        else:
            z = 0
        zs.append(z)
    assert sum(1000 * (n * r - s) for r in rewards) == 0
    assert abs(sum(zs)) <= max(1, (n + 1) // 2)
