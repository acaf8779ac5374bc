"""Brute-force Python twins for the round-8 continuation wave
(plans/round8b_queries.py) at sf0.001 — each test recomputes the
operator's semantics the NAIVE way (loops, floats, per-subject
simulation) and requires the distributed plan to agree exactly."""

from __future__ import annotations

from collections import defaultdict

SF001 = "/root/testdata/sf0.001"


def test_q273_kaplan_meier_twin(spark):
    """Per-subject simulation of the right-censored KM table: origins,
    deaths, censoring at the horizon, hour-floored durations, and the
    per-step-rounded survival recurrence — plus the KM invariants
    (survival non-increasing, n_risk non-increasing in t)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q273_VALUE_MIN,
        q273,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    horizon = max(r["ts"] for r in ev)
    origin = {}
    for r in ev:
        if r["event_type"] == "error":
            u = r["user_id"]
            if u not in origin or r["ts"] < origin[u]:
                origin[u] = r["ts"]
    death = {}
    for r in ev:
        u = r["user_id"]
        if (
            r["event_type"] == "purchase"
            and u in origin
            and r["ts"] > origin[u]
            and r["value"] > _Q273_VALUE_MIN
        ):
            if u not in death or r["ts"] < death[u]:
                death[u] = r["ts"]

    def us(ts):
        import datetime

        return int(
            ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
        )

    dist = defaultdict(lambda: [0, 0, 0])  # dur -> [n_all, d, c]
    for u, o in origin.items():
        end = death.get(u, horizon)
        dur = (us(end) - us(o)) // 3_600_000_000
        dist[dur][0] += 1
        dist[dur][1 if u in death else 2] += 1
    total = len(origin)
    want = {}
    seen = 0
    surv = 1_000_000
    for dur in sorted(dist):
        n_all, d, c = dist[dur]
        n_risk = total - seen
        seen += n_all
        if d > 0:
            surv = (2 * surv * (n_risk - d) + n_risk) // (2 * n_risk)
            want[dur] = (n_risk, d, c, surv)

    rows = {r["t_hours"]: r for r in q273(spark, SF001).collect()}
    assert set(rows) == set(want)
    for t, (n_risk, d, c, s) in want.items():
        got = rows[t]
        assert (
            got["n_risk"],
            got["d_events"],
            got["n_censored"],
            got["survival_micro"],
        ) == (n_risk, d, c, s)
    # KM invariants
    ordered = [rows[t] for t in sorted(rows)]
    sv = [r["survival_micro"] for r in ordered]
    nr = [r["n_risk"] for r in ordered]
    assert all(a >= b for a, b in zip(sv, sv[1:]))
    assert all(a > b for a, b in zip(nr, nr[1:]))
    assert any(r["n_censored"] > 0 for r in ordered) or any(
        True for u in origin if u not in death
    )


def test_q274_fifo_loop_twin(spark):
    """Simulate FIFO lot consumption with an actual per-part loop
    (draw demand down lot by lot in shipdate order) and require the
    window-algebra plan to match every per-part aggregate."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q274

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()

    def year(r):
        return int(str(r["l_shipdate"])[:4])

    lots = defaultdict(list)
    demand = defaultdict(int)
    for r in li:
        if year(r) == 1997:
            lots[r["l_partkey"]].append(
                (
                    str(r["l_shipdate"]),
                    r["l_orderkey"],
                    r["l_linenumber"],
                    int(r["l_quantity"]),
                )
            )
        elif year(r) >= 1998:
            demand[r["l_partkey"]] += int(r["l_quantity"])

    want = {}
    for part, ls in lots.items():
        ls.sort()
        remaining = demand.get(part, 0)
        consumed = touched = 0
        for _, _, _, qty in ls:  # the loop the query eliminates
            take = min(qty, remaining)
            remaining -= take
            consumed += take
            touched += 1 if take > 0 else 0
        supply = sum(q for *_, q in ls)
        want[part] = (
            len(ls),
            supply,
            demand.get(part, 0),
            consumed,
            touched,
            supply - consumed,
            max(0, demand.get(part, 0) - supply),
        )

    rows = {r["part"]: r for r in q274(spark, SF001).collect()}
    assert set(rows) == set(want)
    for part, exp in want.items():
        got = rows[part]
        assert (
            got["n_lots"],
            got["supply_qty"],
            got["demand_qty"],
            got["consumed_qty"],
            got["lots_touched"],
            got["leftover_qty"],
            got["unfilled_qty"],
        ) == exp


def test_q275_shapley_permutation_twin(spark):
    """Brute-force Shapley by enumerating all 4! channel orderings
    (independent of the coalition-lattice formula the plan uses) and
    the efficiency axiom sum(phi) = v(C) - v(empty) as an exact
    integer identity."""
    from itertools import permutations

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q275_CHANNELS,
        q275,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    bit = dict(_Q275_CHANNELS)
    fp = {}
    for r in ev:
        if r["event_type"] == "purchase":
            u = r["user_id"]
            if u not in fp or r["ts"] < fp[u]:
                fp[u] = r["ts"]
    mask = {u: 0 for u in fp}
    for r in ev:
        u = r["user_id"]
        if u in fp and r["ts"] < fp[u] and r["event_type"] in bit:
            mask[u] |= bit[r["event_type"]]

    def v(S):
        return sum(1 for m in mask.values() if (m & S) == m)

    phi24 = {name: 0 for name, _ in _Q275_CHANNELS}
    for perm in permutations([b for _, b in _Q275_CHANNELS]):
        S = 0
        for b in perm:
            gain = v(S | b) - v(S)
            name = next(n for n, bb in _Q275_CHANNELS if bb == b)
            phi24[name] += gain
            S |= b

    rows = {r["channel"]: r for r in q275(spark, SF001).collect()}
    assert set(rows) == set(phi24)
    for name, b in _Q275_CHANNELS:
        assert rows[name]["shapley_x24"] == phi24[name]
        assert rows[name]["n_touched_pre"] == sum(
            1 for m in mask.values() if m & b
        )
    # efficiency axiom, exactly
    assert sum(phi24.values()) == 24 * (v(15) - v(0))


def test_q276_backtest_twin(spark):
    """Replay the seasonal-naive backtest in Python: daily cent
    totals, d-7 self-join, SAE/bias/WAPE with the round-half-up micro
    rule."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q276

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    import datetime

    per = defaultdict(lambda: [0, 0, 0, 0])  # n, sae, actual, bias
    for (et, d), cents in daily.items():
        prev = daily.get((et, d - datetime.timedelta(days=7)))
        if prev is None:
            continue
        acc = per[et]
        acc[0] += 1
        acc[1] += abs(cents - prev)
        acc[2] += cents
        acc[3] += cents - prev

    rows = {r["event_type"]: r for r in q276(spark, SF001).collect()}
    assert set(rows) == set(per)
    for et, (n, sae, actual, bias) in per.items():
        got = rows[et]
        assert (
            got["n_days"],
            got["sae_cents"],
            got["actual_cents"],
            got["bias_cents"],
        ) == (n, sae, actual, bias)
        assert got["wape_micro"] == (2_000_000 * sae + actual) // (2 * actual)
