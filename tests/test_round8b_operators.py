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
