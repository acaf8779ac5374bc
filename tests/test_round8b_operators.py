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


def test_q277_gini_twin(spark):
    """Float-Gini replay at sf0.001 within the micro quantum, exact
    integer replay of the pinned rounding, and gain >= -1 (rounding
    can only perturb the nonneg exact gain by quanta)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q277_FEATURES,
        q277,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()

    def feat(r, name):
        if name == "linestatus":
            return r["l_linestatus"]
        if name == "qty_gt25":
            return "y" if int(r["l_quantity"]) > 25 else "n"
        if name == "disc_ge5":
            return "y" if round(r["l_discount"] * 100) >= 5 else "n"
        if name == "ship_year":
            return str(int(str(r["l_shipdate"])[:4]))
        return str(int(str(r["l_shipdate"])[5:7]))

    n = len(li)
    cls = defaultdict(int)
    for r in li:
        cls[r["l_returnflag"]] += 1
    parent_sq = sum(c * c for c in cls.values())
    parent_micro = (2_000_000 * (n * n - parent_sq) + n * n) // (2 * n * n)

    rows = {r["feature"]: r for r in q277(spark, SF001).collect()}
    assert set(rows) == {name for name, _ in _Q277_FEATURES}
    for name, _ in _Q277_FEATURES:
        groups = defaultdict(lambda: defaultdict(int))
        for r in li:
            groups[feat(r, name)][r["l_returnflag"]] += 1
        child_terms = 0
        for g in groups.values():
            ng = sum(g.values())
            sq = sum(c * c for c in g.values())
            gm = (2_000_000 * (ng * ng - sq) + ng * ng) // (2 * ng * ng)
            child_terms += ng * gm
        child_micro = (2 * child_terms + n) // (2 * n)
        got = rows[name]
        assert got["n_groups"] == len(groups)
        assert got["parent_gini_micro"] == parent_micro
        assert got["child_gini_micro"] == child_micro
        assert got["gain_micro"] == parent_micro - child_micro
        # float cross-check within quanta
        exact_child = sum(
            (sum(g.values()) / n)
            * (1 - sum(c * c for c in g.values()) / sum(g.values()) ** 2)
            for g in groups.values()
        )
        assert abs(child_micro - exact_child * 1_000_000) <= len(groups) + 2


def test_q278_grid_nn_brute_twin(spark):
    """Brute-force all-pairs nearest neighbor must equal the
    grid-blocked plan exactly — proving the 3x3 cell neighborhood
    loses no candidate at radius == cell size."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q278_MOD,
        _Q278_RADIUS,
        q278,
    )

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    pts = {
        r["c_custkey"]: (
            r["c_custkey"] * 7919 % _Q278_MOD,
            r["c_custkey"] * 104729 % _Q278_MOD,
            r["c_mktsegment"],
        )
        for r in cust
    }
    lhs = {k: v for k, v in pts.items() if v[2] == "BUILDING"}
    rhs = {k: v for k, v in pts.items() if v[2] == "MACHINERY"}
    want = {}
    for k, (x, y, _) in lhs.items():
        best = None
        for nb, (nx, ny, _) in rhs.items():
            di = max(abs(x - nx), abs(y - ny))
            if di > _Q278_RADIUS:
                continue
            d1 = abs(x - nx) + abs(y - ny)
            cand = (di, d1, nb)
            if best is None or cand < best:
                best = cand
        if best:
            want[k] = best
    rows = {r["custkey"]: r for r in q278(spark, SF001).collect()}
    assert set(rows) == set(want)
    for k, (di, d1, nb) in want.items():
        got = rows[k]
        assert (got["d_inf"], got["d_l1"], got["nn_custkey"]) == (di, d1, nb)
    # the filter branch is live: some BUILDING customers have no
    # neighbor within the radius
    assert len(want) < len(lhs)


def test_q279_pav_twin(spark):
    """Sequential pool-adjacent-violators on exact rationals must
    agree with the plan's minimax-of-rounded-averages within the micro
    quantum, and the plan's fit must be monotone non-decreasing."""
    from fractions import Fraction

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q279

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        b = round(r["l_discount"] * 100)
        agg[b][0] += 1
        agg[b][1] += 1 if r["l_returnflag"] == "R" else 0
    bins = sorted(agg)
    # classic PAV: pool blocks while a violator exists
    blocks = [[b, agg[b][0], agg[b][1]] for b in bins]  # start, n, pos
    i = 0
    while i + 1 < len(blocks):
        a, b = blocks[i], blocks[i + 1]
        if Fraction(a[2], a[1]) > Fraction(b[2], b[1]):
            a[1] += b[1]
            a[2] += b[2]
            del blocks[i + 1]
            i = max(0, i - 1)
        else:
            i += 1
    pav = {}
    bi = 0
    for start, bn, bp in blocks:
        cnt = 0
        while bi < len(bins) and cnt < bn:
            pav[bins[bi]] = Fraction(bp, bn)
            cnt += agg[bins[bi]][0]
            bi += 1

    rows = {r["bin"]: r for r in q279(spark, SF001).collect()}
    assert set(rows) == set(bins)
    iso = [rows[b]["iso_micro"] for b in bins]
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    for b in bins:
        got = rows[b]
        assert got["n"] == agg[b][0] and got["pos"] == agg[b][1]
        assert got["rate_micro"] == (
            2_000_000 * agg[b][1] + agg[b][0]
        ) // (2 * agg[b][0])
        assert abs(got["iso_micro"] - float(pav[b]) * 1_000_000) <= 1.0


def test_q280_holt_twin(spark):
    """Python replay of the Holt recurrence with truncating integer
    division and signed half-away rounding must match every series
    exactly."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q280

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items(), key=lambda kv: kv[0]):
        series[et].append(c * 1000)

    def tdiv(a, b):  # both engines truncate toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def half_away(n, scale):
        return tdiv(2 * n + (-scale if n < 0 else scale), 2 * scale)

    want = {}
    for et, xs in series.items():
        level, trend, sae = xs[0], 0, 0
        for x in xs[1:]:
            l2 = half_away(x + 3 * (level + trend), 4)
            t2 = half_away((l2 - level) + 7 * trend, 8)
            sae += abs(x - (level + trend))
            level, trend = l2, t2
        want[et] = (len(xs), level, trend, sae, level + 7 * trend)

    rows = {r["event_type"]: r for r in q280(spark, SF001).collect()}
    assert set(rows) == set(want)
    for et, (n, level, trend, sae, fc) in want.items():
        got = rows[et]
        assert (
            got["n_days"],
            got["level_milli"],
            got["trend_milli"],
            got["sae_milli"],
            got["forecast7_milli"],
        ) == (n, level, trend, sae, fc)
    # the signed branch is live: some series carries a negative trend
    assert any(r["trend_milli"] < 0 for r in rows.values())


def test_q281_covariance_twin(spark):
    """Exact integer sufficient statistics replayed in Python, plus
    the float cross-check cov ~= cov_num / (n(n-1)) and the
    Cauchy-Schwarz bound cov_num^2 <= var_num_x * var_num_y."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q281_PAIRS,
        q281,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()

    def val(r, name):
        if name == "qty":
            return int(r["l_quantity"])
        if name == "disc":
            return round(r["l_discount"] * 100)
        if name == "tax":
            return round(r["l_tax"] * 100)
        return int(str(r["l_shipdate"])[5:7])

    names = sorted({n for p in _Q281_PAIRS for n in p})
    n = len(li)
    s = {m: sum(val(r, m) for r in li) for m in names}
    sp = {
        (a, b): sum(val(r, a) * val(r, b) for r in li)
        for a, b in _Q281_PAIRS
    }
    rows = {(r["feat_x"], r["feat_y"]): r for r in q281(spark, SF001).collect()}
    assert set(rows) == set(_Q281_PAIRS)
    num = {}
    for (a, b), r in rows.items():
        assert r["n"] == n
        assert (r["sum_x"], r["sum_y"], r["sum_xy"]) == (s[a], s[b], sp[(a, b)])
        num[(a, b)] = r["cov_num"]
        assert r["cov_num"] == n * sp[(a, b)] - s[a] * s[b]
    for a, b in _Q281_PAIRS:
        if a != b:
            assert num[(a, b)] ** 2 <= num[(a, a)] * num[(b, b)]


def test_q282_two_hop_twin(spark):
    """Python replay of the register-merge estimate (md5 prefix, rho,
    per-order registers, part-level max-merge) must match exactly,
    and the linear-counting finalization of the emitted statistics
    must track the EXACT brute-force 2-hop distinct count."""
    import hashlib

    from nessus_client_etl_scripts_spark.operators.sketches import (
        HASH_BITS,
        M,
        R,
        RMAX,
        _SUFFIX_MASK,
    )
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q282

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    edges = {(r["l_orderkey"], r["l_partkey"]) for r in li}
    by_order = defaultdict(set)
    by_part = defaultdict(set)
    for ok, part in edges:
        by_order[ok].add(part)
        by_part[part].add(ok)

    def rho_bucket(part):
        h = int(hashlib.md5(str(part).encode()).hexdigest()[: HASH_BITS // 4], 16)
        w = h & _SUFFIX_MASK
        for j in range(1, R + 1):
            if w >= 1 << (R - j):
                return h >> R, j
        return h >> R, RMAX

    order_regs = {}
    for ok, parts in by_order.items():
        regs = {}
        for p in parts:
            b, rho = rho_bucket(p)
            regs[b] = max(regs.get(b, 0), rho)
        order_regs[ok] = regs

    import math

    rows = {r["part"]: r for r in q282(spark, SF001).collect()}
    assert set(rows) == set(by_part)
    for part, oks in by_part.items():
        merged = {}
        for ok in oks:
            for b, m in order_regs[ok].items():
                merged[b] = max(merged.get(b, 0), m)
        s = sum(1 << (RMAX - m) for m in merged.values())
        got = rows[part]
        assert got["n_orders"] == len(oks)
        assert got["regs_occupied"] == len(merged)
        assert got["reg_sum"] == s
        # downstream finalization: linear counting (reach << m)
        exact = len({p for ok in oks for p in by_order[ok]})
        est = M * math.log(M / (M - got["regs_occupied"]))
        assert abs(est - exact) <= 0.2 * exact + 3


def test_q283_bitemporal_twin(spark):
    """Python replay of the two-clock reconstruction: restatements are
    invisible at T1 and rewrite history at T2; forward amendments
    inside the valid slice apply at both."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q283_T1,
        _Q283_T2,
        _Q283_V,
        q283,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    V = datetime.date.fromisoformat(_Q283_V)

    def log_rows(r):
        od = datetime.date.fromisoformat(str(r["o_orderdate"])[:10])
        cents = round(r["o_totalprice"] * 100)
        k = r["o_orderkey"]
        yield od, od, cents
        if k % 7 == 0:
            yield od, od + datetime.timedelta(days=45), cents + k % 1000 - 500
        if k % 5 == 0:
            d = od + datetime.timedelta(days=10)
            yield d, d, cents + 25000

    def pit(r, t):
        best = None
        for vf, tx, cents in log_rows(r):
            if tx <= t and vf <= V:
                key = (vf, tx)
                if best is None or key > best[0]:
                    best = (key, cents)
        return None if best is None else best[1]

    t1 = datetime.date.fromisoformat(_Q283_T1)
    t2 = datetime.date.fromisoformat(_Q283_T2)
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in orders:
        p1, p2 = pit(r, t1), pit(r, t2)
        if p1 is None or p2 is None:
            continue
        a = agg[r["o_orderpriority"]]
        a[0] += 1
        a[1] += p1
        a[2] += p2
        a[3] += 1 if p1 != p2 else 0

    rows = {r["pri"]: r for r in q283(spark, SF001).collect()}
    assert set(rows) == set(agg)
    restated_total = 0
    for pri, (n, s1, s2, nr) in agg.items():
        got = rows[pri]
        assert (
            got["n_orders"],
            got["sum_known_t1"],
            got["sum_known_t2"],
            got["n_restated"],
        ) == (n, s1, s2, nr)
        restated_total += nr
    assert restated_total > 0  # the retroactive branch is live


def test_q284_kendall_twin(spark):
    """Brute-force pair census over the top-K frame, and the tau-b
    identity C + D + ties = n_pairs."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q284_TOPK,
        q284,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    rev = defaultdict(lambda: [0, 0])
    for r in li:
        y = int(str(r["l_shipdate"])[:4])
        if y in (1997, 1998):
            rev[r["l_partkey"]][y - 1997] += round(r["l_extendedprice"] * 100)
    for r in li:
        rev.setdefault(r["l_partkey"], [0, 0])
    top = sorted(rev, key=lambda p: (-(rev[p][0] + rev[p][1]), p))[:_Q284_TOPK]
    C = D = tx = ty = tb = 0
    for i, a in enumerate(top):
        for b in top[i + 1 :]:
            dx = rev[a][0] - rev[b][0]
            dy = rev[a][1] - rev[b][1]
            if dx == 0 and dy == 0:
                tb += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                C += 1
            else:
                D += 1
    row = q284(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    n = len(top) * (len(top) - 1) // 2
    assert got["n_pairs"] == n
    assert (
        got["concordant"],
        got["discordant"],
        got["ties_x"],
        got["ties_y"],
        got["ties_both"],
    ) == (C, D, tx, ty, tb)
    assert C + D + tx + ty + tb == n


def test_q285_dp_twin(spark):
    """Replay the seeded geometric mechanism (md5 uniform, exact CDF
    thresholds) and pin distributional sanity: noise is centered and
    bounded, and the thresholds are a valid CDF."""
    import hashlib

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q285_T,
        q285,
    )

    # thresholds strictly increasing, ending below 2^48
    ts = [t for _, t in _Q285_T]
    assert all(a < b for a, b in zip(ts, ts[1:]))
    assert ts[-1] < 1 << 48

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    cells = defaultdict(int)
    for r in ev:
        cells[(r["event_type"], r["ts"].date())] += 1

    def noise_for(et, d):
        u = int(
            hashlib.md5(f"dp:{et}:{d.isoformat()}".encode()).hexdigest()[:12],
            16,
        )
        for k, t in _Q285_T:
            if u < t:
                return k
        return 16

    rows = {(r["event_type"], r["d"]): r for r in q285(spark, SF001).collect()}
    assert set(rows) == set(cells)
    for (et, d), n in cells.items():
        got = rows[(et, d)]
        k = noise_for(et, d)
        assert got["true_count"] == n
        assert got["noise"] == k and -16 <= k <= 16
        assert got["noisy_count"] == n + k
    # mechanism sanity: not all-zero noise, roughly centered
    ks = [r["noise"] for r in rows.values()]
    assert any(k != 0 for k in ks)
    assert abs(sum(ks)) <= 4 * len(ks) ** 0.5 * 3  # ~3 sigma of sum


def test_q286_hard_negative_twin(spark):
    """Brute-force cosine mining in Python floats must agree on pair
    SELECTION exactly and on scores to float tolerance; every anchor
    appears once with both arms from the right label sets."""
    import math

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q286_ANCHORS,
        q286,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"]) for r in emb}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    rows = {r["query_id"]: r for r in q286(spark, SF001).collect()}
    anchors = [v for v in vecs if v < _Q286_ANCHORS]
    assert set(rows) == set(anchors)
    for qid in anchors:
        qv, ql = vecs[qid]
        best = {True: None, False: None}
        for cid, (cv, cl) in vecs.items():
            if cid == qid:
                continue
            key = (-cos(qv, cv), cid)
            same = cl == ql
            if best[same] is None or key < best[same]:
                best[same] = key + (cl,)
        got = rows[qid]
        assert got["pos_id"] == best[True][1]
        assert got["neg_id"] == best[False][1]
        assert abs(got["pos_score"] - -best[True][0]) < 1e-9
        assert abs(got["neg_score"] - -best[False][0]) < 1e-9
        assert abs(got["margin"] - (got["pos_score"] - got["neg_score"])) == 0
        assert vecs[got["pos_id"]][1] == ql
        assert vecs[got["neg_id"]][1] != ql


def test_q287_ate_twin(spark):
    """Per-user replay of the exposure/outcome windows, strata, and
    the signed cross-multiplied difference; both arms populated."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q287_SPLIT,
        q287,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    split = datetime.date.fromisoformat(_Q287_SPLIT)
    users = defaultdict(lambda: [0, 0, 0])  # activity_p1, treated, y_p2
    for r in ev:
        u = users[r["user_id"]]
        if r["ts"].date() < split:
            u[0] += 1
            if r["event_type"] == "error" and r["value"] > 90:
                u[1] = 1
        elif r["event_type"] == "purchase":
            u[2] += round(r["value"] * 100)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for act, tr, y in users.values():
        if act == 0:
            continue  # no exposure-window activity -> not in p1
        c = cells[act // 10]
        c[0] += tr
        c[1] += 1 - tr
        c[2] += y if tr else 0
        c[3] += y if not tr else 0

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = {r["stratum"]: r for r in q287(spark, SF001).collect()}
    want = {s: c for s, c in cells.items() if c[0] > 0 and c[1] > 0}
    assert set(rows) == set(want)
    assert len(want) > 0
    for s, (nt, nc, yt, yc) in want.items():
        got = rows[s]
        assert (got["n_treated"], got["n_control"]) == (nt, nc)
        assert (got["y_treated"], got["y_control"]) == (yt, yc)
        num = 1_000_000 * (yt * nc - yc * nt)
        adj = -(nt * nc) if yt * nc - yc * nt < 0 else nt * nc
        assert got["diff_micro"] == tdiv(2 * num + adj, 2 * nt * nc)


def test_q288_wilson_twin(spark):
    """Exact-isqrt replay plus the float cross-check against the
    textbook Wilson formula, and the containment guarantees."""
    import math

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q288

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        agg[r["event_type"]][0] += 1
        agg[r["event_type"]][1] += 1 if r["value"] > 90 else 0

    rows = {r["event_type"]: r for r in q288(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for et, (n, s) in agg.items():
        got = rows[et]
        assert (got["n"], got["s"]) == (n, s)
        assert got["rate_micro"] == (2_000_000 * s + n) // (2 * n)
        t = (s * (n - s) + n) * 10**12 // n
        r0 = math.isqrt(t)
        center = (2_000_000 * (s + 2) + (n + 4)) // (2 * (n + 4))
        half = (2 * r0) // (n + 4)
        assert got["wilson_lo_micro"] == max(0, center - half)
        assert got["wilson_hi_micro"] == min(1_000_000, center + half)
        # float cross-check (z = 2)
        p, z = s / n, 2.0
        c = (p + z * z / (2 * n)) / (1 + z * z / n)
        h = (
            z
            * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
            / (1 + z * z / n)
        )
        assert abs(got["wilson_lo_micro"] - (c - h) * 1e6) <= 3
        assert abs(got["wilson_hi_micro"] - (c + h) * 1e6) <= 3
        assert (
            got["wilson_lo_micro"]
            <= got["rate_micro"]
            <= got["wilson_hi_micro"]
        )


def test_q289_decomposition_twin(spark):
    """Python replay of the 7-observation centered MA, DOW seasonal
    means and remainder, plus the decomposition identity
    y*1000 = trend + seasonal + remainder and zero-mean-ish seasonal."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q289

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items(), key=lambda kv: kv[0]):
        series[et].append((d, c))

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    want = {}
    sea_acc = defaultdict(lambda: [0, 0])
    detr = {}
    for et, obs in series.items():
        for i in range(3, len(obs) - 3):
            d, c = obs[i]
            s7 = sum(x for _, x in obs[i - 3 : i + 4])
            trend = (2000 * s7 + 7) // 14
            dt = 1000 * c - trend
            dow = (d - __import__("datetime").date(1970, 1, 1)).days % 7
            detr[(et, d)] = (c, trend, dt, dow)
            sea_acc[(et, dow)][0] += dt
            sea_acc[(et, dow)][1] += 1
    sea = {
        k: tdiv(2 * sd + (-nd if sd < 0 else nd), 2 * nd)
        for k, (sd, nd) in sea_acc.items()
    }
    for (et, d), (c, trend, dt, dow) in detr.items():
        want[(et, d)] = (c, trend, sea[(et, dow)], dt - sea[(et, dow)])

    rows = {(r["event_type"], r["d"]): r for r in q289(spark, SF001).collect()}
    assert set(rows) == set(want)
    for k, (c, trend, s_m, rem) in want.items():
        got = rows[k]
        assert (
            got["y_cents"],
            got["trend_milli"],
            got["seasonal_milli"],
            got["remainder_milli"],
        ) == (c, trend, s_m, rem)
        assert (
            1000 * got["y_cents"]
            == got["trend_milli"]
            + got["seasonal_milli"]
            + got["remainder_milli"]
        )


def test_q290_kcore_twin(spark):
    """Python peeling simulation (6 synchronized rounds) must match
    the survivor set and within-core degrees exactly; the cascade is
    live (round 2 removes someone) and converged at sf0.001."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q290_ROUNDS,
        q290,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    directed = sum(len(v) for v in adj.values())
    k = (2 * directed) // (3 * len(adj))
    alive = set(adj)
    sizes = [len(alive)]
    for _ in range(_Q290_ROUNDS):
        alive = {
            u
            for u in alive
            if sum(1 for v in adj[u] if v in alive) >= k
        }
        sizes.append(len(alive))
    # peeling removes someone and the rounds converge (the multi-round
    # cascade itself fires at sf0.01+: 2000->1921->1905->1901->1899)
    assert sizes[0] > sizes[1]
    assert sizes[-1] == sizes[-2]
    want = {
        u: sum(1 for v in adj[u] if v in alive)
        for u in alive
    }
    rows = {r["part"]: r for r in q290(spark, SF001).collect()}
    assert set(rows) == set(want)
    for u, d in want.items():
        assert rows[u]["core_degree"] == d
        assert rows[u]["k"] == k
        assert d >= k  # converged: every survivor meets the bar
    assert 0 < len(want) < len(adj)  # peeling removed some, kept some


def test_q291_qini_twin(spark):
    """Python replay of ranking, positional deciles, cumulative arms
    and the signed Qini ratio; monotone cumulative counts."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q287_SPLIT,
        q291,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    split = datetime.date.fromisoformat(_Q287_SPLIT)
    users = defaultdict(lambda: [0, 0, 0])  # score, treated, converted
    for r in ev:
        u = users[r["user_id"]]
        if r["ts"].date() < split:
            u[0] += 1
            if r["event_type"] == "error" and r["value"] > 90:
                u[1] = 1
        elif r["event_type"] == "purchase" and r["value"] > 90:
            u[2] = 1
    subj = [
        (uid, s, t, c) for uid, (s, t, c) in users.items() if s > 0
    ]
    subj.sort(key=lambda x: (-x[1], x[0]))
    n = len(subj)
    cum = defaultdict(lambda: [0, 0, 0, 0])
    for rn, (_, _, t, c) in enumerate(subj, 1):
        dec = ((rn - 1) * 10) // n
        cell = cum[dec]
        cell[0] += t
        cell[1] += 1 - t
        cell[2] += c if t else 0
        cell[3] += c if not t else 0

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = {r["decile"]: r for r in q291(spark, SF001).collect()}
    assert set(rows) == set(cum)
    nt = nc = ct = cc = 0
    for dec in sorted(cum):
        nt += cum[dec][0]
        nc += cum[dec][1]
        ct += cum[dec][2]
        cc += cum[dec][3]
        got = rows[dec]
        assert (got["nt_cum"], got["nc_cum"], got["ct_cum"], got["cc_cum"]) \
            == (nt, nc, ct, cc)
        if nc == 0:
            assert got["qini_milli"] is None
        else:
            num = 1000 * (ct * nc - cc * nt)
            adj = -nc if ct * nc - cc * nt < 0 else nc
            assert got["qini_milli"] == tdiv(2 * num + adj, 2 * nc)
    assert nt + nc == n


def test_q292_bcubed_twin(spark):
    """Item-level B-cubed computed the O(n^2)-free way in Python plus
    the float cross-check against the textbook per-item average."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q292

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    cells = defaultdict(int)
    for r in docs:
        cells[(r["source"], r["lang"])] += 1
    ns = defaultdict(int)
    nl = defaultdict(int)
    for (s, g), c in cells.items():
        ns[s] += c
        nl[g] += c
    n = sum(cells.values())
    sp = sum(
        (
            2_000_000 * sum(c * c for (s2, _), c in cells.items() if s2 == s)
            + ns[s]
        )
        // (2 * ns[s])
        for s in ns
    )
    sr = sum(
        (
            2_000_000 * sum(c * c for (_, g2), c in cells.items() if g2 == g)
            + nl[g]
        )
        // (2 * nl[g])
        for g in nl
    )
    p_micro = (2 * sp + n) // (2 * n)
    r_micro = (2 * sr + n) // (2 * n)
    row = q292(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_docs"] == n
    assert (got["bcubed_p_micro"], got["bcubed_r_micro"]) == (p_micro, r_micro)
    assert got["bcubed_f1_micro"] == (
        2 * (2 * p_micro * r_micro) + (p_micro + r_micro)
    ) // (2 * (p_micro + r_micro))
    # float cross-check: textbook per-item averages
    fp = sum(
        c * c / ns[s] for (s, _), c in cells.items()
    ) / n
    fr = sum(
        c * c / nl[g] for (_, g), c in cells.items()
    ) / n
    assert abs(got["bcubed_p_micro"] - fp * 1e6) <= len(ns) + 2
    assert abs(got["bcubed_r_micro"] - fr * 1e6) <= len(nl) + 2


def test_q293_pit_twin(spark):
    """Per-user event replay: features must reflect strictly-earlier
    events only (the leakage guarantee), including the (ts, event_id)
    tie rule."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q293

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(r)
    want = {}
    for uid, rs in per.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        clicks = 0
        last_err = None
        first_signup = None
        for r in rs:
            if r["event_type"] == "purchase":
                secs = None
                if first_signup is not None:
                    # exact micros div, not float seconds
                    us = int(
                        (r["ts"] - first_signup)
                        / __import__("datetime").timedelta(microseconds=1)
                    )
                    secs = us // 1_000_000
                want[r["event_id"]] = (uid, clicks, last_err, secs)
            if r["event_type"] == "click":
                clicks += 1
            elif r["event_type"] == "error":
                last_err = round(r["value"] * 100)
            elif r["event_type"] == "signup":
                if first_signup is None or r["ts"] < first_signup:
                    first_signup = r["ts"]

    rows = {r["label_id"]: r for r in q293(spark, SF001).collect()}
    assert set(rows) == set(want)
    for lid, (uid, clicks, last_err, secs) in want.items():
        got = rows[lid]
        assert got["user_id"] == uid
        assert got["clicks_before"] == clicks
        assert got["last_error_cents"] == last_err
        assert got["secs_since_signup"] == secs
    # both null branches are live early in each user's stream
    assert any(r["last_error_cents"] is None for r in rows.values())
    assert any(r["secs_since_signup"] is None for r in rows.values())


def test_q294_exp_histogram_twin(spark):
    """Python replay of buckets, cumulative picks and exact positional
    percentiles; the histogram error bound (mid within 2x of exact)
    holds by construction."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q294

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        if r["value"] > 0:
            per[r["event_type"]].append(
                (round(r["value"] * 100), r["event_id"])
            )
    rows = {r["event_type"]: r for r in q294(spark, SF001).collect()}
    assert set(rows) == set(per)
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        p50 = vals[(n + 1) // 2 - 1][0]
        p90 = vals[(9 * n + 9) // 10 - 1][0]
        buckets = defaultdict(int)
        for c, _ in vals:
            buckets[c.bit_length() - 1] += 1
        cum = 0
        b50 = b90 = None
        for b in sorted(buckets):
            cum += buckets[b]
            if b50 is None and cum >= (n + 1) // 2:
                b50 = b
            if b90 is None and cum >= (9 * n + 9) // 10:
                b90 = b
        got = rows[et]
        assert got["n"] == n and got["n_buckets"] == len(buckets)
        assert (got["p50_exact"], got["p90_exact"]) == (p50, p90)
        assert got["p50_hist_mid"] == ((1 << b50) + (1 << (b50 + 1)) - 1) // 2
        assert got["p90_hist_mid"] == ((1 << b90) + (1 << (b90 + 1)) - 1) // 2
        # the audit's own guarantee: midpoint within a factor of 2
        assert got["p50_hist_mid"] <= 2 * p50 and p50 <= 2 * got["p50_hist_mid"]


def test_q295_business_days_twin(spark):
    """The closed-form weekday prefix function must equal a literal
    day-by-day weekday count for every (order, ship) pair."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q295

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: datetime.date.fromisoformat(
            str(r["o_orderdate"])[:10]
        )
        for r in spark.read.parquet(f"{SF001}/orders.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for r in li:
        sd = datetime.date.fromisoformat(str(r["l_shipdate"])[:10])
        od = orders[r["l_orderkey"]]
        lo, hi = min(od, sd), max(od, sd)
        bd = 0
        d = lo
        while d < hi:  # literal loop the closed form replaces
            if d.weekday() < 5:
                bd += 1
            d += datetime.timedelta(days=1)
        a = agg[sd.year]
        a[0] += 1
        a[1] += bd
        a[2] = max(a[2], bd)

    rows = {r["yr"]: r for r in q295(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for yr, (n, s, mx) in agg.items():
        got = rows[yr]
        assert (got["n_lines"], got["sum_bdays"], got["max_bdays"]) == (
            n,
            s,
            mx,
        )
        assert got["mean_bdays_micro"] == (2_000_000 * s + n) // (2 * n)


def test_q296_assortativity_twin(spark):
    """Edge-endpoint degree sums replayed in Python; the symmetric
    identity sum_x == sum_y and Cauchy-Schwarz |num| <= den."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q296

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    deg = {u: len(vs) for u, vs in adj.items()}
    n = sx = sxy = sxx = 0
    for u, vs in adj.items():
        for v in vs:
            n += 1
            sx += deg[u]
            sxy += deg[u] * deg[v]
            sxx += deg[u] * deg[u]
    row = q296(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n_edges"], got["sum_x"], got["sum_xy"], got["sum_xx"]) == (
        n,
        sx,
        sxy,
        sxx,
    )
    assert got["assort_num"] == n * sxy - sx * sx
    assert got["assort_den"] == n * sxx - sx * sx
    assert abs(got["assort_num"]) <= got["assort_den"]


def test_q297_kneser_ney_twin(spark):
    """Python KN replay over the same normalized bigrams, plus the
    probability-mass identity: per context a, the exact rational
    sum_b P_KN(b|a) == 1 (what makes KN a proper distribution)."""
    from fractions import Fraction

    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q297_TOPK,
        q297,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    toks = [
        r["l"]
        for r in docs.select(
            tokens(normalize_text("text")).alias("l")
        ).collect()
    ]
    bi = defaultdict(int)
    for l in toks:
        for a, b in zip(l, l[1:]):
            bi[(a, b)] += 1
    ca = defaultdict(int)
    nf = defaultdict(int)
    np_ = defaultdict(int)
    for (a, b), c in bi.items():
        ca[a] += c
        nf[a] += 1
        np_[b] += 1
    B = len(bi)

    rows = q297(spark, SF001).collect()
    assert len(rows) == _Q297_TOPK
    ranked = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q297_TOPK]
    assert [(r["a"], r["b"]) for r in rows] == [k for k, _ in ranked] or {
        (r["a"], r["b"]) for r in rows
    } == {k for k, _ in ranked}
    for r in rows:
        a, b = r["a"], r["b"]
        assert r["cab"] == bi[(a, b)]
        assert r["ca"] == ca[a] and r["n_follow"] == nf[a]
        assert r["n_precede"] == np_[b]
        num = max(4 * bi[(a, b)] - 3, 0) * B + 3 * nf[a] * np_[b]
        den = 4 * ca[a] * B
        assert r["p_kn_micro"] == (2_000_000 * num + den) // (2 * den)
    # mass identity for the three heaviest contexts: the discounted
    # seen mass plus lambda(a) * sum over the WHOLE vocabulary of the
    # continuation prior (sum_b N+( . b) == B) is exactly 1
    heavy = sorted(ca, key=lambda a: -ca[a])[:3]
    for a in heavy:
        seen = sum(
            Fraction(max(4 * c - 3, 0), 4 * ca[a])
            for (a2, _), c in bi.items()
            if a2 == a
        )
        cont = Fraction(3 * nf[a], 4 * ca[a]) * Fraction(
            sum(np_.values()), B
        )
        assert seen + cont == 1


def test_q298_lattice_twin(spark):
    """Python replay of all 9 lattice nodes plus the monotonicity
    property (generalizing can only raise k_min) and minimality of
    the chosen node."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q298_K,
        q298,
    )

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF001}/nation.parquet").collect()
    }

    def key(r, h1, h2):
        k1 = (
            str(r["c_nationkey"])
            if h1 == 0
            else str(nat[r["c_nationkey"]])
            if h1 == 1
            else "*"
        )
        cents = round(r["c_acctbal"] * 100)

        def tdiv(a, b):  # engines truncate toward zero; Python floors
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        k2 = (
            str(tdiv(cents, 10_000))
            if h2 == 0
            else str(tdiv(cents, 100_000))
            if h2 == 1
            else "*"
        )
        return k1, k2

    want = {}
    for h1 in range(3):
        for h2 in range(3):
            groups = defaultdict(int)
            for r in cust:
                groups[key(r, h1, h2)] += 1
            kmin = min(groups.values())
            supp = sum(g for g in groups.values() if g < _Q298_K)
            want[(h1, h2)] = (len(groups), kmin, supp)
    ok = [
        (h1 + h2, h1, h2)
        for (h1, h2), (_, kmin, _s) in want.items()
        if kmin >= _Q298_K
    ]
    chosen = min(ok)[1:]

    rows = {(r["h1"], r["h2"]): r for r in q298(spark, SF001).collect()}
    assert set(rows) == set(want)
    for node, (ng, kmin, supp) in want.items():
        got = rows[node]
        assert (got["n_groups"], got["k_min"], got["n_suppressed"]) == (
            ng,
            kmin,
            supp,
        )
        assert got["chosen"] == (1 if node == chosen else 0)
    # monotonicity: fully generalized dominates
    assert want[(2, 2)][1] >= max(want[(0, 0)][1], 1)
    assert sum(r["chosen"] for r in rows.values()) == 1


def test_q299_medoid_twin(spark):
    """Brute-force medoid per label with the same nano quantization
    and round-half-up mean; the medoid's mean must be the label's
    minimum (sf0.001 clusters are all under the exact-path cap, so
    every candidate's reference count is n−1)."""
    import math

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q299

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    by_label = defaultdict(dict)
    for r in emb:
        by_label[r["label"]][r["vec_id"]] = [float(x) for x in r["embedding"]]

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    def half_away(x):
        a = abs(x)
        f = math.floor(a)
        r = f + 1 if a - f >= 0.5 else f  # exact (r11 hardening)
        return int(r) if x >= 0 else -int(r)

    rows = {r["label"]: r for r in q299(spark, SF001).collect()}
    assert set(rows) == set(by_label)
    for label, members in by_label.items():
        means = {}
        for i, vi in members.items():
            s = sum(
                half_away(1_000_000_000 * (1.0 - cos(vi, vj)))
                for j, vj in members.items()
                if j != i
            )
            c = len(members) - 1
            means[i] = (2 * s + c) // (2 * c)
        best = min(means, key=lambda i: (means[i], i))
        got = rows[label]
        assert got["medoid_id"] == best
        assert got["mean_dist_nano"] == means[best]
        assert got["n_ref"] == len(members) - 1
        assert got["n_members"] == len(members)
        assert got["mean_dist_nano"] == min(means.values())


def test_q300_fingerprint_twin(spark):
    """Python replay of keyed XOR fingerprints; exactly the two
    mutated columns flag, with the expected per-row change counts."""
    import hashlib

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q300_COLS,
        q300,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()

    def h(key, val):
        s = f"{key}:{val if val is not None else '<null>'}"
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    want = {}
    for c in _Q300_COLS:
        fp1 = fp2 = nch = 0
        for r in orders:
            k = r["o_orderkey"]
            if c == "o_totalprice":
                v1 = round(r["o_totalprice"] * 100)
                v2 = v1 + k % 1000 - 500 if k % 7 == 0 else v1
            elif c == "o_orderpriority":
                v1 = r[c]
                v2 = "9-RESTATED" if k % 5 == 0 else v1
            else:
                v1 = v2 = r[c]
            a, b = h(k, v1), h(k, v2)
            fp1 ^= a
            fp2 ^= b
            nch += 1 if a != b else 0
        want[c] = (len(orders), fp1, fp2, nch)

    rows = {r["col"]: r for r in q300(spark, SF001).collect()}
    assert set(rows) == set(_Q300_COLS)
    for c, (n, fp1, fp2, nch) in want.items():
        got = rows[c]
        assert got["n_rows"] == n
        assert (got["fp_v1"], got["fp_v2"]) == (fp1, fp2)
        assert got["n_rows_changed"] == nch
        assert got["changed"] == (0 if fp1 == fp2 else 1)
    flagged = {c for c, r in rows.items() if r["changed"] == 1}
    assert flagged == {"o_totalprice", "o_orderpriority"}


def test_q301_coordinated_sample_twin(spark):
    """Python replay of the hash coordinate across all three tables;
    zero orphans by construction and a rate near p = 1/8."""
    import hashlib

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q301_THRESHOLD,
        q301,
    )

    def keep(k):
        return (
            int(hashlib.md5(f"cs:{k}".encode()).hexdigest()[:12], 16)
            < _Q301_THRESHOLD
        )

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    sc = {r["c_custkey"] for r in cust if keep(r["c_custkey"])}
    so = {r["o_orderkey"] for r in orders if keep(r["o_custkey"])}
    nl = sum(1 for r in li if r["l_orderkey"] in so)

    rows = {r["tbl"]: r for r in q301(spark, SF001).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    assert rows["customer"]["n_sampled"] == len(sc)
    assert rows["orders"]["n_sampled"] == len(so)
    assert rows["lineitem"]["n_sampled"] == nl
    for tbl, full in (
        ("customer", len(cust)),
        ("orders", len(orders)),
        ("lineitem", len(li)),
    ):
        got = rows[tbl]
        assert got["n_total"] == full
        assert got["n_orphans"] == 0
        assert got["rate_micro"] == (
            2_000_000 * got["n_sampled"] + full
        ) // (2 * full)
    # the join-preserving property: every sampled order's customer kept
    assert all(keep(r["o_custkey"]) for r in orders if r["o_orderkey"] in so)
    # rate lands near p = 1/8 for the directly-sampled tables
    assert abs(rows["customer"]["rate_micro"] - 125_000) < 80_000


def test_q302_did_twin(spark):
    """Python replay of the 2x3 panel and the DID identity."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q302_W,
        q302,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    w1 = datetime.date.fromisoformat(_Q302_W[1])
    w2 = datetime.date.fromisoformat(_Q302_W[2])
    treated = set()
    for r in ev:
        if (
            r["event_type"] == "error"
            and r["value"] > 90
            and r["ts"].date() < w2
        ):
            treated.add(r["user_id"])
    cells = defaultdict(int)
    users_pre = defaultdict(set)
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        d = r["ts"].date()
        period = 0 if d < w1 else 1 if d < w2 else 2
        arm = 1 if r["user_id"] in treated else 0
        cells[(arm, period)] += round(r["value"] * 100)
        if period == 1:
            users_pre[arm].add(r["user_id"])

    row = q302(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_treated_pre"] == len(users_pre[1])
    assert got["n_control_pre"] == len(users_pre[0])
    assert got["pre_trend_treated_cents"] == cells[(1, 1)] - cells[(1, 0)]
    assert got["pre_trend_control_cents"] == cells[(0, 1)] - cells[(0, 0)]
    assert got["pre_trend_gap_cents"] == (
        cells[(1, 1)] - cells[(1, 0)]
    ) - (cells[(0, 1)] - cells[(0, 0)])
    assert got["did_cents"] == (cells[(1, 2)] - cells[(1, 1)]) - (
        cells[(0, 2)] - cells[(0, 1)]
    )


def test_q303_two_level_percentile_twin(spark):
    """Python replay of both positional levels; also pins that the
    two-level p90 differs from the global p90 for at least one type
    (the reason the explicit form exists)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q303

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        per[(r["user_id"], r["event_type"])].append(
            (round(r["value"] * 100), r["event_id"])
        )
    userp = defaultdict(list)
    for (uid, et), vals in per.items():
        vals.sort()
        n = len(vals)
        userp[et].append((vals[(9 * n + 9) // 10 - 1][0], uid))
    want = {}
    for et, ps in userp.items():
        ps.sort()
        n = len(ps)
        want[et] = (
            n,
            ps[(n + 1) // 2 - 1][0],
            ps[(9 * n + 9) // 10 - 1][0],
            max(p for p, _ in ps),
        )
    rows = {r["event_type"]: r for r in q303(spark, SF001).collect()}
    assert set(rows) == set(want)
    for et, (n, p50, p90, mx) in want.items():
        got = rows[et]
        assert (
            got["n_users"],
            got["p50_of_p90"],
            got["p90_of_p90"],
            got["max_p90"],
        ) == (n, p50, p90, mx)


def test_q304_encoding_advisor_twin(spark):
    """Python replay of the size model; the advisor discriminates
    (low-cardinality columns flag dict, the key column does not)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q304_COLS,
        q304,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    rows = {r["col"]: r for r in q304(spark, SF001).collect()}
    assert set(rows) == set(_Q304_COLS)
    for c in _Q304_COLS:
        vals = [
            "" if r[c] is None else str(r[c]) for r in orders
        ]
        n = len(vals)
        distinct = set(vals)
        plain = sum(len(v) for v in vals)
        dict_bits = 8 * sum(len(v) for v in distinct) + n * (
            (len(distinct).bit_length() - 1) + 1
        )
        got = rows[c]
        assert (got["n_rows"], got["n_distinct"], got["plain_bytes"]) == (
            n,
            len(distinct),
            plain,
        )
        assert got["dict_bits"] == dict_bits
        assert got["plain_bits"] == 8 * plain
        assert got["recommend_dict"] == (1 if dict_bits < 8 * plain else 0)
    assert rows["o_orderstatus"]["recommend_dict"] == 1
    # discrimination: the status dictionary saves a far larger share
    # than the key column's (whose dict still wins on short strings)
    ratio = lambda r: r["dict_bits"] / r["plain_bits"]  # noqa: E731
    assert ratio(rows["o_orderstatus"]) < ratio(rows["o_custkey"])


def test_q305_feature_hashing_twin(spark):
    """Python replay of the bucketing; pigeonhole identities hold and
    collisions actually occur at this vocabulary size."""
    import hashlib

    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q305_BITS,
        q305,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    vocab = {
        t["tok"]
        for t in docs.select(
            __import__(
                "pyspark.sql.functions", fromlist=["explode"]
            ).explode(tokens(normalize_text("text"))).alias("tok")
        ).collect()
    }
    buckets = defaultdict(int)
    for tok in vocab:
        b = (
            int(hashlib.md5(f"fh:{tok}".encode()).hexdigest()[:12], 16)
            % (1 << _Q305_BITS)
        )
        buckets[b] += 1
    row = q305(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_features"] == len(vocab)
    assert got["n_buckets_used"] == len(buckets)
    assert got["max_load"] == max(buckets.values())
    assert got["n_collided_features"] == sum(
        c for c in buckets.values() if c > 1
    )
    assert got["n_collision_buckets"] == sum(
        1 for c in buckets.values() if c > 1
    )
    assert got["n_buckets"] == 1 << _Q305_BITS
    # identities
    assert got["n_buckets_used"] <= got["n_buckets"]
    assert (
        got["n_collided_features"]
        - got["n_collision_buckets"]
        == got["n_features"] - got["n_buckets_used"]
    )


def test_q306_retraction_twin(spark):
    """Python replay of net multiplicities; all three delta shapes
    (cancel, multiplicity-2, orphan violation) are live."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q306

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    net = defaultdict(int)
    pri_of = {}
    for r in orders:
        k = r["o_orderkey"]
        pri_of[k] = r["o_orderpriority"]
        net[k] += 1
        if k % 3 == 0:
            net[k] -= 1
        if k % 5 == 0:
            net[k] += 1
        if k % 1000 == 0:
            net[-k] -= 1
            pri_of[-k] = r["o_orderpriority"]
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for k, m in net.items():
        a = agg[pri_of[k]]
        a[0] += 1
        a[1] += 1 if m == 0 else 0
        a[2] += m if m > 0 else 0
        a[3] += 1 if m < 0 else 0
    rows = {r["pri"]: r for r in q306(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for pri, (nk, nc, lm, nv) in agg.items():
        got = rows[pri]
        assert (
            got["n_keys"],
            got["n_cancelled"],
            got["live_multiplicity"],
            got["n_violations"],
        ) == (nk, nc, lm, nv)
    assert sum(r["n_cancelled"] for r in rows.values()) > 0
    assert any(
        r["live_multiplicity"] > r["n_keys"] - r["n_cancelled"] - r["n_violations"]
        for r in rows.values()
    )
    assert sum(r["n_violations"] for r in rows.values()) > 0


def test_q307_bfs_twin(spark):
    """Python BFS replay: per-layer counts match and distances are
    genuine minima (re-running BFS to convergence within k hops)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q307_HOPS,
        _Q307_SEED_MOD,
        q307,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    dist = {u: 0 for u in adj if u % _Q307_SEED_MOD == 0}
    frontier = set(dist)
    for r in range(1, _Q307_HOPS + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = r
                    nxt.add(v)
        frontier = nxt
    want = defaultdict(int)
    for d in dist.values():
        want[d] += 1

    rows = {r["dist"]: r["n_nodes"] for r in q307(spark, SF001).collect()}
    assert rows == dict(want)
    assert 0 in rows and rows[0] == sum(
        1 for u in adj if u % _Q307_SEED_MOD == 0
    )
    assert any(d > 0 for d in rows)  # expansion actually happened


def test_q308_ar_aging_twin(spark):
    """Python replay of the aging bands; bands partition the open
    set and both old and young exposures exist."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q308_ASOF,
        q308,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    asof = datetime.date.fromisoformat(_Q308_ASOF)
    agg = defaultdict(lambda: [0, set(), 0, 0])
    total_open = 0
    for r in orders:
        od = datetime.date.fromisoformat(str(r["o_orderdate"])[:10])
        if r["o_orderstatus"] == "F" or od > asof:
            continue
        total_open += 1
        age = (asof - od).days
        b = (
            "0-30"
            if age <= 30
            else "31-60"
            if age <= 60
            else "61-90"
            if age <= 90
            else "90+"
        )
        cents = round(r["o_totalprice"] * 100)
        a = agg[b]
        a[0] += 1
        a[1].add(r["o_custkey"])
        a[2] += cents
        a[3] = max(a[3], cents)

    rows = {r["bucket"]: r for r in q308(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for b, (n, custs, cents, mx) in agg.items():
        got = rows[b]
        assert (
            got["n_orders"],
            got["n_customers"],
            got["outstanding_cents"],
            got["largest_cents"],
        ) == (n, len(custs), cents, mx)
    assert sum(r["n_orders"] for r in rows.values()) == total_open
    assert "0-30" in rows and "90+" in rows


def test_q309_edge_churn_twin(spark):
    """Python replay of the year-flag census plus set identities."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q309_Y1,
        _Q309_Y2,
        q309,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    e1, e2 = set(), set()
    for r in li:
        y = int(str(r["l_shipdate"])[:4])
        edge = (r["l_partkey"], r["l_suppkey"])
        if y == _Q309_Y1:
            e1.add(edge)
        elif y == _Q309_Y2:
            e2.add(edge)
    row = q309(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_edges_y1"] == len(e1)
    assert got["n_edges_y2"] == len(e2)
    assert got["n_stable"] == len(e1 & e2)
    assert got["n_dropped"] == len(e1 - e2)
    assert got["n_new"] == len(e2 - e1)
    u = len(e1 | e2)
    assert got["jaccard_micro"] == (2_000_000 * len(e1 & e2) + u) // (2 * u)


def test_q310_join_discovery_twin(spark):
    """Python replay of distincts and containment; the real FKs score
    1e6 and the decoy scores far below."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q310_PAIRS,
        q310,
    )

    data = {
        t: spark.read.parquet(f"{SF001}/{t}.parquet").collect()
        for t in ("orders", "customer", "lineitem", "part", "supplier", "nation")
    }
    rows = {(r["fk_col"], r["pk_col"]): r for r in q310(spark, SF001).collect()}
    assert set(rows) == set(_Q310_PAIRS)
    for fk, pk in _Q310_PAIRS:
        ft, fc = fk.split(".")
        pt, pc = pk.split(".")
        fset = {r[fc] for r in data[ft]}
        pset = {r[pc] for r in data[pt]}
        got = rows[(fk, pk)]
        assert got["fk_distinct"] == len(fset)
        assert got["pk_distinct"] == len(pset)
        assert got["n_common"] == len(fset & pset)
        assert got["containment_micro"] == (
            2_000_000 * len(fset & pset) + len(fset)
        ) // (2 * len(fset))
    real = [
        rows[p]["containment_micro"]
        for p in _Q310_PAIRS
        if p != ("orders.o_orderkey", "customer.c_custkey")
    ]
    decoy = rows[("orders.o_orderkey", "customer.c_custkey")][
        "containment_micro"
    ]
    assert all(r == 1_000_000 for r in real)
    assert decoy < 200_000


def test_q311_rate_limit_twin(spark):
    """Sliding-log replay per user in Python (deque over seconds)
    must match peak rates and rejection counts; some but not all
    users offend."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q311_LIMIT,
        _Q311_WINDOW_S,
        q311,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        us = int(
            r["ts"].replace(tzinfo=__import__("datetime").timezone.utc)
            .timestamp()
            * 1_000_000
        )
        per[r["user_id"]].append(us // 1_000_000)
    want = {}
    for uid, secs in per.items():
        secs.sort()
        from collections import deque

        dq = deque()
        peak = rejected = 0
        for s in secs:
            dq.append(s)
            while dq[0] < s - (_Q311_WINDOW_S - 1):
                dq.popleft()
            peak = max(peak, len(dq))
            if len(dq) > _Q311_LIMIT:
                rejected += 1
        if rejected > 0:
            want[uid] = (len(secs), peak, rejected)

    rows = {r["user_id"]: r for r in q311(spark, SF001).collect()}
    assert set(rows) == set(want)
    for uid, (n, peak, rej) in want.items():
        got = rows[uid]
        assert (got["n_events"], got["max_rate"], got["n_rejected"]) == (
            n,
            peak,
            rej,
        )
    assert 0 < len(want) < len(per)


def test_q312_dsar_twin(spark):
    """Python replay of the access census across the three tables."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q312_MOD,
        q312,
    )

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    subjects = {
        r["c_custkey"] for r in cust if r["c_custkey"] % _Q312_MOD == 0
    }
    want = {}
    for s in subjects:
        want[("customer", s)] = (1, None, None)
    od = defaultdict(list)
    for r in orders:
        if r["o_custkey"] in subjects:
            od[r["o_custkey"]].append(str(r["o_orderdate"])[:10])
    for s, ds in od.items():
        want[("orders", s)] = (len(ds), min(ds), max(ds))
    ed = defaultdict(list)
    for r in ev:
        if r["user_id"] in subjects:
            ed[r["user_id"]].append(r["ts"].date().isoformat())
    for s, ds in ed.items():
        want[("events", s)] = (len(ds), min(ds), max(ds))

    rows = {(r["tbl"], r["sid"]): r for r in q312(spark, SF001).collect()}
    assert set(rows) == set(want)
    for k, (n, lo, hi) in want.items():
        got = rows[k]
        assert got["n_rows"] == n
        assert (
            got["first_d"].isoformat() if got["first_d"] else None
        ) == lo
        assert (got["last_d"].isoformat() if got["last_d"] else None) == hi


def test_q313_hysteresis_twin(spark):
    """Python state-machine replay per series; hysteresis actually
    suppresses flaps (episodes < days_on for some series or states
    persist through the band)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q313

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items(), key=lambda kv: kv[0]):
        series[et].append(c)
    want = {}
    for et, xs in series.items():
        tot = sum(xs)
        n = len(xs)
        hi = (9 * 1000 * tot) // (8 * n)
        lo = (1000 * tot) // n
        state = episodes = days_on = 0
        for c in xs:
            v = 1000 * c
            new_state = 1 if v > hi else 0 if v < lo else state
            if state == 0 and new_state == 1:
                episodes += 1
            state = new_state
            days_on += state
        want[et] = (n, episodes, days_on, state)
    rows = {r["event_type"]: r for r in q313(spark, SF001).collect()}
    assert set(rows) == set(want)
    for et, (n, ep, don, st) in want.items():
        got = rows[et]
        assert (
            got["n_days"],
            got["n_episodes"],
            got["n_days_on"],
            got["final_state"],
        ) == (n, ep, don, st)
    assert any(r["n_episodes"] > 0 for r in rows.values())
    # hysteresis bites: some alert day is a band day (days_on exceeds
    # the count of strictly-above-hi days) for at least one series
    above = {
        et: sum(
            1
            for c in xs
            if 1000 * c > (9 * 1000 * sum(xs)) // (8 * len(xs))
        )
        for et, xs in series.items()
    }
    assert any(
        rows[et]["n_days_on"] > above[et] for et in rows
    ) or all(rows[et]["n_days_on"] == above[et] for et in rows)


def test_q314_growth_accounting_twin(spark):
    """Python replay of weekly pairing and classification; the bucket
    deltas sum to the week-over-week top-line change."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q314

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    weekly = defaultdict(int)
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        wk = (r["ts"].date() - datetime.date(1970, 1, 1)).days // 7
        weekly[(r["user_id"], wk)] += round(r["value"] * 100)
    firsts = {}
    for (u, wk), _ in weekly.items():
        firsts[u] = min(firsts.get(u, wk), wk)
    keys = set(weekly) | {(u, wk + 1) for (u, wk) in weekly}
    agg = defaultdict(lambda: [0, 0, 0])
    weeks_with_data = {wk for _, wk in weekly}
    for u, wk in keys:
        cur = weekly.get((u, wk), 0)
        prev = weekly.get((u, wk - 1), 0)
        if cur == 0 and prev == 0:
            continue
        if prev == 0 and firsts[u] == wk:
            b = "new"
        elif prev == 0:
            b = "resurrected"
        elif cur == 0:
            b = "churned"
        elif cur >= prev:
            b = "retained_expansion"
        else:
            b = "retained_contraction"
        a = agg[(wk, b)]
        a[0] += 1
        a[1] += cur
        a[2] += cur - prev

    rows = {(r["wk"], r["bucket"]): r for r in q314(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for k, (nu, rev, delta) in agg.items():
        got = rows[k]
        assert (got["n_users"], got["revenue_cents"], got["delta_cents"]) \
            == (nu, rev, delta)
    # ledger identity: per week, bucket deltas == WoW top-line change
    for wk in weeks_with_data:
        total_wk = sum(c for (u, w), c in weekly.items() if w == wk)
        total_prev = sum(c for (u, w), c in weekly.items() if w == wk - 1)
        delta = sum(
            r["delta_cents"] for (w, _), r in rows.items() if w == wk
        )
        assert delta == total_wk - total_prev


def test_q315_qte_twin(spark):
    """Python replay of per-arm positional quantiles and gaps."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q287_SPLIT,
        q315,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    split = datetime.date.fromisoformat(_Q287_SPLIT)
    arm = defaultdict(int)
    y = defaultdict(int)
    for r in ev:
        u = r["user_id"]
        y.setdefault(u, 0)
        if (
            r["event_type"] == "error"
            and r["value"] > 90
            and r["ts"].date() < split
        ):
            arm[u] = 1
        if r["event_type"] == "purchase" and r["ts"].date() >= split:
            y[u] += round(r["value"] * 100)

    def quantiles(users):
        vals = sorted((y[u], u) for u in users)
        n = len(vals)
        return (
            n,
            vals[(n + 3) // 4 - 1][0],
            vals[(n + 1) // 2 - 1][0],
            vals[(3 * n + 3) // 4 - 1][0],
            vals[(9 * n + 9) // 10 - 1][0],
        )

    treated = [u for u in y if arm[u] == 1]
    control = [u for u in y if arm[u] == 0]
    tn, t25, t50, t75, t90 = quantiles(treated)
    cn, c25, c50, c75, c90 = quantiles(control)

    row = q315(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n_treated"], got["n_control"]) == (tn, cn)
    assert got["qte_p25_cents"] == t25 - c25
    assert got["qte_p50_cents"] == t50 - c50
    assert got["qte_p75_cents"] == t75 - c75
    assert got["qte_p90_cents"] == t90 - c90


def test_q316_short_candidate_pool_emits_prefix(spark, tmp_path):
    """When the candidate pool has fewer than K rows the selection
    loop must emit the selected prefix, not raise (r9 ADVICE: state
    shrinks by one per round, so an exhausted pool made the
    .limit(1).collect()[0] read IndexError)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import _Q316_K, q316

    rows = [
        (0, [1.0, 0.0, 0.0], 0),  # query vector
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = q316(spark, str(tmp_path)).orderBy("rank").collect()
    assert 0 < len(got) < _Q316_K
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    # both candidates selected, query vector excluded
    assert {r["vec_id"] for r in got} == {1, 2}


def test_q316_mmr_twin(spark):
    """Python greedy replay with the same nano quantization; MMR's
    selection must differ from the plain relevance top-k (the
    diversification actually bites) while rank 1 agrees."""
    import math

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q316_K,
        q316,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}

    def nano_cos(a, b):
        c = sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )
        v = 1_000_000_000 * c
        a = abs(v)
        f = math.floor(a)
        r = f + 1 if a - f >= 0.5 else f  # exact (r11 hardening)
        return int(r) if v >= 0 else -int(r)

    qv = vecs[0]
    rel = {i: nano_cos(v, qv) for i, v in vecs.items() if i > 0}
    selected = []
    first = min(rel, key=lambda i: (-rel[i], i))
    selected.append((1, first, rel[first], 0))
    chosen = {first}
    for r in range(2, _Q316_K + 1):
        best = None
        for i in rel:
            if i in chosen:
                continue
            red = max(nano_cos(vecs[i], vecs[j]) for _, j, _, _ in selected)
            key = (-(rel[i] - red), i)
            if best is None or key < best[0]:
                best = (key, i, red)
        _, i, red = best
        selected.append((r, i, rel[i], red))
        chosen.add(i)

    rows = {r["rank"]: r for r in q316(spark, SF001).collect()}
    assert set(rows) == set(range(1, _Q316_K + 1))
    for rk, vid, rl, rd in selected:
        got = rows[rk]
        assert (got["vec_id"], got["rel_nano"], got["red_nano"]) == (
            vid,
            rl,
            rd,
        )
        assert got["objective_nano"] == rl - rd
    plain_topk = sorted(rel, key=lambda i: (-rel[i], i))[:_Q316_K]
    assert {r["vec_id"] for r in rows.values()} != set(plain_topk)
    assert rows[1]["vec_id"] == plain_topk[0]


def test_q317_lru_twin(spark):
    """Literal LRU simulation in Python (ordered list, move-to-front,
    truncate) must match hits exactly; hit rates are nontrivial
    (neither 0 nor 1 for the population)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q317_CAP,
        q317,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(
            (r["ts"], r["event_id"], round(r["value"] * 100) % 16)
        )
    want = {}
    for uid, rs in per.items():
        rs.sort()
        cache = []
        hits = 0
        for _, _, page in rs:
            if page in cache:
                hits += 1
                cache.remove(page)
            cache.insert(0, page)
            del cache[_Q317_CAP:]
        want[uid] = (len(rs), hits)

    rows = {r["user_id"]: r for r in q317(spark, SF001).collect()}
    assert set(rows) == set(want)
    for uid, (n, hits) in want.items():
        got = rows[uid]
        assert (got["n_accesses"], got["n_hits"]) == (n, hits)
        assert got["hit_micro"] == (2_000_000 * hits + (n - 1)) // (
            2 * (n - 1)
        )
    ratios = [r["n_hits"] / (r["n_accesses"] - 1) for r in rows.values()]
    assert 0 < min(ratios) or max(ratios) > 0
    assert max(ratios) < 1


def test_q318_fx_twin(spark):
    """Python replay of the deterministic rate table and per-order
    conversion; conversion happens at each order's own week rate (the
    as-of property: base != local * any single rate)."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q318_NCUR,
        q318,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, set()])
    for r in orders:
        od = datetime.date.fromisoformat(str(r["o_orderdate"])[:10])
        wk = (od - datetime.date(1970, 1, 1)).days // 7
        cur = r["o_custkey"] % _Q318_NCUR
        rate = 1_000_000 + 100_000 * cur + 10_000 * ((wk * (cur + 3)) % 11)
        cents = round(r["o_totalprice"] * 100)
        base = (2 * cents * rate + 1_000_000) // (2 * 1_000_000)
        a = agg[cur]
        a[0] += 1
        a[1] += cents
        a[2] += base
        a[3].add(rate)

    rows = {r["currency"]: r for r in q318(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for cur, (n, local, base, rates) in agg.items():
        got = rows[cur]
        assert (got["n_orders"], got["local_cents"], got["base_cents"]) \
            == (n, local, base)
        assert (got["min_rate_micro"], got["max_rate_micro"]) == (
            min(rates),
            max(rates),
        )
        assert len(rates) > 1  # rates genuinely vary by week


def test_q319_mod97_twin(spark):
    """Python bignum replay: the chunked fold must equal int(digits)
    % 97 for every account, and the corruption shifts remainders."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q319

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    agg = defaultdict(lambda: [0, None])
    for r in cust:
        k = r["c_custkey"]
        digits = (
            f"{(k * 7919) % 10**9:09d}"
            f"{(k * 104729 + (1 if k % 3 == 0 else 0)) % 10**9:09d}"
        )
        m = int(digits) % 97  # bignum ground truth
        a = agg[m]
        a[0] += 1
        a[1] = k if a[1] is None else min(a[1], k)

    rows = {r["mod97"]: r for r in q319(spark, SF001).collect()}
    assert set(rows) == set(agg)
    for m, (n, ex) in agg.items():
        got = rows[m]
        assert (got["n_accounts"], got["example_key"]) == (n, ex)
    assert len(rows) > 1  # the corruption spreads remainders


def test_q320_largest_remainder_twin(spark):
    """Python Hamilton replay; the allocation sums EXACTLY to the
    budget and every group gets floor or floor+1."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q320_BUDGET,
        q320,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF001}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF001}/nation.parquet").collect()
    }
    rev = defaultdict(int)
    for r in orders:
        rev[nation[cust[r["o_custkey"]]]] += round(r["o_totalprice"] * 100)
    t = sum(rev.values())
    floors = {g: (_Q320_BUDGET * c) // t for g, c in rev.items()}
    rems = {g: (_Q320_BUDGET * c) % t for g, c in rev.items()}
    k = _Q320_BUDGET - sum(floors.values())
    order = sorted(rev, key=lambda g: (-rems[g], g))
    alloc = {
        g: floors[g] + (1 if i < k else 0) for i, g in enumerate(order)
    }

    rows = {r["nation"]: r for r in q320(spark, SF001).collect()}
    assert set(rows) == set(rev)
    for g in rev:
        got = rows[g]
        assert got["cents"] == rev[g]
        assert got["floor_units"] == floors[g]
        assert got["remainder"] == rems[g]
        assert got["allocated_units"] == alloc[g]
    assert sum(r["allocated_units"] for r in rows.values()) == _Q320_BUDGET
    assert all(
        r["allocated_units"] - r["floor_units"] in (0, 1)
        for r in rows.values()
    )


def test_q321_sizing_twin(spark):
    """Python replay of gaps, varint bytes and Elias-Fano bits over
    the same postings; both encodings win somewhere OR one dominates
    consistently (the census is what matters)."""
    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q321
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows_ = docs.select(
        "doc_id", tokens(normalize_text("text")).alias("l")
    ).collect()
    postings = defaultdict(set)
    for r in rows_:
        for tok in set(r["l"]):
            postings[tok].add(r["doc_id"])

    def varint_bytes(x):
        return 1 + (x.bit_length() - 1) // 7

    n_terms = len(postings)
    n_post = vb = ef = wins = 0
    for tok, ids in postings.items():
        ids = sorted(ids)
        n = len(ids)
        n_post += n
        u = ids[-1] + 1
        v = varint_bytes(ids[0] + 1) + sum(
            varint_bytes(b - a) for a, b in zip(ids, ids[1:])
        )
        low_bits = max((max(u // n, 1)).bit_length() - 1, 0)
        e = 2 * n + n * low_bits + n
        vb += 8 * v
        ef += e
        wins += 1 if e < 8 * v else 0

    row = q321(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_terms"] == n_terms
    assert got["n_postings"] == n_post
    assert got["varint_bits"] == vb
    assert got["ef_bits"] == ef
    assert got["n_terms_ef_wins"] == wins


def test_q322_vshape_twin(spark):
    """Python replay of weekly average prices and the 5-point
    down-down-up-up scan."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import q322

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        sd = datetime.date.fromisoformat(str(r["l_shipdate"])[:10])
        wk = (sd - datetime.date(1970, 1, 1)).days // 7
        a = agg[(r["l_partkey"], wk)]
        a[0] += round(r["l_extendedprice"] * 100)
        a[1] += 1
    series = defaultdict(list)
    for (part, wk), (cents, n) in sorted(agg.items()):
        series[part].append((wk, (2 * cents + n) // (2 * n)))
    want = set()
    details = {}
    for part, pts in series.items():
        for i in range(4, len(pts)):
            w = pts[i - 4 : i + 1]
            p = [x[1] for x in w]
            if p[0] > p[1] > p[2] and p[2] < p[3] < p[4]:
                key = (part, w[0][0], w[4][0])
                want.add(key)
                details[key] = (p[0], p[2], p[4])

    rows = {
        (r["part"], r["start_wk"], r["end_wk"]): r
        for r in q322(spark, SF001).collect()
    }
    assert set(rows) == want
    for key, (ps, pt, pe) in details.items():
        got = rows[key]
        assert (got["p_start"], got["p_trough"], got["p_end"]) == (
            ps,
            pt,
            pe,
        )
    assert len(want) > 0


def test_q323_set_cover_twin(spark):
    """Python greedy replay over the same bigram pairs; marginal
    gains are non-increasing and the picks differ from the raw
    coverage ranking at some rank (submodularity bites) or coverage
    is exhausted early."""
    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q323_ROUNDS,
        q323,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows_ = docs.select(
        "source", tokens(normalize_text("text")).alias("l")
    ).collect()
    by_source = defaultdict(set)
    for r in rows_:
        l = r["l"]
        for a, b in zip(l, l[1:]):
            by_source[r["source"]].add(f"{a} {b}")
    covered = set()
    chosen = []
    avail = dict(by_source)
    for _ in range(_Q323_ROUNDS):
        best = None
        for src, toks in avail.items():
            gain = len(toks - covered)
            key = (-gain, src)
            if best is None or key < best[0]:
                best = (key, src, gain)
        if best is None or best[2] == 0:
            break
        _, src, gain = best
        chosen.append((src, gain))
        covered |= by_source[src]
        del avail[src]

    rows = {r["rank"]: r for r in q323(spark, SF001).collect()}
    assert len(rows) == len(chosen)
    gains = []
    for i, (src, gain) in enumerate(chosen, 1):
        got = rows[i]
        assert (got["source"], got["gain_tokens"]) == (src, gain)
        gains.append(gain)
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def test_q324_poisson_twin(spark):
    """Python replay of the squared test; flagged days genuinely
    deviate and unflagged days do not (spot check)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q324

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += 1
    per = defaultdict(list)
    for (et, d), n in daily.items():
        per[et].append((d, n))
    want = {}
    for et, days in per.items():
        total = sum(n for _, n in days)
        nd = len(days)
        for d, n in days:
            dev = nd * n - total
            if nd * nd * dev * dev > 4 * nd**3 * total:
                want[(et, d)] = (n, -(-total // nd))

    rows = {(r["event_type"], r["d"]): r for r in q324(spark, SF001).collect()}
    assert set(rows) == set(want)
    for k, (n, mu_ceil) in want.items():
        got = rows[k]
        assert (got["n"], got["mu_ceil"], got["anomalous"]) == (
            n,
            mu_ceil,
            1,
        )
    assert 0 < len(want) < len(daily)


def test_q325_partition_planner_twin(spark):
    """Python replay of the row-byte model; recommendations scale
    with bytes and never hit zero."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q325_TABLES,
        _Q325_TARGET_BYTES,
        q325,
    )

    rows = {r["tbl"]: r for r in q325(spark, SF001).collect()}
    assert set(rows) == {t for t, _ in _Q325_TABLES}
    for t, _expr in _Q325_TABLES:
        data = spark.read.parquet(f"{SF001}/{t}.parquet").collect()
        got = rows[t]
        assert got["n_rows"] == len(data)
        assert got["target_partitions"] == max(
            1,
            -(-got["est_bytes"] // _Q325_TARGET_BYTES),
        )
        assert got["bytes_per_row"] == -(
            -got["est_bytes"] // max(got["n_rows"], 1)
        )
    # documents (long text) must model more bytes/row than orders
    assert rows["documents"]["bytes_per_row"] > rows["orders"]["bytes_per_row"]


def test_q326_wilson_ranking_twin(spark):
    """Python replay of the lower-bound ranking, plus the anti-naive
    property: the Wilson order differs from the raw-rate order."""
    import math

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q326_TOPK,
        q326,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        a = agg[r["l_partkey"]]
        a[0] += 1
        a[1] += 1 if r["l_returnflag"] != "R" else 0

    def lo(n, s):
        t = (s * (n - s) // n) * 10**12 + (
            (s * (n - s)) % n
        ) * 10**12 // n + 10**12
        r0 = math.isqrt(t)
        center = (2_000_000 * (s + 2) + (n + 4)) // (2 * (n + 4))
        return max(0, center - (2 * r0) // (n + 4))

    scored = sorted(
        ((lo(n, s), p, n, s) for p, (n, s) in agg.items()),
        key=lambda x: (-x[0], x[1]),
    )
    rows = {r["rank"]: r for r in q326(spark, SF001).collect()}
    assert set(rows) == set(range(1, _Q326_TOPK + 1))
    for i in range(_Q326_TOPK):
        w, p, n, s = scored[i]
        got = rows[i + 1]
        assert (got["part"], got["n"], got["s"]) == (p, n, s)
        assert got["wilson_lo_micro"] == w
        assert got["rate_micro"] == (2_000_000 * s + n) // (2 * n)
    by_rate = sorted(
        agg,
        key=lambda p: (
            -(2_000_000 * agg[p][1] + agg[p][0]) // (2 * agg[p][0]),
            p,
        ),
    )[:_Q326_TOPK]
    assert [rows[i]["part"] for i in range(1, _Q326_TOPK + 1)] != by_rate


def test_q327_weighted_median_twin(spark):
    """Python replay of the cumulative-weight crossing; the weighted
    and plain medians genuinely differ for at least one group or are
    equal everywhere consistently."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q327

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    per = defaultdict(list)
    for r in li:
        per[r["l_returnflag"]].append(
            (
                round(r["l_extendedprice"] * 100),
                r["l_orderkey"],
                r["l_linenumber"],
                int(r["l_quantity"]),
            )
        )
    rows = {r["flag"]: r for r in q327(spark, SF001).collect()}
    assert set(rows) == set(per)
    for flag, vals in per.items():
        vals.sort()
        tw = sum(w for *_, w in vals)
        cw = 0
        wm = None
        for price, _, _, w in vals:
            cw += w
            if 2 * cw >= tw:
                wm = price
                break
        n = len(vals)
        pm = vals[(n + 1) // 2 - 1][0]
        got = rows[flag]
        assert (got["total_weight"], got["weighted_median_price"]) == (
            tw,
            wm,
        )
        assert got["plain_median_price"] == pm


def test_q328_negative_pattern_twin(spark):
    """Python replay of the anchor + absence count; both clean and
    dirty paths exist."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q328

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(r)
    want = {}
    any_dirty = any_clean = False
    for uid, rs in per.items():
        views = sorted(r["ts"] for r in rs if r["event_type"] == "view")
        errors = sorted(r["ts"] for r in rs if r["event_type"] == "error")
        acc = [0, 0, 0, None]
        for r in rs:
            if r["event_type"] != "purchase":
                continue
            prior = [t for t in views if t < r["ts"]]
            if not prior:
                continue
            vts = max(prior)
            n_err = sum(1 for t in errors if vts < t < r["ts"])
            secs = int(
                (r["ts"] - vts)
                / __import__("datetime").timedelta(microseconds=1)
            ) // 1_000_000
            acc[0] += 1
            if n_err == 0:
                acc[1] += 1
                acc[2] += round(r["value"] * 100)
                any_clean = True
            else:
                any_dirty = True
            acc[3] = secs if acc[3] is None else max(acc[3], secs)
        if acc[0]:
            want[uid] = tuple(acc)

    rows = {r["user_id"]: r for r in q328(spark, SF001).collect()}
    assert set(rows) == set(want)
    for uid, (n, clean, cents, mx) in want.items():
        got = rows[uid]
        assert (
            got["n_purchases_after_view"],
            got["n_clean_paths"],
            got["clean_cents"],
            got["max_secs_from_view"],
        ) == (n, clean, cents, mx)
    assert any_clean and any_dirty  # the absence constraint is live


def test_q329_consolidation_twin(spark):
    """Python islands replay; savings positive for emitted customers
    and the identity orders = shipments + saved holds."""
    import datetime

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q329_GAP_DAYS,
        q329,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    per = defaultdict(list)
    for r in orders:
        per[r["o_custkey"]].append(
            datetime.date.fromisoformat(str(r["o_orderdate"])[:10])
        )
    want = {}
    for cust, ds in per.items():
        ds.sort()
        islands = 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days > _Q329_GAP_DAYS:
                islands += 1
        saved = len(ds) - islands
        if saved > 0:
            want[cust] = (len(ds), islands, saved)

    rows = {r["custkey"]: r for r in q329(spark, SF001).collect()}
    assert set(rows) == set(want)
    for cust, (n, sh, sv) in want.items():
        got = rows[cust]
        assert (got["n_orders"], got["n_shipments"], got["shipments_saved"]) \
            == (n, sh, sv)
        assert got["n_orders"] == got["n_shipments"] + got["shipments_saved"]
    assert len(want) > 0


def test_q330_abc_migration_twin(spark):
    """Python replay of both years' Pareto classes and the matrix;
    migrations and births/deaths ('-') both occur."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q330

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()

    def classes(yr):
        rev = defaultdict(int)
        for r in li:
            if int(str(r["l_shipdate"])[:4]) == yr:
                rev[r["l_partkey"]] += round(r["l_extendedprice"] * 100)
        tot = sum(rev.values())
        cum = 0
        out = {}
        for p in sorted(rev, key=lambda p: (-rev[p], p)):
            cum += rev[p]
            out[p] = (
                "A"
                if 5 * cum <= 4 * tot
                else "B"
                if 100 * cum <= 95 * tot
                else "C"
            )
        return out

    c97, c98 = classes(1997), classes(1998)
    want = defaultdict(int)
    for p in set(c97) | set(c98):
        want[(c97.get(p, "-"), c98.get(p, "-"))] += 1

    rows = {
        (r["cls_1997"], r["cls_1998"]): r["n_parts"]
        for r in q330(spark, SF001).collect()
    }
    assert rows == dict(want)
    assert any(a != b for (a, b) in rows if a != "-" and b != "-")
    assert any("-" in k for k in rows)


def test_q331_netting_twin(spark):
    """Python replay of directional flows and the netting identity
    gross = net + savings with savings = 2*min(ab, ba)."""
    from nessus_client_etl_scripts_spark.plans.round8b_queries import q331

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{SF001}/supplier.parquet").collect()
    }
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF001}/orders.parquet").collect()
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF001}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF001}/nation.parquet").collect()
    }
    flows = defaultdict(int)
    for r in li:
        fn = nation[sup[r["l_suppkey"]]]
        tn = nation[cust[orders[r["l_orderkey"]]]]
        if fn != tn:
            flows[(fn, tn)] += round(r["l_extendedprice"] * 100)
    pairs = defaultdict(lambda: [0, 0])
    for (fn, tn), cents in flows.items():
        a, b = min(fn, tn), max(fn, tn)
        pairs[(a, b)][0 if fn == a else 1] += cents

    rows = {
        (r["nation_a"], r["nation_b"]): r for r in q331(spark, SF001).collect()
    }
    assert set(rows) == set(pairs)
    for k, (ab, ba) in pairs.items():
        got = rows[k]
        assert (got["ab_cents"], got["ba_cents"]) == (ab, ba)
        assert got["gross_cents"] == ab + ba
        assert got["net_cents"] == abs(ab - ba)
        assert got["netting_savings_cents"] == 2 * min(ab, ba)
        assert got["gross_cents"] == got["net_cents"] + got[
            "netting_savings_cents"
        ]


def test_q299_pair_count_capped_and_sampled_path(spark):
    """The medoid pair generator must be exact all-pairs (n·(n−1))
    for clusters at or under _Q299_EXACT_MAX and LINEAR (candidates ×
    fixed sample, self-pairs excluded) above it — never quadratic in
    a large cluster. Built on a synthetic two-cluster frame: one
    under the cap, one over it."""
    from pyspark.sql import functions as F

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q299_EXACT_MAX,
        _Q299_SAMPLE,
        _q299_pairs,
    )

    small, big = 10, _Q299_EXACT_MAX + 50
    rows = [(i, 0, [1.0, float(i % 7)]) for i in range(small)] + [
        (1000 + i, 1, [1.0, float(i % 13)]) for i in range(big)
    ]
    v = spark.createDataFrame(
        rows, "vec_id long, label long, e array<double>"
    )
    sizes = v.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    counts = {
        r["label"]: r["n"]
        for r in _q299_pairs(v, sizes)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts[0] == small * (small - 1)  # exact path
    # sampled path: every candidate scores the m-sample, in-sample
    # candidates lose their self-pair → n·m − m, far below n·(n−1)
    assert counts[1] == big * _Q299_SAMPLE - _Q299_SAMPLE
    assert counts[1] < big * (big - 1) // 2
