"""Round-12 wave tests (plans/round12_queries.py): pure-Python twins
at sf0.001 for the six serving/eval-tier queries, plus semantic
contract checks (bucket-capacity invariant, quota/budget monotonicity,
ELO zero-sum, degenerate-group handling, attribution consistency,
keep-rule divergence)."""

from __future__ import annotations

import math
import re
from collections import defaultdict
from datetime import datetime

_EPOCH = datetime(1970, 1, 1)


def _epoch_us(dt) -> int:
    """Exact integer epoch micros (float .timestamp() can round across
    a truncation boundary)."""
    td = dt - _EPOCH
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

SF001 = "/root/testdata/sf0.001"


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _milli(num: int, den: int) -> int:
    return _trunc_div(2000 * num + (den if num >= 0 else -den), 2 * den)


def _half_away(x: float) -> int:
    a = abs(x)
    f = math.floor(a)
    r = f + 1 if a - f >= 0.5 else f
    return int(r) if x >= 0 else -int(r)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _events(spark):
    return spark.read.parquet(f"{SF001}/events.parquet").collect()


def _docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").collect()


def _embs(spark):
    return [
        (r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
        for r in spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ]


def _cos_nano(a, b):
    qa = [_half_away(x * 1_000_000) for x in a]
    qb = [_half_away(x * 1_000_000) for x in b]
    d = sum(x * y for x, y in zip(qa, qb))
    c = 1_000_000_000 * (
        d
        / (
            math.sqrt(sum(x * x for x in qa))
            * math.sqrt(sum(y * y for y in qb))
        )
    )
    return _half_away(c)


# ---------------------------------------------------------------------------
# q344 — token bucket
# ---------------------------------------------------------------------------


def _bucket_sim(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q344_CAP_MS,
    )

    per_user = defaultdict(list)
    for r in _events(spark):
        per_user[r["user_id"]].append(r)
    out = {}
    for u, evs in per_user.items():
        seq = sorted(
            (_epoch_us(e["ts"]) // 1000, e["event_id"]) for e in evs
        )
        credit, adm = _Q344_CAP_MS, 0
        prev = None
        for t, eid in seq:
            gap = 0 if prev is None else t - prev
            prev = t
            credit = min(_Q344_CAP_MS, credit + gap)
            cost = (15 + (eid % 7) * 5) * 1_000_000
            if credit >= cost:
                credit -= cost
                adm += 1
        out[u] = (len(seq), adm, credit)
    return out


def test_q344_token_bucket_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q344

    sim = _bucket_sim(spark)
    want = sorted(
        (u, n, adm, n - adm, _milli(adm, n), credit)
        for u, (n, adm, credit) in sim.items()
    )
    assert _rows(q344(spark, SF001)) == want


def test_q344_contracts(spark):
    """All three branches fire, capacity bounds hold, counts add up."""
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q344_CAP_MS,
        q344,
    )

    rows = q344(spark, SF001).collect()
    assert sum(r["n_admitted"] for r in rows) > 0
    assert sum(r["n_rejected"] for r in rows) > 0
    for r in rows:
        assert r["n_admitted"] + r["n_rejected"] == r["n_events"]
        assert 0 <= r["credit_ms"] <= _Q344_CAP_MS


# ---------------------------------------------------------------------------
# q345 — quota knapsack
# ---------------------------------------------------------------------------


def _q345_sim(spark):
    docs = []
    for r in _docs(spark):
        toks = r["text"].split(" ")
        content = sum(1 for t in toks if len(t) >= 4)
        docs.append(
            (r["doc_id"], r["source"], len(toks),
             _milli(1000 * content, len(toks)))
        )
    stot = defaultdict(int)
    for _, src, tok, _d in docs:
        stot[src] += tok
    # phase 1: per-source cap
    surv = []
    scum = defaultdict(int)
    for d, src, tok, dens in sorted(docs, key=lambda x: (x[1], -x[3], x[0])):
        scum[src] += tok
        if scum[src] <= _trunc_div(stot[src] * 2, 5):
            surv.append((d, src, tok, dens))
    # phase 2: global budget
    gtot = sum(tok for _, _, tok, _ in docs)
    sel, gcum = [], 0
    for d, src, tok, dens in sorted(surv, key=lambda x: (-x[3], x[0])):
        gcum += tok
        if gcum <= gtot // 4:
            sel.append((d, src, tok))
    return docs, stot, surv, sel


def test_q345_quota_knapsack_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q345

    docs, stot, surv, sel = _q345_sim(spark)
    ndocs = defaultdict(int)
    for _, src, _t, _d in docs:
        ndocs[src] += 1
    nsurv = defaultdict(int)
    for _, src, _t, _d in surv:
        nsurv[src] += 1
    nsel, tsel = defaultdict(int), defaultdict(int)
    for _, src, tok in sel:
        nsel[src] += 1
        tsel[src] += tok
    want = sorted(
        (
            src,
            ndocs[src],
            stot[src],
            nsurv[src],
            nsel[src],
            tsel[src],
            _milli(tsel[src], stot[src]),
        )
        for src in stot
    )
    assert _rows(q345(spark, SF001)) == want


def test_q345_contracts(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q345

    rows = q345(spark, SF001).collect()
    gtot = sum(r["tokens_total"] for r in rows)
    assert sum(r["tokens_selected"] for r in rows) <= gtot // 4
    for r in rows:
        # the two constraint cuts are nested: selected ⊆ cap
        # survivors ⊆ docs
        assert r["n_selected"] <= r["n_after_cap"] <= r["n_docs"]
        # per-source quota holds on the final selection too
        assert r["tokens_selected"] <= _trunc_div(r["tokens_total"] * 2, 5)
    # both cuts actually fire somewhere
    assert any(r["n_after_cap"] < r["n_docs"] for r in rows)
    assert any(r["n_selected"] < r["n_after_cap"] for r in rows)


# ---------------------------------------------------------------------------
# q346 — ELO replay
# ---------------------------------------------------------------------------


def _q346_sim(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q346_EPOCH_DAY,
        _Q346_ETAB,
        _Q346_K,
        _Q346_R0,
        _Q346_ROUNDS,
    )

    grid = defaultdict(lambda: [0, 0])  # (rnd, a, b) -> [n, ss]
    for r in _events(spark):
        day = _epoch_us(r["ts"]) // 86_400_000_000
        rnd = min(_Q346_ROUNDS - 1, max(0, (day - _Q346_EPOCH_DAY) // 4))
        a = r["event_id"] % 8
        b = (a + 1 + (r["event_id"] // 8) % 7) % 8
        s = 1 if _half_away(r["value"] * 100) % 2 == 0 else 0
        g = grid[(rnd, a, b)]
        g[0] += 1
        g[1] += s
    rat = [_Q346_R0] * 8
    for rnd in range(_Q346_ROUNDS):
        deltas = [0] * 8
        for (g_rnd, a, b), (n, ss) in grid.items():
            if g_rnd != rnd:
                continue
            k = max(-8, min(8, _trunc_div(rat[b] - rat[a], 50_000)))
            da = _Q346_K * (ss * 1000 - n * _Q346_ETAB[k + 8])
            deltas[a] += da
            deltas[b] -= da
        rat = [rat[i] + deltas[i] for i in range(8)]
    matches, wins = [0] * 8, [0] * 8
    for (g_rnd, a, b), (n, ss) in grid.items():
        matches[a] += n
        wins[a] += ss
        matches[b] += n
        wins[b] += n - ss
    return rat, matches, wins


def test_q346_elo_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q346

    rat, matches, wins = _q346_sim(spark)
    want = sorted((p, rat[p], matches[p], wins[p]) for p in range(8))
    assert _rows(q346(spark, SF001)) == want


def test_q346_contracts(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q346_R0,
        q346,
    )

    rows = q346(spark, SF001).collect()
    # ELO with a complementary E-table is exactly zero-sum
    assert sum(r["rating_milli"] - _Q346_R0 for r in rows) == 0
    n_events = len(_events(spark))
    assert sum(r["n_matches"] for r in rows) == 2 * n_events
    assert sum(r["n_wins"] for r in rows) == n_events
    # ratings actually diverged (the E-table path is exercised)
    assert len({r["rating_milli"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# q347 — GRPO advantage
# ---------------------------------------------------------------------------


def _q347_sim(spark):
    groups = defaultdict(list)
    for r in _events(spark):
        rew = (
            _half_away(r["value"] * 100)
            if r["event_type"] in ("purchase", "click")
            else 0
        )
        groups[r["event_id"] // 8].append((r["event_id"] % 8, rew))
    per_pos = defaultdict(lambda: [0, 0, 0, None, None])
    for _pid, cands in groups.items():
        n = len(cands)
        s = sum(r for _, r in cands)
        ss = sum(r * r for _, r in cands)
        var_num = n * ss - s * s
        for pos, r in cands:
            if var_num > 0:
                z = _half_away(
                    (1000 * (n * r - s)) / math.sqrt(var_num)
                )
            else:
                z = 0
            a = per_pos[pos]
            a[0] += 1
            a[1] += var_num == 0
            a[2] += z
            a[3] = z if a[3] is None else min(a[3], z)
            a[4] = z if a[4] is None else max(a[4], z)
    return per_pos


def test_q347_grpo_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q347

    per_pos = _q347_sim(spark)
    want = sorted(
        (pos, n, nz, sz, mn, mx)
        for pos, (n, nz, sz, mn, mx) in per_pos.items()
    )
    assert _rows(q347(spark, SF001)) == want


def test_q347_degenerate_groups_fire(spark):
    """The zero-variance (all-rewards-equal) branch is REAL at sf0.001
    (PLANS.md r8 rule #4) — the event-type gate creates all-zero
    groups."""
    from nessus_client_etl_scripts_spark.plans.round12_queries import q347

    rows = q347(spark, SF001).collect()
    assert sum(r["n_zero_var"] for r in rows) > 0
    # advantage sums to ~0 within each group, so per-pos sums are
    # small relative to candidate count × 1000 (sanity, not exact:
    # rounding leaves ±1 per candidate)
    assert all(abs(r["sum_z_milli"]) < 1000 * r["n_cands"] for r in rows)


# ---------------------------------------------------------------------------
# q348 — provenance attribution
# ---------------------------------------------------------------------------


def test_q348_provenance_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import (
        _Q348_TAU_NANO,
        q348,
    )

    by_label = defaultdict(list)
    for vid, lab, e in _embs(spark):
        if lab is not None:
            by_label[lab].append((vid, e))
    want = []
    for lab, vecs in by_label.items():
        vecs.sort()
        counts = defaultdict(int)
        n_hits = 0
        for i, (vid, e) in enumerate(vecs):
            for o, eo in vecs[:i]:
                if _cos_nano(e, eo) >= _Q348_TAU_NANO:
                    counts[o] += 1  # first-fit: earliest provider
                    n_hits += 1
                    break
        if not counts:
            continue
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append(
            (
                lab,
                n_hits,
                len(counts),
                top[0],
                top[1],
                _milli(top[1], n_hits),
            )
        )
    assert _rows(q348(spark, SF001)) == sorted(want)


def test_q348_consistent_with_q343(spark):
    """Attributed hit totals must equal q343's hit counts per label —
    same pair frame, same threshold, different rollup."""
    from nessus_client_etl_scripts_spark.plans.round11_queries import q343
    from nessus_client_etl_scripts_spark.plans.round12_queries import q348

    hits343 = {
        r["label"]: r["n_hits"]
        for r in q343(spark, SF001).collect()
        if r["label"] is not None and r["n_hits"] > 0
    }
    rows = q348(spark, SF001).collect()
    assert {r["label"]: r["n_hits"] for r in rows} == hits343
    for r in rows:
        assert 1 <= r["top_hits"] <= r["n_hits"]
        assert r["n_active_providers"] >= 1


# ---------------------------------------------------------------------------
# q349 — canonicalization keep audit
# ---------------------------------------------------------------------------


def _shingle_set(text: str, k: int = 3):
    norm = re.sub(r"\s+", " ", text.lower().strip())
    toks = norm.split(" ")
    return {
        " ".join(toks[i : i + k])
        for i in range(max(len(toks) - k, 0) + 1)
    }


def test_q349_canonical_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q349

    docs = _docs(spark)
    sh = {r["doc_id"]: _shingle_set(r["text"]) for r in docs}
    lang = {r["doc_id"]: r["lang"] for r in docs}
    chars = {r["doc_id"]: r["n_chars"] for r in docs}
    ids = sorted(sh)
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if lang[a] != lang[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(list)
    for d in ids:
        clusters[find(d)].append(d)
    want = []
    for cid, members in clusters.items():
        if len(members) < 2:
            continue
        first = min(members)
        keep = min(members, key=lambda d: (-chars[d], d))
        want.append(
            (
                cid,
                len(members),
                first,
                keep,
                keep != first,
                chars[first],
                chars[keep],
                _milli(chars[keep] - chars[first], chars[first]),
            )
        )
    assert _rows(q349(spark, SF001)) == sorted(want)


def test_q349_divergence_fires(spark):
    from nessus_client_etl_scripts_spark.plans.round12_queries import q349

    rows = q349(spark, SF001).collect()
    assert len(rows) > 0
    assert any(r["divergent"] for r in rows)
    assert any(not r["divergent"] for r in rows)
    for r in rows:
        # the quality rule never keeps a shorter doc than "first"
        assert r["keep_chars"] >= r["first_chars"]
        assert r["char_gain_milli"] >= 0
