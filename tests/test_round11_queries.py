"""Round-11 wave tests (plans/round11_queries.py): pure-Python twins
at sf0.001 for the ten serving/eval-tier queries, plus semantic
contract checks (MG error-bound guarantee, mutual-edge symmetry,
prefix-savings monotonicity)."""

from __future__ import annotations

import hashlib
import json
import math
from collections import Counter, defaultdict

SF001 = "/root/testdata/sf0.001"


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _milli(num: int, den: int) -> int:
    return _trunc_div(2000 * num + (den if num >= 0 else -den), 2 * den)


def _half_away(x: float) -> int:
    """Exact round-half-away (DuckDB round / Spark F.round twin) via
    the fractional-part comparison — floor(abs+0.5) misrounds doubles
    just below a half (the +0.5 addition rounds across the boundary)."""
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


def _quant(a):
    """Micro-quantized vector (the q337/q343 score domain)."""
    return [_half_away(x * 1_000_000) for x in a]


def _cos_nano(a, b):
    """Nano cosine over micro-quantized vectors — the integer dots are
    exact, the scalar tail (sqrt/mul/div/×1e9/round) is the shared
    correctly-rounded chain, so this twin is bit-identical to both
    engines by construction."""
    qa, qb = _quant(a), _quant(b)
    d = sum(x * y for x, y in zip(qa, qb))
    c = 1_000_000_000 * (
        d
        / (
            math.sqrt(sum(x * x for x in qa))
            * math.sqrt(sum(y * y for y in qb))
        )
    )
    return _half_away(c)


def test_twin_nonnegativity_preconditions(spark):
    """The pure-python twins use Python's % and // whose results
    differ from BOTH engines on negative operands (Python -3 % 10 = 7;
    Spark and DuckDB give -3) — pin the nonnegativity of every field
    the twins fold with % or //."""
    for r in _events(spark):
        assert r["event_id"] >= 0
        assert json.loads(r["props"])["k"] >= 0
        assert r["user_id"] >= 0


def test_q334_ips_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import q334

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, matched, ips_num, w_sum
    for r in _events(spark):
        tgt = "purchase" if r["user_id"] % 2 == 0 else "click"
        k = json.loads(r["props"])["k"]
        w = 50400 // (1 + k % 10)
        assert 50400 % (1 + k % 10) == 0  # weights are exact integers
        m = 1 if r["event_type"] == tgt else 0
        cents = _half_away(r["value"] * 100)
        a = agg[tgt]
        a[0] += 1
        a[1] += m
        a[2] += m * w * cents
        a[3] += m * w
    want = sorted(
        (
            t,
            n,
            mm,
            num,
            ws,
            _milli(num, 2520 * n),
            _milli(num, ws),
        )
        for t, (n, mm, num, ws) in agg.items()
    )
    assert _rows(q334(spark, SF001)) == want


def test_q335_best_of_n_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import q335

    cand = defaultdict(dict)
    for r in _events(spark):
        cand[r["event_id"] // 8][r["event_id"] % 8] = _half_away(
            r["value"] * 100
        )
    want = []
    prev_mean = None
    for n in (1, 2, 4, 8):
        bests, pos0 = [], 0
        for pid, by_pos in cand.items():
            sub = {p: c for p, c in by_pos.items() if p < n}
            if len(sub) != n:
                continue
            best = max(sub.values())
            win = min(p for p, c in sub.items() if c == best)
            bests.append(best)
            pos0 += win == 0
        np_, sb = len(bests), sum(bests)
        mean = _milli(sb, np_)
        if prev_mean is not None:  # best-of-n uplift is monotone in n
            assert mean >= prev_mean
        prev_mean = mean
        want.append((n, np_, sb, mean, pos0, _milli(pos0, np_)))
    assert _rows(q335(spark, SF001)) == sorted(want)


def test_q336_chunker_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _Q336_S,
        _Q336_W,
        q336,
    )

    chunks = []  # (source, doc_id, hash)
    for r in _docs(spark):
        toks = r["text"].split(" ")
        for i in range(0, (len(toks) - 1) // _Q336_S + 1):
            s = i * _Q336_S
            h = hashlib.md5(
                " ".join(toks[s : s + _Q336_W]).encode()
            ).hexdigest()
            chunks.append((r["source"], r["doc_id"], h))
    gc = Counter(h for _, _, h in chunks)
    per_src = defaultdict(list)
    for src, did, h in chunks:
        per_src[src].append((did, h))
    want = sorted(
        (
            src,
            len({d for d, _ in rows}),
            len(rows),
            len({h for _, h in rows}),
            sum(1 for _, h in rows if gc[h] > 1),
            _milli(sum(1 for _, h in rows if gc[h] > 1), len(rows)),
        )
        for src, rows in per_src.items()
    )
    assert _rows(q336(spark, SF001)) == want


def test_q337_mutual_knn_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _Q337_K,
        q337,
    )

    embs = _embs(spark)
    by_label = defaultdict(list)
    for vid, lab, e in embs:
        by_label[lab].append((vid, e))
    topk = {}
    for lab, vecs in by_label.items():
        for vid, e in vecs:
            scored = sorted(
                ((_cos_nano(e, eo), o) for o, eo in vecs if o != vid),
                key=lambda t: (-t[0], t[1]),
            )[:_Q337_K]
            topk[vid] = {
                o: (rank + 1, s) for rank, (s, o) in enumerate(scored)
            }
    lab_of = {vid: lab for vid, lab, _ in embs}
    want = sorted(
        (lab_of[u], u, v, ruv, topk[v][u][0], s)
        for u, nb in topk.items()
        for v, (ruv, s) in nb.items()
        if u < v and u in topk.get(v, {})
    )
    got = _rows(q337(spark, SF001))
    assert got == want
    # score symmetry contract: cos(u,v) nano == cos(v,u) nano
    eu = {vid: e for vid, _, e in embs}
    for lab, u, v, _, _, s in got:
        assert _cos_nano(eu[v], eu[u]) == s
        break  # one spot check is enough; the twin covers the rest


def test_q337_q343_exactness_precondition(spark):
    """q337/q343's engine-exactness rests on every dot term and
    partial sum over micro-quantized vectors being an integer-valued
    double below 2^53 — pin that bound on real data at every driver
    SF, and cross-check the numpy matmul scorer against the pure-
    python sequential fold for bit-identical nano integers."""
    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _nano_pair_scores,
    )

    for sf_dir in (SF001, "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        vecs = [[float(x) for x in r["embedding"]] for r in rows]
        max_abs = max(abs(x) for v in vecs for x in v) * 1e6 + 1
        dims = len(vecs[0])
        assert max_abs * max_abs * dims < 2**53, max_abs
        # the zero-norm lower bound: every vector must survive micro
        # quantization (else cosine is undefined and the scorer raises)
        min_norm2 = min(
            sum(_half_away(x * 1_000_000) ** 2 for x in v) for v in vecs
        )
        assert min_norm2 > 0, sf_dir

    # bit-identical cross-check (sf0.001 sample, all labels)
    by_label = defaultdict(list)
    for r in spark.read.parquet(f"{SF001}/embeddings.parquet").collect():
        by_label[r["label"]].append([float(x) for x in r["embedding"]])
    for vecs in by_label.values():
        nano = _nano_pair_scores(np.asarray(vecs, dtype=np.float64))
        for i in range(min(4, len(vecs))):
            for j in range(len(vecs)):
                if i != j:
                    assert nano[i][j] == _cos_nano(vecs[i], vecs[j])


def test_q338_misra_gries_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _Q338_M,
        _Q338_P,
        q338,
    )

    per_part = defaultdict(Counter)
    truth = Counter()
    for r in _events(spark):
        k = json.loads(r["props"])["k"]
        per_part[r["event_id"] % _Q338_P][k] += 1
        truth[k] += 1

    def compress(counts: Counter, m: int):
        ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        t = ranked[m][1] if len(ranked) > m else 0
        return Counter(
            {k: c - t for k, c in counts.items() if c - t > 0}
        ), t

    merged, sub_total = Counter(), 0
    for part in per_part.values():
        comp, t = compress(part, _Q338_M)
        merged.update(comp)
        sub_total += t
    final, tf = compress(merged, _Q338_M)
    err = sub_total + tf
    want = sorted(
        (k, c, err, truth[k], c <= truth[k] <= c + err)
        for k, c in final.items()
    )
    got = _rows(q338(spark, SF001))
    assert got == want
    # the MG guarantee must actually hold, not just be reported
    assert all(w for *_, w in got)
    assert len(got) <= _Q338_M


def test_q339_ivf_reassign_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import q339

    vecs = [
        (vid, lab, [_half_away(x * 1_000_000) for x in e])
        for vid, lab, e in _embs(spark)
    ]
    sums = defaultdict(lambda: defaultdict(int))
    cnt = Counter()
    for _, lab, eq in vecs:
        cnt[lab] += 1
        for d, v in enumerate(eq):
            sums[lab][d] += v
    cent = {
        lab: [
            _trunc_div(
                2 * sums[lab][d] + (cnt[lab] if sums[lab][d] >= 0 else -cnt[lab]),
                2 * cnt[lab],
            )
            for d in range(len(vecs[0][2]))
        ]
        for lab in cnt
    }
    churn = Counter()
    for _, lab, eq in vecs:
        best = min(
            (sum((a - b) ** 2 for a, b in zip(eq, cent[c])), c)
            for c in cent
        )[1]
        churn[(lab, best)] += 1
    want = sorted((o, n, c) for (o, n), c in churn.items())
    assert _rows(q339(spark, SF001)) == want


def test_q340_prefix_cache_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _Q340_DEPTHS,
        q340,
    )

    docs = [(r["doc_id"], r["text"].split(" ")) for r in _docs(spark)]
    want = []
    for d in _Q340_DEPTHS:
        groups = Counter(
            hashlib.md5(" ".join(t[:d]).encode()).hexdigest()
            for _, t in docs
            if len(t) >= d
        )
        np_ = sum(groups.values())
        dup = np_ - len(groups)
        want.append(
            (
                d,
                np_,
                len(groups),
                dup,
                dup * d,
                max(groups.values()),
                _milli(dup, np_),
            )
        )
    got = _rows(q340(spark, SF001))
    assert got == sorted(want)
    # deeper prefixes can only split groups: dup count is non-increasing
    dups = {r[0]: r[3] for r in got}
    assert dups[4] >= dups[8] >= dups[16]


def test_q341_dawid_skene_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import q341

    ann = [
        (
            r["event_id"] // 5,
            r["event_id"] % 5,
            json.loads(r["props"])["k"] % 3,
        )
        for r in _events(spark)
    ]
    votes = defaultdict(Counter)
    for it, _, lab in ann:
        votes[it][lab] += 1
    maj = {
        it: min(c.items(), key=lambda t: (-t[1], t[0]))[0]
        for it, c in votes.items()
    }
    per_w = defaultdict(lambda: [0, 0])
    for it, w, lab in ann:
        per_w[w][0] += 1
        per_w[w][1] += lab == maj[it]
    acc = {w: _milli(a, n) for w, (n, a) in per_w.items()}
    wvotes = defaultdict(Counter)
    for it, w, lab in ann:
        wvotes[it][lab] += acc[w]
    wlab = {
        it: min(c.items(), key=lambda t: (-t[1], t[0]))[0]
        for it, c in wvotes.items()
    }
    agree_w = Counter()
    for it, w, lab in ann:
        agree_w[w] += lab == wlab[it]
    want = sorted(
        (w, n, a, acc[w], agree_w[w]) for w, (n, a) in per_w.items()
    )
    assert _rows(q341(spark, SF001)) == want


def test_q342_specdecode_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import q342

    drafts = defaultdict(dict)
    for r in _events(spark):
        h = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:6], 16)
        drafts[r["event_id"] // 10][r["event_id"] % 10] = h % 4 != 0
    runs = [
        min([p for p, a in by_pos.items() if not a], default=10)
        for by_pos in drafts.values()
        if len(by_pos) == 10
    ]
    hist = Counter(runs)
    total = sum(hist.values())
    want, cum = [], 0
    for rl in sorted(hist):
        cum += hist[rl]
        want.append((rl, hist[rl], _milli(hist[rl], total), _milli(cum, total)))
    assert _rows(q342(spark, SF001)) == sorted(want)


def test_q343_semantic_cache_twin(spark):
    from nessus_client_etl_scripts_spark.plans.round11_queries import (
        _Q343_TAU_NANO,
        q343,
    )

    by_label = defaultdict(list)
    for vid, lab, e in _embs(spark):
        by_label[lab].append((vid, e))
    want = []
    for lab, vecs in by_label.items():
        hits, providers = set(), set()
        for vid, e in vecs:
            for o, eo in vecs:
                if o < vid and _cos_nano(e, eo) >= _Q343_TAU_NANO:
                    hits.add(vid)
                    providers.add(o)
        nq = len(vecs)
        want.append(
            (lab, nq, len(hits), _milli(len(hits), nq), len(providers))
        )
    assert _rows(q343(spark, SF001)) == sorted(want)
