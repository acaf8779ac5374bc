"""Unit/property tests for the round-7 wave (q201-q205): BPE trainer
vs a pure-Python replay, longest-duplicate-substring vs a brute DP
oracle, bucketed bitext mining invariants + numpy replay, Zipf slope
replay, and n-gram contamination replay."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyspark.sql.functions as F

SF001 = "/root/testdata/sf0.001"


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


# ---------------------------------------------------------------------------
# q201 — BPE trainer
# ---------------------------------------------------------------------------


def _bpe_replay(texts: list[str], k: int):
    """Reference BPE trainer: greedy non-overlapping merges, tie-break
    (count desc, pair asc), marker '~'."""
    docs = [_norm(t).split(" ") for t in texts]
    table = []
    for r in range(1, k + 1):
        counts: Counter = Counter()
        for toks in docs:
            for x, y in zip(toks, toks[1:]):
                counts[f"{x} {y}"] += 1
        if not counts:
            break
        pair, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        before = sum(len(t) for t in docs)
        new_docs = []
        for toks in docs:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(f"{a}~{b}")
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
        after = sum(len(t) for t in docs)
        table.append((r, pair, c, before - after, after))
    return table


def test_bpe_train_matches_python_replay(spark):
    from nessus_client_etl_scripts_spark.operators.lm import bpe_train

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = [
        (
            r["merge_rank"],
            r["merged_pair"],
            r["pair_count"],
            r["n_merges"],
            r["n_tokens_after"],
        )
        for r in bpe_train(docs, n_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    texts = [r["text"] for r in docs.select("text").collect()]
    assert got == _bpe_replay(texts, 4)


def test_bpe_train_monotone_and_consistent(spark):
    """Merge table invariants: token counts strictly decrease, applied
    merges never exceed the pair's frequency, and later rounds never
    pick a strictly more frequent pair than an earlier round."""
    from nessus_client_etl_scripts_spark.operators.lm import bpe_train

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows = bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
    assert len(rows) == 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_tokens_after"] < prev["n_tokens_after"]
        assert cur["pair_count"] <= prev["pair_count"]
    for r in rows:
        assert 1 <= r["n_merges"] <= r["pair_count"]


# ---------------------------------------------------------------------------
# q202 — longest duplicate substring (brute DP differential)
# ---------------------------------------------------------------------------


def _brute_longest_dup(tok_by_doc: dict[int, list[str]], w: int):
    """Brute oracle: token-level longest common substring per doc pair
    (overlap allowed; same-doc pairs need two distinct start
    positions), restricted to pairs sharing ≥1 w-shingle (the only
    pairs that can reach length ≥ w)."""
    index: dict[tuple, set[int]] = {}
    for d, toks in tok_by_doc.items():
        for i in range(len(toks) - w + 1):
            index.setdefault(tuple(toks[i : i + w]), set()).add(d)
    cands = set()
    for ds in index.values():
        docs = sorted(ds)
        for i, da in enumerate(docs):
            for db in docs[i:]:
                cands.add((da, db))
    # same-doc candidacy needs the shingle TWICE in one doc
    within = {
        d
        for sh, ds in index.items()
        for d in ds
        if sum(
            1
            for i in range(len(tok_by_doc[d]) - w + 1)
            if tuple(tok_by_doc[d][i : i + w]) == sh
        )
        >= 2
    }
    out = {}
    for da, db in sorted(cands):
        if da == db and da not in within:
            continue
        s, t = tok_by_doc[da], tok_by_doc[db]
        best = 0
        # dp over suffix pairs; same-doc requires distinct starts
        prev = [0] * (len(t) + 1)
        for i in range(1, len(s) + 1):
            cur = [0] * (len(t) + 1)
            for j in range(1, len(t) + 1):
                if s[i - 1] == t[j - 1] and not (da == db and i == j):
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        if best >= w:
            out[(da, db)] = best
    return out


def test_aligned_runs_match_brute_dp(spark):
    """max_dup_tokens equals a brute token-DP longest-common-substring
    on a 60-doc slice of sf0.001 (cap disabled so the comparison is
    pure), including same-doc repeats."""
    from nessus_client_etl_scripts_spark.operators.dedup import (
        aligned_duplicate_runs,
    )

    w = 4
    docs = spark.read.parquet(f"{SF001}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["max_dup_tokens"]
        for r in aligned_duplicate_runs(
            docs, w=w, max_freq=10**9
        ).collect()
    }
    toks = {
        r["doc_id"]: r["text"].split(" ")
        for r in docs.select("doc_id", "text").collect()
    }
    want = _brute_longest_dup(toks, w)
    assert got == want
    assert got, "slice must contain at least one duplicated span"


def test_aligned_runs_freq_cap_drops_boilerplate(spark):
    """A shingle shared by more docs than max_freq generates no
    anchors; rarer spans still chain."""
    from nessus_client_etl_scripts_spark.operators.dedup import (
        aligned_duplicate_runs,
    )

    boiler = "all rights reserved do not copy"
    rows = [(i, f"doc {i} body {boiler}") for i in range(10)]
    rows += [(100, "alpha beta gamma delta unique pair"),
             (101, "alpha beta gamma delta unique pair")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["max_dup_tokens"]
        for r in aligned_duplicate_runs(df, w=4, max_freq=5).collect()
    }
    # the 10-doc boilerplate exceeds the cap → absent; the pair stays
    assert (100, 101) in out and out[(100, 101)] == 6
    assert all(a == 100 for a, _ in out)


# ---------------------------------------------------------------------------
# q203 — bucketed bitext mining
# ---------------------------------------------------------------------------


def test_bucketed_bitext_mutual_and_bucket_consistent(spark):
    """Pairs are a matching (each endpoint at most once), endpoints
    share the LSH bucket, and every pair agrees with a numpy replay of
    the bucket-local kNN."""
    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q177_K,
        _Q177_SCALE,
        _Q203_BITS,
        q203,
    )
    from nessus_client_etl_scripts_spark.operators.similarity import (
        _hyperplanes,
    )

    rows = q203(spark, SF001).collect()
    assert rows, "sf0.001 must yield at least one mutual pair"
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    }
    planes = _hyperplanes(_Q203_BITS, 64)

    def bucket(v):
        # sequential left-fold dot, bit-matching Spark's F.aggregate
        # (numpy's pairwise-summed @ can flip a sign at the boundary)
        out = 0
        for j in range(_Q203_BITS):
            d = 0.0
            for k in range(64):
                d += planes[j][k] * float(v[k])
            if d >= 0:
                out |= 1 << j
        return out

    q = {i: np.floor(v * _Q177_SCALE) for i, v in emb.items()}
    by_bucket: dict[int, tuple[list, list]] = {}
    for i, v in emb.items():
        side = by_bucket.setdefault(bucket(v), ([], []))
        side[i % 2].append(i)
    got = {(r["a_id"], r["b_id"]): r for r in rows}
    expect = {}
    for bk, (evens, odds) in sorted(by_bucket.items()):
        if not evens or not odds:
            continue
        evens, odds = sorted(evens), sorted(odds)
        A = np.stack([q[i] for i in evens])
        B = np.stack([q[i] for i in odds])
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        pico = np.round(1e12 * ((A @ B.T) / (na[:, None] * nb[None, :])))
        ro = np.argsort(-pico, axis=1, kind="stable")
        co = np.argsort(-pico.T, axis=1, kind="stable")
        best_b, best_a = ro[:, 0], co[:, 0]
        for i in range(len(evens)):
            j = best_b[i]
            if best_a[j] != i:
                continue
            sa = np.take_along_axis(
                pico, ro[:, : min(_Q177_K, pico.shape[1])], axis=1
            ).sum(axis=1)[i]
            sb = np.take_along_axis(
                pico.T, co[:, : min(_Q177_K, pico.shape[0])], axis=1
            ).sum(axis=1)[j]
            expect[(evens[i], odds[j])] = (
                int(pico[i, j]), int(sa), int(sb)
            )
    assert {
        k: (v["cos_pico"], v["sa_pico"], v["sb_pico"]) for k, v in got.items()
    } == expect


# ---------------------------------------------------------------------------
# q204 — Zipf slope
# ---------------------------------------------------------------------------


def test_zipf_slope_matches_python_replay(spark):
    from nessus_client_etl_scripts_spark.plans.round7_queries import q204

    row = q204(spark, SF001).collect()[0]
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF001}/documents.parquet").collect()
    ]
    counts = Counter(
        tok for t in texts for tok in _norm(t).split(" ")
    )
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [(i + 1).bit_length() - 1 for i in range(len(ranked))]
    ys = [c.bit_length() - 1 for _, c in ranked]
    n = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    assert (row["n_terms"], row["sum_x"], row["sum_y"],
            row["sum_xy"], row["sum_xx"]) == (n, sx, sy, sxy, sxx)
    assert row["slope"] == (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["slope"] < 0  # natural-ish text: frequency falls with rank


# ---------------------------------------------------------------------------
# q205 — n-gram contamination
# ---------------------------------------------------------------------------


def test_ngram_contamination_matches_python_replay(spark):
    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q205_W,
        q205,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    train: set = set()
    test_docs = {}
    for r in docs:
        toks = _norm(r["text"]).split(" ")
        wins = {
            tuple(toks[i : i + _Q205_W])
            for i in range(len(toks) - _Q205_W + 1)
        }
        if not wins:
            continue
        if r["doc_id"] % 10 == 7:
            test_docs[r["doc_id"]] = wins
        else:
            train |= wins
    expect = {}
    for d, wins in test_docs.items():
        leaked = len(wins & train)
        nw = len(wins)
        expect[d] = (nw, leaked, (2_000_000 * leaked + nw) // (2 * nw))
    got = {
        r["doc_id"]: (r["n_windows"], r["n_leaked"], r["leaked_micro"])
        for r in q205(spark, SF001).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in got.values()), "corpus has exact dups"


# ---------------------------------------------------------------------------
# q206 — BPE encode
# ---------------------------------------------------------------------------


def test_bpe_encode_matches_python_replay(spark):
    """Encoding with the trained table reproduces the trainer's final
    state: per-doc encoded counts match the replay, and the corpus
    total equals the trainer's last n_tokens_after."""
    from nessus_client_etl_scripts_spark.operators.lm import (
        bpe_encode,
        bpe_train,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    table = bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    merges = [r["merged_pair"] for r in table]
    got = {
        r["doc_id"]: (r["n_tokens_raw"], r["n_tokens_bpe"], r["n_saved"],
                      r["saved_micro"])
        for r in bpe_encode(docs, merges).collect()
    }
    total_bpe = 0
    for r in docs.select("doc_id", "text").collect():
        toks = _norm(r["text"]).split(" ")
        raw = len(toks)
        for pair in merges:
            a, b = pair.split(" ")
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(f"{a}~{b}")
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        enc = len(toks)
        total_bpe += enc
        assert got[r["doc_id"]] == (
            raw, enc, raw - enc,
            (2_000_000 * (raw - enc) + raw) // (2 * raw),
        )
    assert total_bpe == table[-1]["n_tokens_after"]


# ---------------------------------------------------------------------------
# q207 — median / MAD outlier gate
# ---------------------------------------------------------------------------


def test_group_median_and_mad_match_python_replay(spark):
    from nessus_client_etl_scripts_spark.plans.round7_queries import q207

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])

    def med(vals):
        s = sorted(vals)
        n = len(s)
        lo, hi = (n + 1) // 2, (n + 2) // 2
        return (s[lo - 1] + s[hi - 1]) / 2 if lo != hi else s[lo - 1]

    expect = {}
    for t, vals in by_type.items():
        m = med(vals)
        devs = [abs(v - m) for v in vals]
        d = med(devs)
        expect[t] = (
            len(vals), m, d, sum(1 for x in devs if x > 3 * d)
        )
    got = {
        r["event_type"]: (r["n"], r["median"], r["mad"], r["n_outliers"])
        for r in q207(spark, SF001).collect()
    }
    assert got == expect
    assert any(v[3] > 0 for v in got.values())


# ---------------------------------------------------------------------------
# q209 — winnowing guarantee
# ---------------------------------------------------------------------------


def test_winnowing_density_and_guarantee(spark):
    """Fingerprint counts match a python replay, density is within the
    theoretical band, and the winnowing GUARANTEE holds: two docs
    sharing a (K+WIN-1)-token span share at least one fingerprint."""
    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q209_K,
        _Q209_WIN,
        q209,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    def fingerprints(text):
        toks = _norm(text).split(" ")
        if len(toks) < _Q209_K + _Q209_WIN - 1:
            return None
        hl = [
            hashlib.md5(
                " ".join(toks[i : i + _Q209_K]).encode()
            ).hexdigest()
            for i in range(len(toks) - _Q209_K + 1)
        ]
        fps = {
            min(hl[j : j + _Q209_WIN])
            for j in range(len(hl) - _Q209_WIN + 1)
        }
        return len(hl), fps

    expect = {}
    fpsets = {}
    for r in docs:
        f = fingerprints(r["text"])
        if f is None:
            continue
        nk, fps = f
        expect[r["doc_id"]] = (nk, len(fps))
        fpsets[r["doc_id"]] = fps
    got = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"])
        for r in q209(spark, SF001).collect()
    }
    assert got == expect
    # expected density ~2/(w+1); allow a generous band
    for d, (nk, nf) in got.items():
        assert 1 <= nf <= nk
    # guarantee: two synthetic docs sharing a (K+WIN-1)-token span must
    # share ≥1 fingerprint, whatever surrounds the span
    span = "q r s t u v w x"  # 8 tokens = K + WIN - 1
    da = f"one two three {span} four five six"
    db = f"nine eight {span} seven"
    _, fa = fingerprints(da)
    _, fb = fingerprints(db)
    assert fa & fb


# ---------------------------------------------------------------------------
# q210 — int8 quantization audit
# ---------------------------------------------------------------------------


def test_int8_quant_audit_matches_python_replay(spark):
    import math

    from nessus_client_etl_scripts_spark.plans.round7_queries import q210

    rows = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    dims: dict = {}
    for r in rows:
        for d, x in enumerate(r["embedding"]):
            dims.setdefault(d, []).append(float(x))
    expect = {}
    for d, xs in dims.items():
        vmin, vmax = min(xs), max(xs)
        if vmax == vmin:
            errs = [0.0] * len(xs)
        else:
            s = (vmax - vmin) / 255.0
            errs = []
            for x in xs:
                q = min(max(math.floor((x - vmin) / s + 0.5), 0.0), 255.0)
                errs.append(abs((vmin + q * s) - x))
        expect[d] = (
            len(xs), vmin, vmax, max(errs),
            sum(int(math.floor(e * 1e9)) for e in errs),
        )
    got = {
        r["dim"]: (r["n"], r["vmin"], r["vmax"], r["max_err"],
                   r["sum_err_nano"])
        for r in q210(spark, SF001).collect()
    }
    assert got == expect
    # max per-dim error is bounded by scale/2 + one ulp of slack
    for d, (_, vmin, vmax, me, _) in got.items():
        if vmax > vmin:
            assert me <= (vmax - vmin) / 255.0 / 2 * (1 + 1e-9)


# ---------------------------------------------------------------------------
# q211 — hashed linear quality score
# ---------------------------------------------------------------------------


def test_linear_quality_matches_python_replay(spark):
    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q211_D,
        _Q211_SALT,
        _Q211_W,
        q211,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    expect = {}
    for r in docs:
        toks = _norm(r["text"]).split(" ")
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        ws = [
            _Q211_W[
                int(
                    hashlib.md5(f"{_Q211_SALT}{f}".encode()).hexdigest()[:12],
                    16,
                )
                % _Q211_D
            ]
            for f in feats
        ]
        expect[r["doc_id"]] = (len(ws), sum(ws), sum(ws) > 0)
    got = {
        r["doc_id"]: (r["n_features"], r["score_sum"], r["accept"])
        for r in q211(spark, SF001).collect()
    }
    assert got == expect
    accepts = [v[2] for v in got.values()]
    assert any(accepts) and not all(accepts), "gate must discriminate"


# ---------------------------------------------------------------------------
# q212 — label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_matches_python_replay(spark):
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q212_ITERS,
        _Q212_MIN_SHARED,
        q212,
    )

    # sf0.001's graph is empty at the >=40-shared-users threshold;
    # replay at sf0.01 where q212's oracle found 95 member nodes
    sf01 = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf01}/events.parquet").collect()
    import json as _json

    by_user = defaultdict(set)
    for r in ev:
        item = _json.loads(r["props"]).get("k")
        if item is not None:
            by_user[r["user_id"]].add(int(item))
    pair_users = defaultdict(int)
    for items in by_user.values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair_users[(a, b)] += 1
    edges = [p for p, n in pair_users.items() if n >= _Q212_MIN_SHARED]
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    label = {v: v for v in nbrs}
    for _ in range(_Q212_ITERS):
        new = {}
        for v, ns in nbrs.items():
            cnt = defaultdict(int)
            for u in ns:
                cnt[label[u]] += 1
            new[v] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        label = new
    sizes = defaultdict(int)
    for lb in label.values():
        sizes[lb] += 1
    expect = {v: (lb, sizes[lb]) for v, lb in label.items()}
    got = {
        r["node"]: (r["label"], r["community_size"])
        for r in q212(spark, sf01).collect()
    }
    assert got == expect
    assert got, "graph must be non-empty at sf0.01"
    # community sizes are consistent: per-label node counts match
    sizes_got = defaultdict(int)
    for lb, _ in got.values():
        sizes_got[lb] += 1
    assert all(sz == sizes_got[lb] for lb, sz in got.values())


# ---------------------------------------------------------------------------
# q213 — shot boundaries
# ---------------------------------------------------------------------------


def test_shot_boundaries_match_python_replay(spark):
    """Shots match a pure-python replay of render→decode→threshold,
    and the gate discriminates: odd-n_chars clips (jump 130) split,
    even ones (jump 10) stay single-shot."""
    from nessus_client_etl_scripts_spark.plans.round7_queries import (
        _Q213_DIFF,
        q213,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    expect = {}
    n_multi = n_single = 0
    for r in docs:
        nc = r["n_chars"]
        f, s, jump = 6 + nc % 5, 2 + nc % 3, 10 + (nc % 2) * 120
        sums = [
            sum((nc % 97 + (jump if k >= s else 0) + j) % 256
                for j in range(16))
            for k in range(f)
        ]
        shot, start = 0, 0
        for k in range(1, f):
            if abs(sums[k] - sums[k - 1]) > _Q213_DIFF * 16:
                expect[(r["doc_id"], shot)] = (
                    start, k - start,
                    sum(sums[start:k]) / (16 * (k - start)),
                )
                shot, start = shot + 1, k
        expect[(r["doc_id"], shot)] = (
            start, f - start, sum(sums[start:]) / (16 * (f - start)),
        )
        if shot > 0:
            n_multi += 1
        else:
            n_single += 1
    got = {
        (r["media_id"], r["shot_idx"]): (
            r["start_frame"], r["n_frames"], r["mean_luma"]
        )
        for r in q213(spark, SF001).collect()
    }
    assert got == expect
    assert n_multi > 0 and n_single > 0, "gate must discriminate"
