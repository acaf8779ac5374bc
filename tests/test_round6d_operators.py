"""Unit/property tests for the round-6 tenth wave (q177-q179):
mutual-kNN margin invariants, leave-one-out encoding algebra vs a
pandas replay, and the dHash codec path vs a pure-Python replay."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q177 — margin-based mutual-kNN pair mining
# ---------------------------------------------------------------------------


def test_margin_pairs_are_mutual_and_unique(spark):
    """Each surviving pair is a matching: no endpoint appears twice
    (mutual-best is injective both ways), and every margin is
    positive."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q177

    rows = q177(spark, SF001).collect()
    assert rows, "sf0.001 must yield at least one mutual pair"
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))
    assert all(r["a_id"] % 2 == 0 and r["b_id"] % 2 == 1 for r in rows)
    assert all(r["margin_micro"] > 0 for r in rows)


def test_margin_against_numpy_replay(spark):
    """cos_pico and margin_micro match a dense numpy replay of the
    quantize→kNN→margin pipeline on the sf0.001 corpus."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q177_K,
        _Q177_SCALE,
        q177,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64)
        * _Q177_SCALE
    )
    norms = (V * V).sum(axis=1)
    a_mask, b_mask = ids % 2 == 0, ids % 2 == 1
    A, B = V[a_mask], V[b_mask]
    aid, bid = ids[a_mask], ids[b_mask]
    na, nb = norms[a_mask], norms[b_mask]
    cos = (A @ B.T) / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])
    pico = np.round(1e12 * cos)

    def topk_sum(mat, other_ids, k):
        out = np.empty(mat.shape[0])
        best = np.empty(mat.shape[0], dtype=np.int64)
        for i in range(mat.shape[0]):
            order = np.lexsort((other_ids, -mat[i]))
            out[i] = mat[i][order[:k]].sum()
            best[i] = order[0]
        return out, best

    sa, best_a = topk_sum(pico, bid, _Q177_K)
    sb, best_b = topk_sum(pico.T, aid, _Q177_K)
    expect = {}
    for i in range(len(aid)):
        j = best_a[i]
        if best_b[j] == i:
            margin = round(
                1e6 * ((2 * _Q177_K * pico[i, j]) / (sa[i] + sb[j]))
            )
            expect[(int(aid[i]), int(bid[j]))] = (
                int(pico[i, j]),
                int(margin),
            )
    got = {
        (r["a_id"], r["b_id"]): (r["cos_pico"], r["margin_micro"])
        for r in q177(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q178 — leave-one-out target encoding
# ---------------------------------------------------------------------------


def test_loo_encoding_excludes_own_row(spark):
    """Group-constant encodings would leak; LOO must differ across
    rows of the same group whenever targets differ, and the exact
    identity (S_g - y) = loo * (n_g - 1) holds at micro precision."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q178

    rows = q178(spark, SF001).collect()
    by_g: dict[str, list] = {}
    for r in rows:
        by_g.setdefault(r["priority"], []).append(r)
    for grp in by_g.values():
        s_g = sum(r["cents"] for r in grp)
        n_g = len(grp)
        for r in grp:
            assert r["n_g"] == n_g
            expect = round(1e6 * ((s_g - r["cents"]) / (n_g - 1)))
            assert r["loo_micro"] == expect
        # distinct targets ⇒ distinct LOO encodings (injective in y)
        if len({r["cents"] for r in grp}) > 1:
            assert len({r["loo_micro"] for r in grp}) > 1


def test_smoothing_shrinks_toward_global_mean(spark):
    """The smoothed encoding always lies between the LOO estimate and
    the global mean (convex combination property)."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q178

    rows = q178(spark, SF001).collect()
    total = sum(r["cents"] for r in rows)
    g_micro = 1e6 * total / len(rows)
    for r in rows:
        lo = min(r["loo_micro"], g_micro)
        hi = max(r["loo_micro"], g_micro)
        assert lo - 2 <= r["smooth_micro"] <= hi + 2  # rounding slack


# ---------------------------------------------------------------------------
# q179 — dHash image dedup over the real PPM codec
# ---------------------------------------------------------------------------


def _dhash_py(arr: np.ndarray, bands: int = 8) -> int:
    h, w, _ = arr.shape
    gray = arr.astype(np.int64).sum(axis=2)
    g = np.zeros((bands, w), dtype=np.int64)
    for b in range(bands):
        lo, hi = b * h // bands, (b + 1) * h // bands
        if hi > lo:
            g[b] = gray[lo:hi].sum(axis=0)
    out = 0
    for r in range(bands - 1):
        for c in range(w):
            if g[r, c] < g[r + 1, c]:
                out += 1 << (r * w + c)
    return out


def test_image_dhash_matches_python_replay(spark):
    """The mapInPandas decode→dHash equals a pure-Python encode→
    decode→hash replay for a handful of synthetic images, including
    heights where some bands are empty (h=6 < 8 bands)."""
    import pandas as pd

    from nessus_client_etl_scripts_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        image_dhash,
    )

    rng = np.random.default_rng(7)
    arrs = {
        mid: rng.integers(0, 256, size=(h, 8, 3), dtype=np.uint8)
        for mid, h in [(1, 6), (2, 8), (3, 11), (4, 32), (5, 6)]
    }
    pdf = pd.DataFrame(
        [
            {
                "media_id": mid,
                "kind": "image",
                "meta": None,
                "content": encode_ppm(a),
            }
            for mid, a in arrs.items()
        ],
        columns=[f.name for f in MEDIA_SCHEMA],
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["dhash"], r["n_bytes"])
        for r in image_dhash(df, codec="ppm").collect()
    }
    for mid, a in arrs.items():
        assert got[mid] == (_dhash_py(a), len(encode_ppm(a)))


def test_dhash_dedup_groups_partition_corpus(spark):
    """Every image lands in exactly one group; each group keeps
    exactly one canonical member; identical gradients share a hash."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q179

    rows = q179(spark, SF001).collect()
    docs = spark.read.parquet(f"{SF001}/documents.parquet").count()
    assert len(rows) == docs
    by_hash: dict[int, list] = {}
    for r in rows:
        by_hash.setdefault(r["dhash"], []).append(r)
    for grp in by_hash.values():
        assert len(grp) == grp[0]["group_size"]
        assert sum(r["keep"] for r in grp) == 1
        assert min(r["media_id"] for r in grp) == next(
            r["media_id"] for r in grp if r["keep"]
        )


# ---------------------------------------------------------------------------
# q180 — Fellegi–Sunter weights
# ---------------------------------------------------------------------------


def test_fs_weights_order_patterns_sensibly(spark):
    """All-agree patterns must outweigh all-disagree patterns, and the
    smoothed ratios keep every weight finite and positive."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q180

    rows = q180(spark, SF001).collect()
    assert rows
    by_pat = {
        (r["ag_lang"], r["ag_len"], r["ag_tok"]): r["weight_micro"]
        for r in rows
    }
    assert all(w > 0 for w in by_pat.values())
    if (True, True, True) in by_pat and (False, False, False) in by_pat:
        assert by_pat[(True, True, True)] > by_pat[(False, False, False)]


def test_fs_pattern_counts_partition_candidates(spark):
    """Pattern counts sum to the SN candidate-pair total."""
    import pyspark.sql.functions as F

    from nessus_client_etl_scripts_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q180

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    n_cand = sorted_neighborhood_pairs(
        docs, block_cols=("source",), k=3, window=5
    ).count()
    rows = q180(spark, SF001).collect()
    assert sum(r["n_match"] + r["n_unmatch"] for r in rows) == n_cand


# ---------------------------------------------------------------------------
# q181 — survivorship
# ---------------------------------------------------------------------------


def test_survivorship_rules_hold(spark):
    """Donor is the longest member (ties → smallest id), mode is the
    plurality language, counts are consistent — checked against a
    pandas replay of the clustering."""
    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
    )
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q181

    docs = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.array_join(
                F.slice(F.split(normalize_text("text"), " "), 1, 3), " "
            ).alias("ckey"),
        )
        .collect()
    )
    by_key: dict[str, list] = {}
    for r in docs:
        by_key.setdefault(r["ckey"], []).append(r)
    rows = q181(spark, SF001).collect()
    got = {r["ckey"]: r for r in rows}
    expect_keys = {k for k, v in by_key.items() if len(v) >= 2}
    assert set(got) == expect_keys
    for k in expect_keys:
        grp, out = by_key[k], got[k]
        assert out["n_members"] == len(grp)
        assert out["cluster_id"] == min(r["doc_id"] for r in grp)
        donor = sorted(grp, key=lambda r: (-r["n_chars"], r["doc_id"]))[0]
        assert out["text_donor"] == donor["doc_id"]
        counts: dict[str, int] = {}
        for r in grp:
            counts[r["lang"]] = counts.get(r["lang"], 0) + 1
        mode = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert out["lang_mode"] == mode


# ---------------------------------------------------------------------------
# q182 — CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_matches_recurrence_replay(spark):
    """The window-identity CUSUM equals the direct max(0, ·)
    recurrence replayed in Python per event type."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q182

    rows = q182(spark, SF001).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for seq in by_type.values():
        seq.sort(key=lambda r: r["hour"])
        cp = cn = 0
        peak = 0
        for r in seq:
            cp = max(0, cp + r["dev"])
            cn = max(0, cn - r["dev"])
            assert r["cusum_pos"] == cp
            assert r["cusum_neg"] == cn
            peak = max(peak, cp)
            assert r["is_peak"] == (cp > 0 and cp == peak)


def test_cusum_devs_sum_to_zero(spark):
    """Scaled deviations are exact: they sum to 0 per type (n·Σc = n·S)."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q182

    rows = q182(spark, SF001).collect()
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0) + r["dev"]
    assert all(v == 0 for v in by_type.values())


# ---------------------------------------------------------------------------
# q183 — activity bitmaps
# ---------------------------------------------------------------------------


def test_bitmap_equals_hour_sets(spark):
    """Bitmap popcounts and pair overlaps equal a Python set replay
    over the raw events."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q183

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    hours: dict[tuple, set] = {}
    for r in ev:
        hours.setdefault((r["user_id"], r["event_type"]), set()).add(
            r["ts"].hour
        )
    types = sorted({t for _, t in hours})
    expect = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = {
                u
                for (u, t) in hours
                if t == ta and (u, tb) in hours
            }
            if not both:
                continue
            inter = sum(
                1 for u in both if hours[(u, ta)] & hours[(u, tb)]
            )
            si = sum(
                len(hours[(u, ta)] & hours[(u, tb)]) for u in both
            )
            su = sum(
                len(hours[(u, ta)] | hours[(u, tb)]) for u in both
            )
            jsum = sum(
                round(
                    1e6
                    * len(hours[(u, ta)] & hours[(u, tb)])
                    / len(hours[(u, ta)] | hours[(u, tb)])
                )
                for u in both
            )
            expect[(ta, tb)] = (
                len(both),
                inter,
                si,
                su,
                round(jsum / len(both)),
            )
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_both"],
            r["n_cohour"],
            r["sum_inter_bits"],
            r["sum_union_bits"],
            r["mean_jacc_micro"],
        )
        for r in q183(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q184 — calibration curve
# ---------------------------------------------------------------------------


def test_calibration_bins_partition_docs(spark):
    """Bin counts sum to |documents|; rates and gaps are consistent;
    the weighted gap is n·gap exactly."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q184

    rows = q184(spark, SF001).collect()
    n_docs = spark.read.parquet(f"{SF001}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]
        assert r["gap_micro"] == abs(
            r["mean_score_micro"] - r["pos_rate_micro"]
        )
        assert r["weighted_gap"] == r["n"] * r["gap_micro"]


# ---------------------------------------------------------------------------
# q185 — exact KS drift
# ---------------------------------------------------------------------------


def test_ks_matches_scipy_free_replay(spark):
    """The exact integer KS equals a Python ECDF replay (and the
    normalized statistic is in [0, 1])."""
    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q185_A,
        _Q185_B,
        q185,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    s1 = sorted(
        round(r["value"] * 1e6) for r in ev if r["event_type"] == _Q185_A
    )
    s2 = sorted(
        round(r["value"] * 1e6) for r in ev if r["event_type"] == _Q185_B
    )
    n1, n2 = len(s1), len(s2)
    support = sorted(set(s1) | set(s2))
    import bisect

    best, at = -1, None
    for v in support:
        c1 = bisect.bisect_right(s1, v)
        c2 = bisect.bisect_right(s2, v)
        diff = abs(n2 * c1 - n1 * c2)
        if diff > best:
            best, at = diff, v
    [row] = q185(spark, SF001).collect()
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_scaled"] == best
    assert row["at_val_micro"] == at
    assert 0 <= row["ks_micro"] <= 1_000_000
    assert row["ks_micro"] == round(1e6 * (best / (n1 * n2)))


# ---------------------------------------------------------------------------
# q186 — join-key skew histogram
# ---------------------------------------------------------------------------


def test_skew_histogram_matches_python_replay(spark):
    """Every bucket row equals a collections.Counter replay with
    floor(log2) bucketing, and the buckets partition all keys/rows."""
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q186

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    cnt = Counter(r["user_id"] for r in ev)
    n_total = sum(cnt.values())
    buckets: dict[int, list[int]] = {}
    for c in cnt.values():
        buckets.setdefault(min(c.bit_length() - 1, 20), []).append(c)
    expect = {
        b: (
            len(v),
            sum(v),
            max(v),
            round(1e6 * sum(v) / n_total),
        )
        for b, v in buckets.items()
    }
    rows = q186(spark, SF001).collect()
    got = {
        r["bucket_exp"]: (
            r["n_keys"],
            r["n_rows"],
            r["max_cnt"],
            r["pct_rows_micro"],
        )
        for r in rows
    }
    assert got == expect
    assert sum(r["n_keys"] for r in rows) == len(cnt)
    assert sum(r["n_rows"] for r in rows) == n_total


# ---------------------------------------------------------------------------
# q187 — sequence-anomaly scoring
# ---------------------------------------------------------------------------


def test_sequence_anomaly_matches_python_replay(spark):
    """Per-user argmin transition equals a pure-Python replay of the
    transition matrix and tie-broken minimum."""
    from collections import Counter, defaultdict

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q187

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    by_user: dict[int, list] = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans: dict[int, list[tuple[str, str]]] = {}
    cab: Counter = Counter()
    for u, evs in by_user.items():
        evs.sort()
        pairs = [
            (evs[i - 1][2], evs[i][2]) for i in range(1, len(evs))
        ]
        if pairs:
            trans[u] = pairs
            cab.update(pairs)
    ca: Counter = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    prob = {
        (a, b): round(1e6 * c / ca[a]) for (a, b), c in cab.items()
    }
    expect = {}
    for u, pairs in trans.items():
        best = min(pairs, key=lambda p: (prob[p], p[0], p[1]))
        expect[u] = (len(pairs), prob[best], best[0], best[1])
    got = {
        r["user_id"]: (
            r["n_trans"],
            r["min_prob_micro"],
            r["worst_from"],
            r["worst_to"],
        )
        for r in q187(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q188 — memorization runs
# ---------------------------------------------------------------------------


def test_memorization_runs_match_python_replay(spark):
    """Longest-verbatim-run per test doc equals a pure-Python replay
    of the shingle membership + gaps-and-islands scan (split labels
    taken from the engine's own hash_split, which has its own
    tests)."""
    import re

    from nessus_client_etl_scripts_spark.operators.sampling import hash_split
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q188

    docs = hash_split(
        spark.read.parquet(f"{SF001}/documents.parquet"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("doc_id", "split", "text").collect()

    def shingles(text: str) -> list[str]:
        tk = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
        n = max(len(tk) - 2, 1)
        return [" ".join(tk[i : i + 3]) for i in range(n)]

    train_sh: set[str] = set()
    test_docs = {}
    for r in docs:
        sh = shingles(r["text"])
        if r["split"] == "test":
            test_docs[r["doc_id"]] = sh
        else:
            train_sh.update(sh)
    expect = {}
    for d, sh in test_docs.items():
        hits = [s in train_sh for s in sh]
        n_hits = sum(hits)
        max_run = run = 0
        for h in hits:
            run = run + 1 if h else 0
            max_run = max(max_run, run)
        expect[d] = (len(sh), n_hits, max_run, max_run + 2 >= 8)
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_hits"],
            r["max_run"],
            r["flagged"],
        )
        for r in q188(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q189 — exact AUC
# ---------------------------------------------------------------------------


def test_auc_matches_pairwise_replay(spark):
    """Per-source AUC equals the O(n²) pairwise definition
    (wins + ties/2 over pos×neg pairs) at micro precision."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q189

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    by_src = defaultdict(list)
    for r in docs:
        t = r["text"].split(" ")
        vm = round(1e6 * (sum(1 for w in t if w in ("the", "a")) / len(t)))
        by_src[r["source"]].append((vm, 1 if r["lang"] == "en" else 0))
    expect = {}
    for src, rows in by_src.items():
        pos = [v for v, p in rows if p]
        neg = [v for v, p in rows if not p]
        if not pos or not neg:
            continue
        u2 = sum(
            2 if p > n_ else (1 if p == n_ else 0)
            for p in pos
            for n_ in neg
        )
        expect[src] = (
            len(pos),
            len(neg),
            u2,
            round(1e6 * u2 / (2.0 * len(pos) * len(neg))),
        )
    got = {
        r["source"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc_micro"])
        for r in q189(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q190 — conformal gate
# ---------------------------------------------------------------------------


def test_conformal_gate_matches_python_replay(spark):
    """Thresholds are the conformal order statistics of the
    calibration scores and coverage matches a direct count."""
    import math

    from nessus_client_etl_scripts_spark.operators.sampling import hash_split
    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q190_ALPHAS,
        q190,
    )

    docs = hash_split(
        spark.read.parquet(f"{SF001}/documents.parquet"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("text", "split").collect()

    def vm(text):
        t = text.split(" ")
        return round(1e6 * (sum(1 for w in t if w in ("the", "a")) / len(t)))

    cal = sorted(vm(r["text"]) for r in docs if r["split"] != "test")
    test = [vm(r["text"]) for r in docs if r["split"] == "test"]
    expect = {}
    for a in _Q190_ALPHAS:
        k = math.ceil(a * (len(cal) + 1) / 100)
        t = cal[k - 1]
        n_cov = sum(1 for v in test if v <= t)
        expect[a] = (
            len(cal),
            k,
            t,
            len(test),
            n_cov,
            round(1e6 * n_cov / len(test)),
        )
    got = {
        r["alpha_pct"]: (
            r["n_cal"],
            r["k"],
            r["t_micro"],
            r["n_test"],
            r["n_covered"],
            r["coverage_micro"],
        )
        for r in q190(spark, SF001).collect()
    }
    assert got == expect
    for a in _Q190_ALPHAS:  # conformal guarantee sanity: nominal-ish
        assert expect[a][5] >= (a - 8) * 10000


# ---------------------------------------------------------------------------
# q191 — DBSCAN over embeddings
# ---------------------------------------------------------------------------


def test_dbscan_matches_python_replay(spark):
    """Roles, neighbor counts and min-id clusters equal a numpy+
    union-find replay of the cell-bounded DBSCAN."""
    import numpy as np

    from nessus_client_etl_scripts_spark.operators.similarity import (
        _hyperplanes,
    )
    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q191_EPS_PICO,
        _Q191_MINPTS,
        q191,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    C = np.asarray(_hyperplanes(16, 64, seed=0xC0DE))
    d = (
        np.einsum("nd,nd->n", V, V)[:, None]
        - 2.0 * (V @ C.T)
        + np.einsum("kd,kd->k", C, C)[None, :]
    )
    cell = np.argsort(d, axis=1, kind="stable")[:, 0]
    Q = np.floor(V * 4096.0)
    nq = np.sqrt((Q * Q).sum(1))
    n = len(ids)
    adj = {i: set() for i in range(n)}
    for c in set(cell.tolist()):
        idx = np.where(cell == c)[0]
        M = Q[idx]
        nn = nq[idx]
        pico = np.round(1e12 * ((M @ M.T) / (nn[:, None] * nn[None, :])))
        for x in range(len(idx)):
            for y in range(len(idx)):
                if x != y and pico[x, y] >= _Q191_EPS_PICO:
                    adj[idx[x]].add(idx[y])
    core = {i for i in range(n) if len(adj[i]) >= _Q191_MINPTS}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in adj[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp = {}
    for i in core:
        root = find(i)
        comp.setdefault(root, []).append(i)
    clu = {}
    for members in comp.values():
        m = min(int(ids[i]) for i in members)
        for i in members:
            clu[i] = m
    expect = {}
    for i in range(n):
        if i in core:
            role, cl = "core", clu[i]
        else:
            adj_core = [clu[j] for j in adj[i] if j in core]
            if adj_core:
                role, cl = "border", min(adj_core)
            else:
                role, cl = "noise", None
        expect[int(ids[i])] = (int(cell[i]), len(adj[i]), role, cl)
    got = {
        r["vec_id"]: (r["cell"], r["n_neighbors"], r["role"], r["cluster_id"])
        for r in q191(spark, SF001).collect()
    }
    assert got == expect
    roles = {v[2] for v in got.values()}
    assert roles == {"core", "border", "noise"}


# ---------------------------------------------------------------------------
# q192 — local clustering coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_matches_python_replay(spark):
    """Degrees, per-node triangles and lcc equal a pure-Python
    adjacency replay of the >= 40-shared-users item graph. Runs at
    sf0.01 — the sf0.001 slice has no >= 40-shared-user item pair at
    all (the q135 graph is empty there too)."""
    import json
    from collections import defaultdict
    from itertools import combinations

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q192

    sf01 = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf01}/events.parquet").collect()
    users = defaultdict(set)
    for r in ev:
        item = json.loads(r["props"])["k"]
        users[int(item)].add(r["user_id"])
    items = sorted(users)
    adj = defaultdict(set)
    for a, b in combinations(items, 2):
        if len(users[a] & users[b]) >= 40:
            adj[a].add(b)
            adj[b].add(a)
    expect = {}
    for v, nbrs in adj.items():
        tri = sum(
            1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x]
        )
        deg = len(nbrs)
        lcc = (
            round(2e6 * tri / (deg * (deg - 1))) if deg >= 2 else 0
        )
        expect[v] = (deg, tri, lcc)
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["lcc_micro"])
        for r in q192(spark, sf01).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in got.values()), "graph must have triangles"


# ---------------------------------------------------------------------------
# q193 — JL distortion audit
# ---------------------------------------------------------------------------


def test_jl_distortion_matches_numpy_replay(spark):
    """Distances and ratios equal an exact numpy replay; all
    distances are exact integers under the scaling discipline."""
    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q193_HSCALE,
        _q193_planes,
        q193,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    order = np.argsort(ids)
    ids = ids[order]
    Q = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64)[order]
        * 4096.0
    ).astype(np.int64)
    H = np.array(_q193_planes(), dtype=np.int64)
    P = Q @ H.T
    expect = {}
    by_id = {int(i): k for k, i in enumerate(ids)}
    for a in by_id:
        if a % 2 or a + 1 not in by_id:
            continue
        x, y = by_id[a], by_id[a + 1]
        d_orig = int(((Q[x] - Q[y]) ** 2).sum())
        d_proj = int(((P[x] - P[y]) ** 2).sum())
        if d_orig > 0:
            expect[(a, a + 1)] = (
                d_orig,
                d_proj,
                round(4e6 * d_proj / (d_orig * _Q193_HSCALE * _Q193_HSCALE)),
            )
    got = {
        (r["a_id"], r["b_id"]): (r["d_orig"], r["d_proj"], r["ratio_micro"])
        for r in q193(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q194 — audio silence segmentation
# ---------------------------------------------------------------------------


def test_audio_silence_matches_python_replay(spark):
    """Frame energies, silent runs and totals equal a numpy replay of
    the sawtooth → frame → threshold pipeline (the codec roundtrip is
    exercised on the Spark side, the replay skips it)."""
    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q194_FRAME,
        _Q194_SILENT,
        q194,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()
    expect = {}
    for r in docs:
        nc = r["n_chars"]
        n = 160 + nc % 5 * 80
        s = ((nc * 31 + np.arange(n) * 7) % 65536 - 32768).astype(np.int64)
        e = (s * s).reshape(-1, _Q194_FRAME).sum(axis=1)
        sil = e < _Q194_SILENT
        max_run = run = 0
        for f in sil:
            run = run + 1 if f else 0
            max_run = max(max_run, run)
        expect[r["doc_id"]] = (
            len(e),
            int(sil.sum()),
            max_run,
            int(e.sum()),
        )
    got = {
        r["media_id"]: (
            r["n_frames"],
            r["n_silent"],
            r["max_silent_run"],
            r["total_energy"],
        )
        for r in q194(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# q195 — l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_matches_python_replay(spark):
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q195_L,
        q195,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    groups = defaultdict(list)
    for r in ev:
        vband = round(r["value"] * 1e6) // 100000
        groups[(r["event_type"], vband)].append(r["user_id"])
    expect = {
        k: (len(v), len(set(v)), len(set(v)) >= _Q195_L)
        for k, v in groups.items()
    }
    got = {
        (r["event_type"], r["vband"]): (
            r["n_rows"],
            r["n_sensitive"],
            r["l_diverse"],
        )
        for r in q195(spark, SF001).collect()
    }
    assert got == expect
    # sf0.001 groups are all tiny (15 users total) — both verdicts
    # only appear at sf0.01, where the audit is non-vacuous
    flags01 = {
        r["l_diverse"]
        for r in q195(spark, "/root/testdata/sf0.01").collect()
    }
    assert flags01 == {True, False}


# ---------------------------------------------------------------------------
# q196/q197 — hubness audit + known-item retrieval
# ---------------------------------------------------------------------------


def _q_pico(ids, V):
    import numpy as np

    Q = np.floor(V * 4096.0)
    n = np.sqrt((Q * Q).sum(1))
    am, bm = ids % 2 == 0, ids % 2 == 1
    pico = np.round(
        1e12 * ((Q[am] @ Q[bm].T) / (n[am][:, None] * n[bm][None, :]))
    )
    return ids[am], ids[bm], pico


def test_hubness_matches_numpy_replay(spark):
    """k-occurrence per index vector equals a dense replay; the
    occurrence total is exactly |queries|·k."""
    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q196_K,
        q196,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    aid, bid, pico = _q_pico(ids, V)
    order = np.argsort(-pico, axis=1, kind="stable")[:, :_Q196_K]
    from collections import Counter

    occ = Counter(int(bid[j]) for row in order for j in row)
    expect = {
        int(b): (
            occ.get(int(b), 0),
            occ.get(int(b), 0) >= 2 * _Q196_K,
            int(b) not in occ,
        )
        for b in bid
    }
    got = {
        r["b_id"]: (r["k_occurrence"], r["is_hub"], r["is_antihub"])
        for r in q196(spark, SF001).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == len(aid) * _Q196_K


def test_known_item_rank_matches_numpy_replay(spark):
    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q197

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    aid, bid, pico = _q_pico(ids, V)
    bpos = {int(b): j for j, b in enumerate(bid)}
    expect = {}
    for i, a in enumerate(aid):
        p = int(a) + 1
        if p not in bpos:
            continue
        jp = bpos[p]
        pp = pico[i, jp]
        rank = int(
            1
            + (pico[i] > pp).sum()
            + ((pico[i] == pp) & (bid < p)).sum()
        )
        expect[int(a)] = (
            p,
            rank,
            (2_000_000 + rank) // (2 * rank),
            rank == 1,
            rank <= 5,
        )
    got = {
        r["a_id"]: (
            r["partner_id"],
            r["partner_rank"],
            r["rr_micro"],
            r["hit_at_1"],
            r["hit_at_5"],
        )
        for r in q197(spark, SF001).collect()
    }
    assert got == expect


def test_semantic_dedup_threshold_margin(spark):
    """The q114 matmul rewrite is sound only while no in-cell pair
    sits within summation-reorder distance of the threshold: assert
    the minimum |cos − τ| margin is ≥ 1e-9 (reordering moves a 64-dim
    dot by ~1e-14 relative) on both driver-checked scales."""
    import numpy as np

    from nessus_client_etl_scripts_spark.operators.similarity import (
        _hyperplanes,
    )
    from nessus_client_etl_scripts_spark.plans.corpus_queries import _Q114_TAU

    C = np.asarray(_hyperplanes(16, 64, seed=0xC0DE))
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
        V = np.array([r["embedding"] for r in emb], dtype=np.float64)
        d = (
            (V * V).sum(1)[:, None]
            - 2.0 * (V @ C.T)
            + (C * C).sum(1)[None, :]
        )
        cell = np.argsort(d, axis=1, kind="stable")[:, 0]
        n = np.sqrt((V * V).sum(1))
        margin = 1.0
        for c in set(cell.tolist()):
            idx = np.where(cell == c)[0]
            M, nn = V[idx], n[idx]
            cos = (M @ M.T) / (nn[:, None] * nn[None, :])
            iu = np.triu_indices(len(idx), 1)
            if len(iu[0]):
                margin = min(margin, np.abs(cos[iu] - _Q114_TAU).min())
        assert margin > 1e-9, f"{sf}: margin {margin} too tight"


# ---------------------------------------------------------------------------
# q198/q199 — Benford audit + bootstrap AUC
# ---------------------------------------------------------------------------


def test_benford_matches_python_replay(spark):
    import math
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round6d_queries import q198

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    digits = Counter(
        int(str(round(r["o_totalprice"] * 100))[0]) for r in orders
    )
    n_total = sum(digits.values())
    expect = {}
    for d, n in digits.items():
        share = round(1e6 * n / n_total)
        ben = round(1e6 * math.log10(1 + 1 / d))
        expect[d] = (n, share, ben, abs(share - ben))
    got = {
        r["digit"]: (r["n"], r["share_micro"], r["benford_micro"], r["dev_micro"])
        for r in q198(spark, SF001).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == n_total


def test_auc_bootstrap_matches_python_replay(spark):
    """Every replicate's weighted exact AUC equals a pure-Python
    replay of the salted Poisson draw + weighted rank-sum identity."""
    import hashlib
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round6c_queries import _Q159_T
    from nessus_client_etl_scripts_spark.plans.round6d_queries import (
        _Q199_B,
        q199,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()

    def weight(b, doc_id):
        u = int(
            hashlib.md5(f"aucboot-v1:{b}:{doc_id}".encode()).hexdigest()[:12],
            16,
        )
        for w, t in enumerate(_Q159_T):
            if u < t:
                return w
        return 5

    expect = {}
    aucs = []
    for b in range(_Q199_B):
        by_vm = defaultdict(lambda: [0, 0])
        for r in docs:
            t = r["text"].split(" ")
            vm = round(1e6 * (sum(1 for w in t if w in ("the", "a")) / len(t)))
            w = weight(b, r["doc_id"])
            if r["lang"] == "en":
                by_vm[vm][0] += w
            else:
                by_vm[vm][1] += w
        np_, nn_, u2, below = 0, 0, 0, 0
        for vm in sorted(by_vm):
            wp, wn = by_vm[vm]
            u2 += wp * (2 * below + wn)
            below += wn
            np_ += wp
            nn_ += wn
        auc = round(1e6 * u2 / (2.0 * np_ * nn_))
        expect[b] = (np_, nn_, u2, auc)
        aucs.append((auc, b))
    rks = {
        b: i + 1 for i, (_, b) in enumerate(sorted(aucs))
    }
    got = {
        r["b"]: (r["n_pos_w"], r["n_neg_w"], r["u2"], r["auc_micro"], r["rk"])
        for r in q199(spark, SF001).collect()
    }
    assert got == {b: (*v, rks[b]) for b, v in expect.items()}


def test_corpus_datasheet_matches_python_replay(spark):
    import hashlib
    import re
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.operators.sampling import hash_split
    from nessus_client_etl_scripts_spark.plans.round6d_queries import q200

    docs = hash_split(
        spark.read.parquet(f"{SF001}/documents.parquet"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r)
    expect = {}
    for src, rows in by_src.items():
        fps = {
            hashlib.md5(
                re.sub(r"\s+", " ", r["text"].lower().strip()).encode()
            ).hexdigest()
            for r in rows
        }
        n = len(rows)
        chars = [r["n_chars"] for r in rows]
        expect[src] = (
            n,
            sum(len(r["text"].split(" ")) for r in rows),
            sum(chars),
            len({r["lang"] for r in rows}),
            len(fps),
            n - len(fps),
            round(1e6 * len(fps) / n),
            sum(1 for r in rows if r["split"] == "train"),
            sum(1 for r in rows if r["split"] == "val"),
            sum(1 for r in rows if r["split"] == "test"),
            min(chars),
            max(chars),
            round(sum(chars) / n),
        )
    got = {
        r["source"]: (
            r["n_docs"], r["n_tokens"], r["n_chars"], r["n_langs"],
            r["n_unique"], r["n_exact_dups"], r["unique_ratio_micro"],
            r["n_train"], r["n_val"], r["n_test"],
            r["min_chars"], r["max_chars"], r["mean_chars"],
        )
        for r in q200(spark, SF001).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# collect_bounded_side — the driver-collect guard on the q177/q196/q197
# directional matmul kernels
# ---------------------------------------------------------------------------


def test_collect_bounded_side_guard(spark):
    """Within the bound: returns every row (the limit sentinel never
    truncates a compliant side). Over the bound: raises with the
    bucketing fix named, instead of silently collecting a corpus."""
    import pytest

    from nessus_client_etl_scripts_spark.operators.similarity import (
        collect_bounded_side,
    )

    df = spark.range(10).withColumnRenamed("id", "vec_id")
    rows = collect_bounded_side(df, max_rows=10)
    assert sorted(r["vec_id"] for r in rows) == list(range(10))

    with pytest.raises(ValueError, match="LSH bands"):
        collect_bounded_side(df, max_rows=9)


def test_image_dhash_rejects_overflow_width(spark):
    """A PPM wider than the int64 bit budget must raise, not hash
    wrong: (bands-1)*width > 63 positions would shift past the sign
    bit (ADVICE r6)."""
    import pytest

    from nessus_client_etl_scripts_spark.operators.multimodal import (
        encode_ppm,
        image_dhash,
    )

    px = np.zeros((8, 16, 3), dtype=np.uint8)  # 7 bands × 16 px = 112 bits
    wide = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px)))], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="bands"):
        image_dhash(wide).collect()
