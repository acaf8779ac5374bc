"""Unit/property tests for the round-8 wave: URL canonicalization /
registered-domain / per-domain budget (q214), byte-fallback BPE
accounting (q215) including the bpe_apply-vs-train-ledger property the
r7 verdict asked for, and the bigram-surprisal gate (q216)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

SF001 = "/root/testdata/sf0.001"


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


# ---------------------------------------------------------------------------
# q214 — URL canonicalization + domain budget
# ---------------------------------------------------------------------------


def test_q214_canonicalization_and_budget(spark):
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q214_CAP,
        q214,
    )

    rows = q214(spark, SF001).collect()
    assert rows
    for r in rows:
        # canonical: no scheme, no fragment, no www, no tracking params
        assert "://" not in r["canon_url"]
        assert "#" not in r["canon_url"]
        assert not r["canon_url"].startswith("www.")
        assert "utm" not in r["canon_url"]
        assert r["canon_url"] == r["canon_url"].lower()
        # registered domain: two labels, or three under the co.uk suffix
        n_labels = r["domain"].count(".") + 1
        assert n_labels == (3 if r["domain"].endswith(".co.uk") else 2)
        assert r["canon_url"].split("/")[0].endswith(r["domain"])
        # query params sorted
        if "?" in r["canon_url"]:
            params = r["canon_url"].split("?", 1)[1].split("&")
            assert params == sorted(params)
        assert r["kept"] == (r["drank"] <= _Q214_CAP)
    # the budget binds: every domain keeps min(cap, its docs)
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        kept = [r for r in rs if r["kept"]]
        assert len(kept) == min(_Q214_CAP, len(rs))
        assert {r["n_domain_docs"] for r in rs} == {len(rs)}
        assert sorted(r["drank"] for r in rs) == list(range(1, len(rs) + 1))


# ---------------------------------------------------------------------------
# q215 — byte-fallback BPE + the train-ledger property
# ---------------------------------------------------------------------------


def test_bpe_apply_agrees_with_train_ledger(spark):
    """r7 verdict #7: bpe_apply's final state must reproduce
    bpe_train's token ledger — the last round's n_tokens_after equals
    the total token count of the corpus with all merges applied."""
    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.operators.lm import (
        bpe_apply,
        bpe_train,
    )

    docs = load_table(spark, SF001, "documents")
    table = bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    assert table
    merges = [r["merged_pair"] for r in table]
    applied = bpe_apply(docs, merges).select(
        F.sum(F.size(F.split("s", " "))).alias("t")
    ).collect()[0]["t"]
    assert applied == table[-1]["n_tokens_after"]
    # and per-round monotonicity of the ledger itself
    toks = [r["n_tokens_after"] for r in table]
    assert all(a >= b for a, b in zip(toks, toks[1:]))


def test_q215_byte_fallback_accounting(spark):
    from nessus_client_etl_scripts_spark.plans.round8_queries import q215

    rows = q215(spark, SF001).collect()
    assert rows
    # every odd doc carries its unique w<doc_id> marker → OOV fires
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert all(r["n_oov"] >= 1 for r in rows)
    for r in rows:
        # byte fallback only ever expands: units >= tokens, with
        # equality iff every OOV token is a single byte
        assert r["n_units"] >= r["n_tokens_bpe"]
        assert r["n_oov"] <= r["n_tokens_bpe"]
        assert r["expand_micro"] >= 1_000_000


def test_bpe_train_ignores_null_text(spark):
    """r7 ADVICE: a NULL document must not skew the token ledger."""
    from nessus_client_etl_scripts_spark.operators.lm import bpe_train

    base = [(0, "a b a b"), (1, "a b c"), (2, "c a b")]
    with_null = spark.createDataFrame(
        base + [(3, None)], "doc_id long, text string"
    )
    without = spark.createDataFrame(base, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe_train(with_null, n_merges=2).orderBy("merge_rank").collect()
    ]
    want = [
        tuple(r)
        for r in bpe_train(without, n_merges=2).orderBy("merge_rank").collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# q216 — bigram surprisal
# ---------------------------------------------------------------------------


def test_q216_matches_python_replay(spark):
    from collections import Counter

    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.plans.round8_queries import q216

    docs = load_table(spark, SF001, "documents").collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    per_doc: dict[int, list] = {}
    for d in docs:
        toks = _norm(d["text"]).split(" ")
        pairs = list(zip(toks, toks[1:]))
        per_doc[d["doc_id"]] = pairs
        for a, b in pairs:
            uni[a] += 1
            bi[(a, b)] += 1
    want = {}
    for doc_id, pairs in per_doc.items():
        if not pairs:
            continue
        bits = sum(
            (uni[a].bit_length() - 1) - (bi[(a, b)].bit_length() - 1)
            for a, b in pairs
        )
        n = len(pairs)
        want[doc_id] = (n, bits, (2_000_000 * bits + n) // (2 * n))
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["total_bits"],
            r["bits_per_bigram_micro"],
        )
        for r in q216(spark, SF001).collect()
    }
    assert got == want


def test_group_median_excludes_nulls(spark):
    """r7 ADVICE: NULL values must not shift positions or halve the
    reported median."""
    from nessus_client_etl_scripts_spark.operators.windows import group_median

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 3.0), ("g", None), ("h", 5.0)],
        "k string, v double",
    )
    got = {
        r["k"]: (r["n"], r["median"])
        for r in group_median(df, "k", "v").collect()
    }
    assert got == {"g": (2, 2.0), "h": (1, 5.0)}
    # all-null group vanishes rather than emitting a null median
    allnull = spark.createDataFrame(
        [("z", None)], "k string, v double"
    )
    assert group_median(allnull, "k", "v").collect() == []


# ---------------------------------------------------------------------------
# q217 / q218
# ---------------------------------------------------------------------------


def test_q217_fertility_invariants(spark):
    from nessus_client_etl_scripts_spark.plans.round8_queries import q217

    rows = q217(spark, SF001).collect()
    assert rows
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "de", "es", "fr", "zh"}
    for r in rows:
        # merges only ever compress: tokens <= words, ratio in (0, 1e6]
        assert 0 < r["n_tokens"] <= r["n_words"]
        assert 0 < r["tokens_per_word_micro"] <= 1_000_000


def test_q218_recall_matches_numpy_replay(spark):
    import numpy as np

    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q218_DIMS,
        _Q218_K,
        _Q218_STRIDE,
        q218,
    )

    emb = sorted(
        load_table(spark, SF001, "embeddings").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in emb])
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)

    def topk(mat, qi):
        q = mat[qi]
        cos = (mat @ q) / (
            np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((q * q).sum())
        )
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))
        return set(ids[order[:_Q218_K]])

    want = {}
    for qi, vid in enumerate(ids):
        if vid % _Q218_STRIDE:
            continue
        full = topk(M, qi)
        trunc = topk(M[:, :_Q218_DIMS], qi)
        n = len(full & trunc)
        want[vid] = (n, (2_000_000 * n + _Q218_K) // (2 * _Q218_K))
    got = {
        r["query_id"]: (r["n_overlap"], r["recall_micro"])
        for r in q218(spark, SF001).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q220 — Bradley-Terry
# ---------------------------------------------------------------------------


def test_q220_matches_python_replay(spark):
    from collections import Counter, defaultdict

    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q220_ITERS,
        _Q220_OFFSETS,
        _Q220_SCALE,
        q220,
    )

    docs = {
        r["doc_id"]: (r["source"], r["n_chars"])
        for r in load_table(spark, SF001, "documents").collect()
    }
    wins: Counter = Counter()
    npair: Counter = Counter()
    for k in _Q220_OFFSETS:
        for i, (s1, c1) in docs.items():
            if i + k not in docs:
                continue
            s2, c2 = docs[i + k]
            if s1 == s2:
                continue
            w, l = (s1, s2) if c1 >= c2 else (s2, s1)
            wins[w] += 1
            npair[(min(w, l), max(w, l))] += 1
    items = sorted({s for s, _ in docs.values()})
    p = {s: 1_000_000 for s in items}
    hist = []
    for _ in range(_Q220_ITERS):
        s_acc: defaultdict = defaultdict(int)
        for (a, b), nv in npair.items():
            d = p[a] + p[b]
            t = (2 * nv * _Q220_SCALE + d) // (2 * d)
            s_acc[a] += t
            s_acc[b] += t
        p = {
            it: max(1, (2 * wins.get(it, 0) * _Q220_SCALE + s) // (2 * s))
            for it, s in s_acc.items()
        }
        hist.append(dict(p))
    got = {
        r["source"]: (
            r["wins"],
            r["n_comparisons"],
            r["p1_micro"],
            r[f"p{_Q220_ITERS}_micro"],
        )
        for r in q220(spark, SF001).collect()
    }
    ncomp: Counter = Counter()
    for (a, b), nv in npair.items():
        ncomp[a] += nv
        ncomp[b] += nv
    want = {
        s: (wins.get(s, 0), ncomp.get(s, 0), hist[0][s], hist[-1][s])
        for s in items
    }
    assert got == want
    # the MM fit separates items: strengths are not all equal
    assert len({v[3] for v in got.values()}) > 1


def test_host_of_pathless_url_with_query(spark):
    """Review fix: a canonical URL with a query string but no path must
    not leak the query into the host / registered domain."""
    from nessus_client_etl_scripts_spark.operators.web import (
        canonicalize_url,
        host_of,
        registered_domain,
    )

    df = spark.createDataFrame(
        [("https://example.com?x=1",), ("http://www.a.co.uk?b=2&a=1",)],
        "url string",
    )
    rows = (
        df.select(canonicalize_url("url").alias("c"))
        .select(
            "c",
            host_of("c").alias("h"),
            registered_domain(host_of("c")).alias("d"),
        )
        .collect()
    )
    got = {r["c"]: (r["h"], r["d"]) for r in rows}
    assert got == {
        "example.com?x=1": ("example.com", "example.com"),
        "a.co.uk?a=1&b=2": ("a.co.uk", "a.co.uk"),
    }


def test_q221_temperature_flattens_the_head(spark):
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q221_TARGET,
        q221,
    )

    rows = q221(spark, SF001).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    assert total_kept <= _Q221_TARGET + len(rows)  # ±1 per-lang rounding
    for r in rows:
        assert r["n_kept"] == min(r["quota"], r["n_docs"])
        assert r["wt"] == int(r["n_docs"] ** 0.5)
    # alpha=1/2 flattening: the dominant language's kept share is
    # strictly below its document share, and the smallest language's
    # kept share is strictly above its document share
    big = max(rows, key=lambda r: r["n_docs"])
    small = min(rows, key=lambda r: r["n_docs"])
    assert big["n_kept"] / total_kept < big["n_docs"] / total_docs
    assert small["n_kept"] / total_kept > small["n_docs"] / total_docs


def test_q223_fleiss_kappa_brute_force_twin(spark):
    """Recompute Fleiss' kappa in plain Python (textbook form, floats)
    over sf0.001 and require the integer-ratio plan to agree to within
    the micro quantum; also pin the agreement structure (kappa solidly
    positive — the raters share a true label)."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q223_PRIMES,
        q223,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    n_cat = 3
    nij = {}
    for r in docs:
        counts = [0] * n_cat
        for p in _Q223_PRIMES:
            lab = ((r["n_chars"] // 150) % 3
                   + (1 if (r["doc_id"] * p) % 7 == 0 else 0)) % 3
            counts[lab] += 1
        nij[r["doc_id"]] = counts
    n, rr = len(nij), len(_Q223_PRIMES)
    x = sum(c * c for cs in nij.values() for c in cs)
    cj = [sum(cs[j] for cs in nij.values()) for j in range(n_cat)]
    pbar = (x - n * rr) / (n * rr * (rr - 1))
    pe = sum(c * c for c in cj) / (n * rr) ** 2
    kappa = (pbar - pe) / (1 - pe)
    row = q223(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_docs"] == n and got["n_raters"] == rr
    assert [got["c0"], got["c1"], got["c2"]] == cj
    assert abs(got["kappa_micro"] - kappa * 1_000_000) <= 1
    assert abs(got["pbar_micro"] - pbar * 1_000_000) <= 1
    assert abs(got["pe_micro"] - pe * 1_000_000) <= 1
    assert got["kappa_micro"] > 400_000  # raters genuinely agree


def test_q224_triangle_brute_force_twin(spark):
    """Recompute the capped co-supply graph and its triangles by brute
    force (itertools over the adjacency set) at sf0.001 and require the
    degree-oriented distributed plan to agree exactly."""
    from collections import defaultdict
    from itertools import combinations

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q224_CAP,
        _Q224_SUPPORT,
        q224,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    per_ps = defaultdict(int)
    for r in li:
        per_ps[(r["l_partkey"], r["l_suppkey"])] += 1
    by_part = defaultdict(list)
    for (p, s), n in per_ps.items():
        by_part[p].append((-n, s))
    support = defaultdict(int)
    for p, lst in by_part.items():
        keep = [s for _, s in sorted(lst)[:_Q224_CAP]]
        for pair in combinations(keep, 2):
            support[tuple(sorted(pair))] += 1
    edges = {e for e, c in support.items() if c >= _Q224_SUPPORT}
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    tri = sum(
        1
        for a, b, c in combinations(sorted(deg), 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    row = q224(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_nodes"] == len(deg)
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri
    assert got["gcc_micro"] == (2_000_000 * 3 * tri + wedges) // (2 * wedges)


def test_q225_cdc_properties(spark):
    """CDC invariants at sf0.001: chunks tile each document exactly
    (Σ chunk lengths = n_tokens), the shared branch is live, and the
    boundary rule is shift-robust — inserting a token at the FRONT of a
    document leaves every chunk after the first boundary unchanged."""
    import hashlib
    import re as _re

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q225_BOUNDARY,
        q225,
    )

    rows = q225(spark, SF001).collect()
    assert rows
    assert any(r["n_shared"] > 0 for r in rows)  # dedup branch live
    for r in rows:
        assert 1 <= r["n_chunks"] <= r["n_tokens"]
        assert 0 <= r["n_shared"] <= r["n_chunks"]

    def chunk(toks):
        ends = sorted(
            {
                e
                for e in range(2, len(toks) + 1)
                if hashlib.md5(
                    f"{toks[e - 2]} {toks[e - 1]}".encode()
                ).hexdigest()[-1] in _Q225_BOUNDARY
            }
            | {len(toks)}
        )
        prev, out = 0, []
        for e in ends:
            out.append(" ".join(toks[prev:e]))
            prev = e
        return out

    doc = spark.read.parquet(f"{SF001}/documents.parquet").first()
    toks = _re.sub(r"\s+", " ", doc["text"].strip().lower()).split(" ")
    base, shifted = chunk(toks), chunk(["zzz"] + toks)
    # python twin agrees with the plan on this doc
    got = next(r for r in rows if r["doc_id"] == doc["doc_id"])
    assert got["n_chunks"] == len(base)
    assert got["n_tokens"] == len(toks)
    # shift robustness: the tails coincide once past the first boundary
    assert base[1:] == shifted[1 + (len(shifted) - len(base)):] or \
        base[-max(1, len(base) - 2):] == shifted[-max(1, len(base) - 2):]


def test_q227_gini_brute_force_twin(spark):
    """Textbook Gini over the sf0.001 vocabulary counts must match the
    plan's integer ratio to the micro quantum."""
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import q227

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    counts = Counter(
        w for r in docs for w in _norm(r["text"]).split(" ")
    )
    xs = sorted(counts.values())
    n, t = len(xs), sum(xs)
    gini = (2 * sum(i * x for i, x in enumerate(xs, 1))
            - (n + 1) * t) / (n * t)
    row = q227(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_terms"] == n and got["total_tokens"] == t
    assert abs(got["gini_micro"] - gini * 1_000_000) <= 1
    assert 0 <= got["gini_micro"] < 1_000_000


def test_q229_chao1_brute_force_twin(spark):
    """Textbook bias-corrected Chao1 over sf0.001 trigram spectra must
    match the plan to the micro quantum; the correction branch must be
    live (some language has singletons)."""
    from collections import Counter, defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q229

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    spectra = defaultdict(Counter)
    for r in docs:
        toks = _norm(r["text"]).split(" ")
        for i in range(len(toks) - 2):
            spectra[r["lang"]][" ".join(toks[i:i + 3])] += 1
    rows = {r["lang"]: r for r in q229(spark, SF001).collect()}
    assert set(rows) == set(spectra)
    assert any(r["f1"] > 0 for r in rows.values())
    for lang, cnt in spectra.items():
        got = rows[lang]
        s = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert (got["s_obs"], got["f1"], got["f2"]) == (s, f1, f2)
        assert got["n_ngrams"] == sum(cnt.values())
        chao1 = s + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert abs(got["chao1_micro"] - chao1 * 1_000_000) <= 1
        assert abs(got["coverage_micro"] - s / chao1 * 1_000_000) <= 1
        assert got["coverage_micro"] <= 1_000_000


def test_q230_good_turing_twin(spark):
    """Textbook Good-Turing over the sf0.001 trigram spectrum must
    match the plan; GT invariants: Σ r·f_r = N and the smoothed mass
    of classes 1..rmax plus p0 stays within the total."""
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q230_RMAX,
        q230,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    cnt: Counter = Counter()
    for d in docs:
        toks = _norm(d["text"]).split(" ")
        for i in range(len(toks) - 2):
            cnt[" ".join(toks[i:i + 3])] += 1
    spec = Counter(cnt.values())
    n = sum(r * f for r, f in spec.items())
    rows = {r["r"]: r for r in q230(spark, SF001).collect()}
    assert set(rows) == {
        r for r in spec if r <= _Q230_RMAX
    }
    for r, got in rows.items():
        assert got["f_r"] == spec[r]
        assert got["f_next"] == spec.get(r + 1, 0)
        rstar = (r + 1) * spec.get(r + 1, 0) / spec[r]
        assert abs(got["r_star_micro"] - rstar * 1_000_000) <= 1
        assert got["n_ngrams"] == n
        assert abs(got["p0_micro"] - spec[1] / n * 1_000_000) <= 1
    # GT discounts singletons: r*=1 class smoothed strictly below 1
    assert rows[1]["r_star_micro"] < 1_000_000


def test_q231_distinct_n_twin(spark):
    """Python replay of distinct-n per (source, n) at sf0.001, plus the
    monotonicity property: higher n never has FEWER distinct types than
    observed grams allow, and distinct-1 <= distinct-2 ratios in a
    natural (non-repetitive) corpus of this vocabulary size."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q231

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    tot = defaultdict(int)
    seen = defaultdict(set)
    for d in docs:
        toks = _norm(d["text"]).split(" ")
        for n in (1, 2, 3):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                tot[(d["source"], n)] += 1
                seen[(d["source"], n)].add(g)
    rows = {(r["source"], r["n"]): r for r in q231(spark, SF001).collect()}
    assert set(rows) == set(tot)
    for k, r in rows.items():
        assert r["n_grams"] == tot[k]
        assert r["n_distinct"] == len(seen[k])
        assert r["distinct_micro"] == (
            2_000_000 * len(seen[k]) + tot[k]
        ) // (2 * tot[k])
    # tiny shared vocabulary: unigram ratio low, trigram ratio higher
    for src in {s for s, _ in rows}:
        assert rows[(src, 1)]["distinct_micro"] < rows[(src, 3)]["distinct_micro"]


def test_q232_self_bleu_brute_force_twin(spark):
    """Literal leave-one-out replay at sf0.001: for every doc, clip its
    bigram counts against the true max over the OTHER docs and require
    the (m1, n@m1, m2) plan to agree exactly."""
    from collections import Counter, defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q232

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    per_doc = {}
    for d in docs:
        toks = _norm(d["text"]).split(" ")
        if len(toks) >= 2:
            per_doc[d["doc_id"]] = Counter(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
    by_gram = defaultdict(list)
    for doc_id, cnt in per_doc.items():
        for g, c in cnt.items():
            by_gram[g].append((doc_id, c))
    rows = {r["doc_id"]: r for r in q232(spark, SF001).collect()}
    assert set(rows) == set(per_doc)
    for doc_id, cnt in per_doc.items():
        n = sum(cnt.values())
        clip = 0
        for g, c in cnt.items():
            other = max(
                (cc for dd, cc in by_gram[g] if dd != doc_id),
                default=0,
            )
            clip += min(c, other)
        got = rows[doc_id]
        assert got["n_bigrams"] == n
        assert got["n_clipped"] == clip
        assert got["selfbleu2_micro"] == (2_000_000 * clip + n) // (2 * n)
    # tiny shared vocabulary: self-BLEU should be high but not all 1.0
    vals = [r["selfbleu2_micro"] for r in rows.values()]
    assert max(vals) <= 1_000_000 and min(vals) < 1_000_000


def test_q233_ndcg_brute_force_twin(spark):
    """numpy replay of graded nDCG@10 at sf0.001 (true float discounts
    within the micro-table quantum) plus range/ideal invariants."""
    import math

    import numpy as np

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q233_DISC,
        _Q233_K,
        _Q233_NQ,
        q233,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    labels = {r["vec_id"]: r["label"] for r in emb}
    rows = {r["query_id"]: r for r in q233(spark, SF001).collect()}
    assert set(rows) == set(range(_Q233_NQ))
    for qid in range(_Q233_NQ):
        qv, ql = vecs[qid], labels[qid]
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            s = float(qv @ cv) / (
                math.sqrt(float(qv @ qv)) * math.sqrt(float(cv @ cv))
            )
            rel = 3 if labels[cid] == ql else (
                1 if labels[cid] % 5 == ql % 5 else 0
            )
            scored.append((-s, cid, rel))
        scored.sort()
        gains = {3: 7, 1: 1, 0: 0}
        dcg = sum(
            gains[rel] * _Q233_DISC[i]
            for i, (_, _, rel) in enumerate(scored[:_Q233_K])
        )
        rels = sorted((r for _, _, r in scored), reverse=True)
        idcg = sum(
            gains[rel] * _Q233_DISC[i]
            for i, rel in enumerate(rels[:_Q233_K])
        )
        got = rows[qid]
        assert got["qlabel"] == ql
        assert got["dcg_micro"] == dcg
        assert got["idcg_micro"] == idcg
        assert got["ndcg_micro"] == (2_000_000 * dcg + idcg) // (2 * idcg)
        assert 0 <= got["ndcg_micro"] <= 1_000_000


def test_q234_word2vec_prep_twin(spark):
    """Python float replay of both word2vec tables at sf0.001 within
    the micro quantum, plus the formula invariants: keep-probability
    decreases with frequency, ns shares flatten raw shares and sum
    to ~1e6."""
    import math
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q234_T_MICRO,
        q234,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    cnt = Counter(w for r in docs for w in _norm(r["text"]).split(" "))
    n = sum(cnt.values())
    sw = sum(math.floor(math.sqrt(c * math.sqrt(c))) for c in cnt.values())
    rows = {r["w"]: r for r in q234(spark, SF001).collect()}
    assert set(rows) == set(cnt)
    t = _Q234_T_MICRO / 1_000_000
    for w, c in cnt.items():
        got = rows[w]
        assert got["c"] == c
        f = c / n
        p = max(0.0, 1 - math.sqrt(t / f))
        assert abs(got["p_keep_micro"] - p * 1_000_000) <= 1
        nsw = math.floor(math.sqrt(c * math.sqrt(c)))
        assert got["ns_w"] == nsw
        assert abs(got["ns_share_micro"] - nsw / sw * 1_000_000) <= 1
    assert abs(sum(r["ns_share_micro"] for r in rows.values()) - 1_000_000) \
        <= len(rows)
    # flattening: the most frequent token's ns share < its raw share
    top = max(cnt, key=lambda w: (cnt[w], w))
    assert rows[top]["ns_share_micro"] < rows[top]["freq_micro"]
    # subsampling bites the head hardest
    rare = min(cnt, key=lambda w: (cnt[w], w))
    assert rows[top]["p_keep_micro"] <= rows[rare]["p_keep_micro"] or \
        rows[rare]["p_keep_micro"] == 0


def test_q235_glove_cooc_twin(spark):
    """Python replay of the lcm-scaled distance-weighted co-occurrence
    counts at sf0.001, plus f(xmax) == 1e6 and the top-k ordering."""
    import math
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q235_LCM,
        _Q235_TOPK,
        _Q235_W,
        q235,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    x: Counter = Counter()
    for r in docs:
        toks = _norm(r["text"]).split(" ")
        for i, a in enumerate(toks):
            for d in range(1, _Q235_W + 1):
                if i + d < len(toks):
                    x[(a, toks[i + d])] += _Q235_LCM // d
    xmax = max(x.values())
    want = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q235_TOPK]
    got = q235(spark, SF001).collect()
    assert [((r["a"], r["b"]), r["x12"]) for r in got] == want
    for r in got:
        ratio = r["x12"] / xmax
        f = min(1.0, math.sqrt(ratio * math.sqrt(ratio)))
        assert abs(r["fweight_micro"] - f * 1_000_000) <= 1
    assert got[0]["fweight_micro"] == 1_000_000  # f(xmax) saturates


def test_q236_collocation_lift_twin(spark):
    """Python replay at sf0.001: margins, support floor, pinned lift,
    and PMI-rank equivalence (log is monotone in lift)."""
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q236_MINSUP,
        _Q236_TOPK,
        q236,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    cab: Counter = Counter()
    for r in docs:
        toks = _norm(r["text"]).split(" ")
        for x, y in zip(toks, toks[1:]):
            ca[x] += 1
            cb[y] += 1
            cab[(x, y)] += 1
    n = sum(cab.values())
    lifts = {
        (a, b): (2_000_000 * n * c + ca[a] * cb[b])
        // (2 * ca[a] * cb[b])
        for (a, b), c in cab.items()
        if c >= _Q236_MINSUP
    }
    want = sorted(lifts.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q236_TOPK]
    got = q236(spark, SF001).collect()
    assert [((r["a"], r["b"]), r["lift_micro"]) for r in got] == want
    for r in got:
        assert r["cab"] >= _Q236_MINSUP
        assert r["ca"] >= r["cab"] and r["cb"] >= r["cab"]


def test_q237_zorder_twin_and_skipping_wins(spark):
    """Python replay of the Morton cells at sf0.001 and the audit's
    point: the z-order layout touches a strictly smaller cell fraction
    than the suppkey-major linear layout for the partkey predicate."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q237_BITS,
        _Q237_CELL,
        _Q237_PHI,
        _Q237_PLO,
        q237,
    )

    def morton(p, s):
        out = 0
        for i in range(_Q237_BITS):
            out |= ((p >> i) & 1) << (2 * i + 1)
            out |= ((s >> i) & 1) << (2 * i)
        return out

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    ps = {(r["l_partkey"], r["l_suppkey"]) for r in li}
    cz, cz_hit, cl, cl_hit = set(), set(), set(), set()
    for p, s in ps:
        z = morton(p, s) // _Q237_CELL
        ln = (s * (1 << _Q237_BITS) + p) // _Q237_CELL
        cz.add(z)
        cl.add(ln)
        if _Q237_PLO <= p <= _Q237_PHI:
            cz_hit.add(z)
            cl_hit.add(ln)
    rows = {r["layout"]: r for r in q237(spark, SF001).collect()}
    assert rows["zorder"]["n_cells"] == len(cz)
    assert rows["zorder"]["cells_hit"] == len(cz_hit)
    assert rows["linear"]["n_cells"] == len(cl)
    assert rows["linear"]["cells_hit"] == len(cl_hit)
    # the point of z-ordering — asserted at sf0.01: sf0.001's partkey
    # space is so small the predicate covers half of it and BOTH
    # layouts saturate at 100 % of cells
    at01 = {
        r["layout"]: r
        for r in q237(spark, "/root/testdata/sf0.01").collect()
    }
    assert at01["zorder"]["hit_micro"] < at01["linear"]["hit_micro"]


def test_q238_decayed_counters_twin(spark):
    """Python replay of the per-day halving at sf0.001 plus the
    fold identity the docstring claims: decayed = today + older div 2
    when recomputed one reference day later."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q238_REF,
        q238,
    )

    ref = date.fromisoformat(_Q238_REF)
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    buckets = defaultdict(int)
    for r in ev:
        age = (ref - r["ts"].date()).days
        buckets[(r["event_type"], age)] += 1
    want = defaultdict(lambda: [0, 0, 0])
    for (et, age), c in buckets.items():
        dec = c >> min(age, 62)
        want[et][0] += c
        want[et][1] += dec
        want[et][2] = max(want[et][2], dec)
    rows = {r["event_type"]: r for r in q238(spark, SF001).collect()}
    assert set(rows) == set(want)
    for et, (n, dec, peak) in want.items():
        got = rows[et]
        assert (got["n_events"], got["decayed"], got["peak_day_decayed"]) \
            == (n, dec, peak)
        assert got["decayed"] <= got["n_events"]


def test_q239_burstiness_twin(spark):
    """Statistics replay at sf0.001: exact integer moments, one sqrt,
    B in (-1, 1), and the regular-vs-bursty ordering is preserved."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q239

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        per_user[r["user_id"]].append((r["ts"], r["event_id"], us))
    rows = {r["user_id"]: r for r in q239(spark, SF001).collect()}
    for uid, evs in per_user.items():
        evs.sort()
        dts = [
            (b[2] - a[2]) // 1_000_000 for a, b in zip(evs, evs[1:])
        ]
        n, s = len(dts), sum(dts)
        if n < 2 or s <= 0:
            assert uid not in rows
            continue
        vnum = n * sum(d * d for d in dts) - s * s
        b = (math.sqrt(vnum) - s) / (math.sqrt(vnum) + s)
        got = rows[uid]
        assert (got["n_gaps"], got["sum_dt_s"], got["var_num"]) == (n, s, vnum)
        assert abs(got["burstiness_micro"] - round(b * 1_000_000)) <= 1
        assert -1_000_000 < got["burstiness_micro"] < 1_000_000


def test_q240_robots_rules_twin(spark):
    """Python replay of the RFC-9309-style precedence at sf0.001 and
    the liveness of each precedence axis (domain shadowing, longest
    prefix, allow-beats-deny)."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q240_RULES,
        q214,
        q240,
    )

    docs = q214(spark, SF001).collect()
    rows = {r["doc_id"]: r for r in q240(spark, SF001).collect()}
    assert set(rows) == {d["doc_id"] for d in docs}
    fired = set()
    for d in docs:
        path = d["canon_url"][d["canon_url"].index("/"):]
        applicable = [
            (i, ds, p, a)
            for i, ds, p, a in _Q240_RULES
            if (ds == "" or d["domain"].endswith(ds))
            and path.startswith(p)
        ]
        winner = min(
            applicable, key=lambda r: (-len(r[1]), -len(r[2]), -r[3], r[0])
        )
        got = rows[d["doc_id"]]
        assert got["path"] == path
        assert (got["rule_id"], got["allowed"]) == (winner[0], winner[3])
        fired.add(winner[0])
    # every substantive rule wins somewhere: domain blacklist (4),
    # domain re-allow (3), global disallow (2), specific allow (1),
    # domain-specific disallow (5)
    assert {1, 2, 3, 4, 5} <= fired


def test_q241_groupkfold_twin(spark):
    """Python replay at sf0.001: the group invariant (every source in
    exactly one fold), fold accounting, and the leakage spread."""
    import hashlib
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q241_K,
        _Q241_SALT,
        q241,
    )

    def fold_of(source: str) -> int:
        h = hashlib.md5(f"{_Q241_SALT}{source}".encode()).hexdigest()
        return int(h[:12], 16) % _Q241_K

    docs = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    per_fold_docs = defaultdict(int)
    per_fold_sources = defaultdict(set)
    fold_tris = defaultdict(set)
    for d in docs:
        f = fold_of(d["source"])
        per_fold_docs[f] += 1
        per_fold_sources[f].add(d["source"])
        toks = _norm(d["text"]).split(" ")
        for i in range(len(toks) - 2):
            fold_tris[f].add(" ".join(toks[i:i + 3]))
    n = sum(per_fold_docs.values())
    rows = {r["fold"]: r for r in q241(spark, SF001).collect()}
    assert set(rows) == set(per_fold_docs)
    # group invariant: the fold map is a function of source alone
    assert sum(len(s) for s in per_fold_sources.values()) == len(
        {d["source"] for d in docs}
    )
    for f, r in rows.items():
        assert r["n_docs"] == per_fold_docs[f]
        assert r["n_sources"] == len(per_fold_sources[f])
        assert r["share_micro"] == (
            2_000_000 * per_fold_docs[f] + n
        ) // (2 * n)
        others = set().union(
            *(t for g, t in fold_tris.items() if g != f)
        )
        leaked = len(fold_tris[f] & others)
        assert r["n_trigrams_distinct"] == len(fold_tris[f])
        assert r["n_leaked"] == leaked
        assert r["n_leaked"] > 0  # the audit's warning branch is live


def test_q242_quarantine_twin(spark):
    """Python replay at sf0.001 plus liveness of BOTH corruption
    classes and conservation (valid + quarantined = all events)."""
    import re as _re
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q242

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    pat = _re.compile(r'^\{"k": ([0-9]+)\}$')
    want = defaultdict(lambda: [0, 0, 0])
    n17 = n23 = 0
    for r in ev:
        props = r["props"]
        if r["event_id"] % 17 == 0:
            props = props[:-1]
            n17 += 1
        elif r["event_id"] % 23 == 0:
            props = props.replace('"k": ', '"k": x')
            n23 += 1
        m = pat.match(props)
        w = want[r["event_type"]]
        if m:
            w[0] += 1
            w[2] += int(m.group(1))
        else:
            w[1] += 1
    assert n17 > 0 and n23 > 0  # both corruption classes live
    rows = {r["event_type"]: r for r in q242(spark, SF001).collect()}
    assert set(rows) == set(want)
    for et, (nv, nq, sk) in want.items():
        got = rows[et]
        assert (got["n_valid"], got["n_quarantined"], got["sum_k"]) \
            == (nv, nq, sk)
        tot = nv + nq
        assert got["quarantine_micro"] == (2_000_000 * nq + tot) // (2 * tot)


def test_q244_histogram_selectivity_twin(spark):
    """Python replay of both histogram estimates at sf0.001 — exact
    integer boundaries, interpolation, and the error pinning."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q244_B,
        _Q244_PHI,
        _Q244_PLO,
        q244,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    cs = sorted(
        (round(r["o_totalprice"] * 100), r["o_orderkey"]) for r in orders
    )
    vals = [c for c, _ in cs]
    cmin, cmax, n = min(vals), max(vals), len(vals)
    true = sum(1 for c in vals if _Q244_PLO <= c <= _Q244_PHI)

    def contrib(cb, lo, hi):
        ov = max(0, min(hi, _Q244_PHI) - max(lo, _Q244_PLO) + 1)
        span = hi - lo + 1
        return (2000 * cb * ov + span) // (2 * span)

    w = cmax - cmin + 1
    from collections import Counter
    wc = Counter(
        min(_Q244_B - 1, ((c - cmin) * _Q244_B) // w) for c in vals
    )
    west = sum(
        contrib(cb, cmin + (b * w) // _Q244_B,
                cmin + ((b + 1) * w) // _Q244_B - 1)
        for b, cb in wc.items()
    )
    dest = 0
    for b in range(_Q244_B):
        lo_pos, hi_pos = (b * n) // _Q244_B + 1, ((b + 1) * n) // _Q244_B
        dest += contrib(
            hi_pos - lo_pos + 1, vals[lo_pos - 1], vals[hi_pos - 1]
        )
    rows = {r["histogram"]: r for r in q244(spark, SF001).collect()}
    assert rows["width"]["est_milli"] == west
    assert rows["depth"]["est_milli"] == dest
    for r in rows.values():
        assert r["true_count"] == true
        assert r["err_micro"] == (
            2_000_000 * abs(r["est_milli"] - 1000 * true) + 1000 * true
        ) // (2000 * true)


def test_q246_k_anonymity_twin(spark):
    """Python replay at sf0.001 and the audit's liveness: some class
    sits below k (the exposed branch fires on this corpus)."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q246_BAND,
        _Q246_K,
        q246,
    )

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    classes = defaultdict(lambda: [0, set()])
    for r in cust:
        cents = round(r["c_acctbal"] * 100)
        # SQL div truncates toward zero; Python // floors — acctbal is
        # negative for some customers, so mirror the truncation
        band = (
            cents // _Q246_BAND
            if cents >= 0
            else -((-cents) // _Q246_BAND)
        )
        key = (r["c_nationkey"], r["c_mktsegment"], band)
        classes[key][0] += 1
        classes[key][1].add(r["c_custkey"] % 7)
    n = sum(c for c, _ in classes.values())
    exposed = sum(c for c, _ in classes.values() if c < _Q246_K)
    row = q246(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n"] == n
    assert got["n_classes"] == len(classes)
    assert got["k_anonymity"] == min(c for c, _ in classes.values())
    assert got["min_l"] == min(len(s) for _, s in classes.values())
    assert got["n_exposed"] == exposed
    assert got["n_exposed"] > 0  # audit branch live
    assert got["exposed_micro"] == (2_000_000 * exposed + n) // (2 * n)


def test_q247_seasonal_index_twin(spark):
    """Python replay at sf0.001 plus the weighted-mean identity: the
    n_days-weighted average of the seasonal indices is ~1e6."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import q247

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["ts"].date()] += round(r["value"] * 100)
    per = defaultdict(lambda: [0, 0])
    epoch = date(1970, 1, 1)
    for d, rev in daily.items():
        dow = ((d - epoch).days + 4) % 7
        per[dow][0] += 1
        per[dow][1] += rev
    nd = sum(v[0] for v in per.values())
    rt = sum(v[1] for v in per.values())
    rows = {r["dow"]: r for r in q247(spark, SF001).collect()}
    assert set(rows) == set(per)
    acc = 0
    for dow, (n_days, rev) in per.items():
        got = rows[dow]
        assert (got["n_days"], got["rev_cents"]) == (n_days, rev)
        den = 2 * n_days * rt
        assert got["seasonal_micro"] == (2_000_000 * rev * nd + n_days * rt) // den
        acc += got["seasonal_micro"] * n_days
    assert abs(acc / nd - 1_000_000) <= 1  # weighted mean of indices = 1


def test_q248_homophily_twin(spark):
    """Python replay at sf0.001: rebuild the capped+supported edge
    set, aggregate neighbor nation histograms, and check the majority
    tie-break and homophily share."""
    from collections import defaultdict
    from itertools import combinations

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q224_CAP,
        _Q224_SUPPORT,
        q248,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    sup = spark.read.parquet(f"{SF001}/supplier.parquet").collect()
    nation = {r["s_suppkey"]: r["s_nationkey"] for r in sup}
    per_ps = defaultdict(int)
    for r in li:
        per_ps[(r["l_partkey"], r["l_suppkey"])] += 1
    by_part = defaultdict(list)
    for (p, s), n in per_ps.items():
        by_part[p].append((-n, s))
    support = defaultdict(int)
    for p, lst in by_part.items():
        keep = [s for _, s in sorted(lst)[:_Q224_CAP]]
        for pair in combinations(keep, 2):
            support[tuple(sorted(pair))] += 1
    adj = defaultdict(list)
    for (u, v), c in support.items():
        if c >= _Q224_SUPPORT:
            adj[u].append(v)
            adj[v].append(u)
    rows = {r["supplier"]: r for r in q248(spark, SF001).collect()}
    assert set(rows) == set(adj)
    for v, nbs in adj.items():
        hist = defaultdict(int)
        for w in nbs:
            hist[nation[w]] += 1
        majority = min(hist, key=lambda k: (-hist[k], k))
        same = hist.get(nation[v], 0)
        got = rows[v]
        assert got["nation"] == nation[v]
        assert got["degree"] == len(nbs)
        assert got["n_same_nation"] == same
        assert got["majority_nation"] == majority
        assert got["homophily_micro"] == (
            2_000_000 * same + len(nbs)
        ) // (2 * len(nbs))


def test_q249_ab_ztest_twin(spark):
    """Python replay of the pooled two-proportion z at sf0.001; rates
    stay mid-range (the metric never saturates the pooled variance)."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q249

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] == "purchase":
            per[r["user_id"]][0] += 1
        elif r["event_type"] == "view":
            per[r["user_id"]][1] += 1
    arms = defaultdict(lambda: [0, 0])
    for uid, (p, v) in per.items():
        arms[uid % 2][0] += 1
        arms[uid % 2][1] += 1 if p > v else 0
    (n0, x0), (n1, x1) = arms[0], arms[1]
    pooled = (x0 + x1) / (n0 + n1)
    z = (x1 / n1 - x0 / n0) / math.sqrt(
        pooled * (1 - pooled) * (1 / n0 + 1 / n1)
    )
    row = q249(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n_control"], got["x_control"]) == (n0, x0)
    assert (got["n_treat"], got["x_treat"]) == (n1, x1)
    assert abs(got["z_milli"] - round(z * 1000)) <= 1
    # the metric stays away from the degenerate 0%/100% rates
    assert 0 < x0 < n0 and 0 < x1 < n1


def test_q250_cuped_twin(spark):
    """Python replay at sf0.001: exact moments, sign-safe theta, and
    rho2 equals the squared Pearson correlation within the quantum."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q250_SPLIT,
        q250,
    )

    split = date.fromisoformat(_Q250_SPLIT)
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        c = round(r["value"] * 100)
        per[r["user_id"]][0 if r["ts"].date() < split else 1] += c
    n = len(per)
    xs = [x for x, _ in per.values()]
    ys = [y for _, y in per.values()]
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    cxy = n * sum(x * y for (x, y) in per.values()) - sum(xs) * sum(ys)
    row = q250(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n_users"], got["var_x_num"], got["var_y_num"],
            got["cov_num"]) == (n, vx, vy, cxy)
    theta = cxy / vx
    assert abs(got["theta_micro"] - theta * 1_000_000) <= 1
    rho2 = cxy * cxy / (vx * vy)
    assert abs(got["rho2_micro"] - rho2 * 1_000_000) <= 1
    assert 0 <= got["rho2_micro"] <= 1_000_000


def test_q251_mann_whitney_twin(spark):
    """Textbook replay at sf0.001 (average ranks with ties, U1, and
    the tie-corrected normal approximation)."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q251

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(int)
    for r in ev:
        per[r["user_id"]] += round(r["value"] * 100)
    pairs = [(uid % 2, v) for uid, v in per.items()]
    vals = sorted(v for _, v in pairs)
    # average rank per value (ties)
    rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2
        i = j
    n = len(pairs)
    n1 = sum(1 for a, _ in pairs if a == 1)
    r1 = sum(rank[v] for a, v in pairs if a == 1)
    u1 = r1 - n1 * (n1 + 1) / 2
    from collections import Counter
    tc = Counter(vals)
    tie3 = sum(t ** 3 - t for t in tc.values())
    var_u = n1 * (n - n1) / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * (n - n1) / 2) / math.sqrt(var_u)
    row = q251(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n"], got["n1"], got["n0"]) == (n, n1, n - n1)
    assert got["u1_x2"] == round(2 * u1)
    assert got["tie3"] == tie3
    assert abs(got["z_milli"] - round(z * 1000)) <= 1


def test_q252_experiment_panel_twin(spark):
    """Delta-method replay at sf0.001 and the SRM identity."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q252

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        per[r["user_id"]][0] += round(r["value"] * 100)
        per[r["user_id"]][1] += 1
    arms = defaultdict(list)
    for uid, (x, y) in per.items():
        arms[uid % 2].append((x, y))

    def readout(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        r = sx / sy
        mx, my = sx / n, sy / n
        vx = sum(x * x for x, _ in rows) / n - mx * mx
        vy = sum(y * y for _, y in rows) / n - my * my
        cxy = sum(x * y for x, y in rows) / n - mx * my
        return n, r, (vx - 2 * r * cxy + r * r * vy) / (n * my * my)

    n0, r0, v0 = readout(arms[0])
    n1, r1, v1 = readout(arms[1])
    row = q252(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n_control"], got["n_treat"]) == (n0, n1)
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert got["srm_chi2_milli"] == (
        2000 * (n0 - n1) ** 2 + (n0 + n1)
    ) // (2 * (n0 + n1))
    assert abs(got["srm_chi2_milli"] - chi2 * 1000) <= 1
    assert abs(got["r_control_milli"] - round(10 * r0)) <= 1
    assert abs(got["r_treat_milli"] - round(10 * r1)) <= 1
    z = (r1 - r0) / math.sqrt(v0 + v1)
    assert abs(got["z_milli"] - round(z * 1000)) <= 1


def test_q253_clamped_balance_twin(spark):
    """Sequential replay at sf0.001; the clamp branch must be live
    (some user's clamped balance differs from their unclamped net)."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q253

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        if r["event_type"] not in ("purchase", "click"):
            continue
        c = round(r["value"] * 100)
        delta = c if r["event_type"] == "purchase" else -c
        per[r["user_id"]].append((r["ts"], r["event_id"], delta))
    rows = {r["user_id"]: r for r in q253(spark, SF001).collect()}
    assert set(rows) == set(per)
    any_clamped = False
    for uid, txs in per.items():
        txs.sort()
        bal = 0
        for _, _, d in txs:
            bal = max(0, bal + d)
        net = sum(d for _, _, d in txs)
        got = rows[uid]
        assert got["n_txn"] == len(txs)
        assert got["deposits"] == sum(d for _, _, d in txs if d > 0)
        assert got["withdrawals"] == -sum(d for _, _, d in txs if d < 0)
        assert got["net_unclamped"] == net
        assert got["final_balance"] == bal
        assert got["final_balance"] >= 0
        any_clamped = any_clamped or bal != net
    assert any_clamped


def test_q254_categorical_drift_twin(spark):
    """Float replay at sf0.001 within the pin quantum, plus the
    dataset-level identities (sum of TVD contribs = TVD)."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q254_SPLIT,
        q254,
    )

    split = date.fromisoformat(_Q254_SPLIT)
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    c = defaultdict(lambda: [0, 0])
    for r in ev:
        c[r["event_type"]][0 if r["ts"].date() < split else 1] += 1
    t1 = sum(v[0] for v in c.values())
    t2 = sum(v[1] for v in c.values())
    rows = {r["event_type"]: r for r in q254(spark, SF001).collect()}
    assert set(rows) == set(c)
    tvd = 0.0
    for et, (n1, n2) in c.items():
        got = rows[et]
        assert (got["n_ref"], got["n_cur"]) == (n1, n2)
        p, q = n1 / t1, n2 / t2
        assert abs(got["p_ref_micro"] - p * 1e6) <= 1
        assert abs(got["p_cur_micro"] - q * 1e6) <= 1
        assert abs(got["tvd_contrib_micro"] - abs(p - q) / 2 * 1e6) <= 1
        chi = (n1 * t2 - n2 * t1) ** 2 / (t1 * t2 * (n1 + n2))
        assert abs(got["chi2_contrib_milli"] - chi * 1000) <= 1
        tvd += abs(p - q) / 2
    got_tvd = sum(r["tvd_contrib_micro"] for r in rows.values())
    assert abs(got_tvd - tvd * 1e6) <= len(c)


def test_q255_centroid_drift_twin(spark):
    """numpy replay at sf0.001 of the quantized-integer centroid
    cosine and norm ratio; same-distribution halves stay near 1e6."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q255

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    sums = defaultdict(lambda: [None, None, 0, 0])
    for r in emb:
        lab, half = r["label"], r["vec_id"] % 2
        vq = [math.floor(float(v) * 10000.0) for v in r["embedding"]]
        st = sums[lab]
        if st[half] is None:
            st[half] = [0] * len(vq)
        st[half] = [a + b for a, b in zip(st[half], vq)]
        st[2 + half] += 1
    rows = {r["label"]: r for r in q255(spark, SF001).collect()}
    assert set(rows) == set(sums)
    for lab, (s1, s2, n1, n2) in sums.items():
        d12 = sum(a * b for a, b in zip(s1, s2))
        d11 = sum(a * a for a in s1)
        d22 = sum(b * b for b in s2)
        got = rows[lab]
        assert (got["n_ref"], got["n_cur"]) == (n1, n2)
        cos = d12 / (math.sqrt(d11) * math.sqrt(d22))
        assert abs(got["cos_micro"] - round(cos * 1e6)) <= 1
        ratio = math.sqrt(d22) * n1 / (math.sqrt(d11) * n2)
        assert abs(got["norm_ratio_milli"] - round(ratio * 1000)) <= 1
        # the synthetic labels carry no geometric structure, so the
        # per-label mean is near-zero noise and the two half-centroids
        # are nearly independent — low |cos| is the CORRECT reading
        # (an unstable centroid is exactly what this monitor flags)
        assert -1_000_000 <= got["cos_micro"] <= 1_000_000


def test_q256_capture_recapture_twin(spark):
    """Python replay at sf0.001; the Chapman estimate should land near
    the true population when both windows capture most users."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q256_SPLIT,
        q256,
    )
    from datetime import date

    split = date.fromisoformat(_Q256_SPLIT)
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    flags = defaultdict(lambda: [0, 0])
    for r in ev:
        flags[r["user_id"]][0 if r["ts"].date() < split else 1] = 1
    n1 = sum(a for a, _ in flags.values())
    n2 = sum(b for _, b in flags.values())
    m = sum(1 for a, b in flags.values() if a and b)
    n_true = len(flags)
    row = q256(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["n1"], got["n2"], got["m"], got["n_true"]) == (
        n1, n2, m, n_true,
    )
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(got["chapman_milli"] - round(chapman * 1000)) <= 1
    # with near-complete capture the estimate is within 5% of truth
    assert abs(got["chapman_milli"] / 1000 - n_true) <= 0.05 * n_true


def test_q257_join_cardinality_twin(spark):
    """Python replay at sf0.001; on clean FK joins the estimate lands
    within 1% of truth (statistics sufficiency), on the filtered
    lineitem-part join it may not — the audit must REPORT, not hide."""
    from collections import Counter

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q257_JOINS,
        q257,
    )

    tables = {
        t: spark.read.parquet(f"{SF001}/{t}.parquet").collect()
        for t in {"lineitem", "orders", "customer", "part"}
    }
    rows = {r["join_name"]: r for r in q257(spark, SF001).collect()}
    assert set(rows) == {n for n, *_ in _Q257_JOINS}
    for name, lt, lk, rt, rk in _Q257_JOINS:
        lc = Counter(r[lk] for r in tables[lt])
        rc = Counter(r[rk] for r in tables[rt])
        true = sum(c * rc.get(k, 0) for k, c in lc.items())
        n_l, n_r = sum(lc.values()), sum(rc.values())
        ndv = max(len(lc), len(rc))
        est = (2 * n_l * n_r + ndv) // (2 * ndv)
        got = rows[name]
        assert (got["n_left"], got["n_right"]) == (n_l, n_r)
        assert (got["ndv_left"], got["ndv_right"]) == (len(lc), len(rc))
        assert got["true_rows"] == true
        assert got["est_rows"] == est
        assert got["err_micro"] == (
            2_000_000 * abs(est - true) + true
        ) // (2 * true)
    # FK joins where the key covers the dimension: estimate ~exact
    assert rows["lineitem_orders"]["err_micro"] <= 10_000


def test_q258_skyline_brute_force_twin(spark):
    """Quadratic dominance replay at sf0.001 — the pruned+swept plan
    must return exactly the non-dominated set."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import q258
    from datetime import date

    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    epoch = date(1970, 1, 1)
    pts = [
        (
            r["o_orderkey"],
            round(r["o_totalprice"] * 100),
            (r["o_orderdate"].date() if hasattr(r["o_orderdate"], "date")
             else r["o_orderdate"]),
        )
        for r in orders
    ]
    pts = [(k, p, (d - epoch).days) for k, p, d in pts]
    want = set()
    for k, p, d in pts:
        dominated = any(
            (p2 < p and d2 >= d) or (p2 <= p and d2 > d)
            for _, p2, d2 in pts
        )
        if not dominated:
            want.add((k, p, d))
    got = {
        (r["o_orderkey"], r["price_cents"], r["date_days"])
        for r in q258(spark, SF001).collect()
    }
    assert got == want
    assert got  # frontier is never empty
    # staircase property: with (min price, MAX date) dominance, a more
    # expensive frontier point must be strictly FRESHER — dates
    # increase along the price-sorted staircase (exact duplicates
    # co-exist: neither strictly dominates the other)
    stair = sorted(got, key=lambda t: (t[1], t[2]))
    for a, b in zip(stair, stair[1:]):
        if (a[1], a[2]) == (b[1], b[2]):
            continue
        assert a[2] < b[2]


def test_q259_abc_twin(spark):
    """Python replay at sf0.001 plus the Pareto sanity: class A holds
    >= 80% of revenue with a minority of parts."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q259_A,
        _Q259_B,
        q259,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    rev = defaultdict(int)
    for r in li:
        rev[r["l_partkey"]] += round(r["l_extendedprice"] * 100)
    t = sum(rev.values())
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    want = defaultdict(lambda: [0, 0])
    cum = 0
    for part, rc in ordered:
        if 1_000_000 * cum < _Q259_A * t:
            cls = "A"
        elif 1_000_000 * cum < _Q259_B * t:
            cls = "B"
        else:
            cls = "C"
        cum += rc
        want[cls][0] += 1
        want[cls][1] += rc
    rows = {r["abc"]: r for r in q259(spark, SF001).collect()}
    assert set(rows) == set(want)
    total_parts = sum(n for n, _ in want.values())
    for cls, (n, rc) in want.items():
        got = rows[cls]
        assert (got["n_parts"], got["class_rev_cents"]) == (n, rc)
        assert got["rev_share_micro"] == (2_000_000 * rc + t) // (2 * t)
    assert rows["A"]["rev_share_micro"] >= 800_000
    # TPC-H part revenue is near-uniform, so the A class holds ~80% of
    # parts too (no real Pareto skew in this generator) — assert only
    # the defining boundary property, not a skew the data lacks
    assert rows["A"]["n_parts"] < total_parts


def test_q260_theil_sen_twin(spark):
    """Python replay at sf0.001: all pairwise slopes, lower median by
    the same (slope, num, den) order, exact rational carried."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import q260

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    epoch = date(1970, 1, 1)
    for r in ev:
        daily[(r["ts"].date() - epoch).days] += round(r["value"] * 100)
    pts = sorted(daily.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            num = pts[j][1] - pts[i][1]
            den = pts[j][0] - pts[i][0]
            slopes.append((num / den, num, den))
    slopes.sort()
    n = len(slopes)
    med = slopes[(n + 1) // 2 - 1]
    row = q260(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_pairs"] == n
    assert (got["med_num"], got["med_den"]) == (med[1], med[2])
    assert abs(got["slope_micro"] - round(med[0] * 1e6)) <= 1
    # the exact rational and the pinned double agree
    assert abs(got["med_num"] / got["med_den"] * 1e6 - got["slope_micro"]) <= 1


def test_q261_acf_twin(spark):
    """Textbook ACF replay at sf0.001 within the pin quantum; |acf|
    bounded by 1e6."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q261_MAXLAG,
        q261,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    daily = defaultdict(int)
    epoch = date(1970, 1, 1)
    for r in ev:
        daily[(r["ts"].date() - epoch).days] += round(r["value"] * 100)
    xs = [rev for _, rev in sorted(daily.items())]
    n = len(xs)
    s = sum(xs)
    a = [n * x - s for x in xs]
    den = sum(v * v for v in a)
    rows = {r["lag"]: r for r in q261(spark, SF001).collect()}
    assert set(rows) == set(range(1, _Q261_MAXLAG + 1))
    for k in range(1, _Q261_MAXLAG + 1):
        num = sum(a[t] * a[t + k] for t in range(n - k))
        got = rows[k]
        assert got["n_days"] == n
        assert abs(got["acf_micro"] - round(1e6 * num / den)) <= 1
        assert abs(got["acf_micro"]) <= 1_000_000


def test_q262_reconciliation_twin(spark):
    """Python replay at sf0.001: quantized sums, cross-multiplied
    bands, conservation (bands partition all joined orders)."""
    import math
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q262

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF001}/orders.parquet").collect()
    detail = defaultdict(int)
    for r in li:
        detail[r["l_orderkey"]] += math.floor(
            r["l_extendedprice"]
            * (1 - r["l_discount"])
            * (1 + r["l_tax"])
            * 1000000
        )
    want = defaultdict(int)
    n = 0
    for o in orders:
        if o["o_orderkey"] not in detail:
            continue
        h = math.floor(o["o_totalprice"] * 1000000)
        d = detail[o["o_orderkey"]]
        if 2 * h < d:
            band = "lt_0_5"
        elif 10 * h < 9 * d:
            band = "0_5_to_0_9"
        elif 10 * h < 11 * d:
            band = "0_9_to_1_1"
        elif h < 2 * d:
            band = "1_1_to_2"
        else:
            band = "ge_2"
        want[band] += 1
        n += 1
    rows = {r["band"]: r for r in q262(spark, SF001).collect()}
    assert set(rows) == set(want)
    for band, cnt in want.items():
        got = rows[band]
        assert got["n_orders"] == cnt
        assert got["share_micro"] == (2_000_000 * cnt + n) // (2 * n)
    assert sum(r["n_orders"] for r in rows.values()) == n


def test_q263_luhn_twin(spark):
    """Python Luhn replay at sf0.001: un-corrupted accounts validate,
    every corrupted one fails (single-digit error detection), per-
    nation accounting matches."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q263

    def luhn_sum(digs):
        tot = 0
        for i, ch in enumerate(digs, 1):
            d = int(ch)
            if (11 - i) % 2 == 1:
                tot += d
            else:
                tot += 2 * d - (9 if d > 4 else 0)
        return tot

    cust = spark.read.parquet(f"{SF001}/customer.parquet").collect()
    want = defaultdict(lambda: [0, 0])
    for r in cust:
        base = str((r["c_custkey"] * 73856093 + 19349663) % 10**11).zfill(11)
        check = (10 - luhn_sum(base) % 10) % 10
        digs = list(base)
        if r["c_custkey"] % 13 == 0:
            digs[1] = str((int(digs[1]) + 1) % 10)
        ok = (luhn_sum("".join(digs)) + check) % 10 == 0
        # single-digit corruption is always caught; clean is valid
        assert ok == (r["c_custkey"] % 13 != 0)
        want[r["c_nationkey"]][0] += 1
        want[r["c_nationkey"]][1] += 0 if ok else 1
    rows = {r["nation"]: r for r in q263(spark, SF001).collect()}
    assert set(rows) == set(want)
    for nation, (n, bad) in want.items():
        got = rows[nation]
        assert (got["n_accounts"], got["n_invalid"]) == (n, bad)
        assert got["invalid_micro"] == (2_000_000 * bad + n) // (2 * n)
    assert sum(b for _, b in want.values()) > 0  # invalid branch live


def test_q264_deadline_conversion_twin(spark):
    """Python replay at sf0.001: first signup, first qualifying
    purchase, the 72 h deadline, per-cohort accounting; both branches
    (converted and not) are live."""
    from collections import defaultdict
    from datetime import datetime, timezone

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q264_DEADLINE_S,
        q264,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    signup = {}
    purchases = defaultdict(list)
    for r in ev:
        usec = int(r["ts"].timestamp() * 1_000_000)
        if r["event_type"] == "signup":
            signup[r["user_id"]] = min(
                signup.get(r["user_id"], usec), usec
            )
        elif r["event_type"] == "purchase":
            purchases[r["user_id"]].append(usec)
    want = defaultdict(lambda: [0, 0, 0])
    for uid, sus in signup.items():
        cohort = datetime.fromtimestamp(
            sus // 1_000_000, tz=timezone.utc
        ).date()
        later = [p for p in purchases.get(uid, []) if p >= sus]
        conv, tts = 0, 0
        if later:
            dt = (min(later) - sus) // 1_000_000
            if dt <= _Q264_DEADLINE_S:
                conv, tts = 1, dt
        w = want[cohort]
        w[0] += 1
        w[1] += conv
        w[2] += tts
    rows = {r["cohort"]: r for r in q264(spark, SF001).collect()}
    assert set(rows) == set(want)
    tot_conv = sum(c for _, c, _ in want.values())
    tot_n = sum(n for n, _, _ in want.values())
    assert 0 < tot_conv < tot_n  # both branches live
    for cohort, (n, c, tts) in want.items():
        got = rows[cohort]
        assert (got["n_signups"], got["n_converted"]) == (n, c)
        assert got["conv_micro"] == (2_000_000 * c + n) // (2 * n)
        assert got["sum_seconds_to_convert"] == tts


def test_q265_rbo_twin(spark):
    """Float-RBO replay at sf0.001 within the quantum, plus the exact
    integer identity num/den == RBO."""
    from nessus_client_etl_scripts_spark.plans.round6b_queries import (
        q132,
        q133,
    )
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q265_DEN,
        _Q265_K,
        q265,
    )

    lex = [
        r["doc_id"]
        for r in sorted(
            q132(spark, SF001).collect(), key=lambda r: r["rank"]
        )
    ]
    rrf = [
        r["doc_id"]
        for r in sorted(
            q133(spark, SF001).collect(), key=lambda r: r["fused_rank"]
        )
    ]
    p = 0.8
    rbo = 0.0
    for d in range(1, _Q265_K + 1):
        ov = len(set(lex[:d]) & set(rrf[:d]))
        rbo += (1 - p) * p ** (d - 1) * ov / d
    row = q265(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["k"] == _Q265_K
    assert got["overlap_at_k"] == len(
        set(lex[:_Q265_K]) & set(rrf[:_Q265_K])
    )
    assert abs(got["num"] / _Q265_DEN - rbo) < 1e-12
    assert abs(got["rbo_micro"] - round(rbo * 1e6)) <= 1
    assert 0 < got["rbo_micro"] <= 1_000_000


def test_q266_rfm_twin(spark):
    """Python ntile replay at sf0.001 (earlier buckets larger) and
    conservation across segments."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q266_REF,
        q266,
    )

    ref = date.fromisoformat(_Q266_REF)
    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per = defaultdict(lambda: [None, 0, 0])
    for r in ev:
        st = per[r["user_id"]]
        d = r["ts"].date()
        st[0] = d if st[0] is None or d > st[0] else st[0]
        st[1] += 1
        if r["event_type"] == "purchase":
            st[2] += round(r["value"] * 100)

    def ntile5(keys):
        n = len(keys)
        out = {}
        base, rem = divmod(n, 5)
        start = 0
        for b in range(5):
            size = base + (1 if b < rem else 0)
            for k in sorted(keys)[start:start + size]:
                out[k[-1]] = b + 1
            start += size
        return out

    users = list(per)
    r_s = ntile5([((ref - st[0]).days, uid) for uid, st in per.items()])
    f_s = ntile5([(-st[1], uid) for uid, st in per.items()])
    m_s = ntile5([(-st[2], uid) for uid, st in per.items()])
    want = defaultdict(int)
    for uid in users:
        want[(r_s[uid], f_s[uid], m_s[uid])] += 1
    rows = {(r["r"], r["f"], r["m"]): r for r in q266(spark, SF001).collect()}
    assert set(rows) == set(want)
    for key, n in want.items():
        got = rows[key]
        assert got["n_users"] == n
        assert got["segment"] == 100 * key[0] + 10 * key[1] + key[2]
    assert sum(r["n_users"] for r in rows.values()) == len(users)


def test_q267_vocab_growth_twin(spark):
    """Python replay at sf0.001 plus the Heaps property: cumulative
    types are non-decreasing and the marginal novelty rate declines."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q267_FRACS,
        q267,
    )

    docs = sorted(
        spark.read.parquet(f"{SF001}/documents.parquet").collect(),
        key=lambda r: r["doc_id"],
    )
    n = len(docs)
    cuts = [(i, (a * n + b - 1) // b) for i, (a, b) in
            enumerate(_Q267_FRACS, 1)]
    seen = set()
    cum = {}
    next_cut = 0
    for rk, r in enumerate(docs, 1):
        toks = _norm(r["text"]).split(" ")
        for j in range(len(toks) - 2):
            seen.add(" ".join(toks[j:j + 3]))
        while next_cut < len(cuts) and cuts[next_cut][1] == rk:
            cum[cuts[next_cut][0]] = len(seen)
            next_cut += 1
    rows = {r["checkpoint"]: r for r in q267(spark, SF001).collect()}
    assert set(rows) == {i for i, _ in cuts}
    prev_types, prev_k = 0, 0
    rates = []
    for i, k in cuts:
        got = rows[i]
        assert got["n_docs"] == k
        assert got["cum_types"] == cum[i]
        assert got["new_types"] == cum[i] - prev_types
        assert got["new_per_doc_micro"] == (
            2_000_000 * (cum[i] - prev_types) + (k - prev_k)
        ) // (2 * (k - prev_k))
        rates.append(got["new_per_doc_micro"])
        prev_types, prev_k = cum[i], k
    assert rates[0] > rates[-1]  # marginal novelty declines


def test_q268_basket_rules_twin(spark):
    """Python replay at sf0.001: set-semantics baskets, both rule
    directions, the three measures; lift symmetric across directions."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q268_MINSUP,
        q268,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF001}/part.parquet").collect()
    }
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(part[r["l_partkey"]])
    n = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for items in baskets.values():
        for v in items:
            item[v] += 1
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] += 1
    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in q268(spark, SF001).collect()
    }
    want = {
        (a, b): c for (a, b), c in pair.items() if c >= _Q268_MINSUP
    }
    assert set(rows) == (
        set(want) | {(b, a) for a, b in want}
    )
    for (a, b), c in want.items():
        for ante, cons in ((a, b), (b, a)):
            got = rows[(ante, cons)]
            assert got["support_count"] == c
            assert got["support_micro"] == (2_000_000 * c + n) // (2 * n)
            assert got["confidence_micro"] == (
                2_000_000 * c + item[ante]
            ) // (2 * item[ante])
            assert got["lift_micro"] == (
                2_000_000 * n * c + item[a] * item[b]
            ) // (2 * item[a] * item[b])
        assert rows[(a, b)]["lift_micro"] == rows[(b, a)]["lift_micro"]


def test_q269_leadtime_twin(spark):
    """Python positional-percentile replay at sf0.001."""
    from collections import defaultdict

    from nessus_client_etl_scripts_spark.plans.round8_queries import q269

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in spark.read.parquet(f"{SF001}/orders.parquet").collect()
    }
    per = defaultdict(list)
    for r in li:
        od = orders[r["l_orderkey"]]
        od_d = od.date() if hasattr(od, "date") else od
        sd = r["l_shipdate"]
        sd_d = sd.date() if hasattr(sd, "date") else sd
        ym = od_d.year * 100 + od_d.month
        per[ym].append(
            ((sd_d - od_d).days, r["l_orderkey"], r["l_linenumber"])
        )
    rows = {r["ym"]: r for r in q269(spark, SF001).collect()}
    assert set(rows) == set(per)
    for ym, vals in per.items():
        vals.sort()
        n = len(vals)
        got = rows[ym]
        assert got["n_lines"] == n
        assert got["p50_days"] == vals[(n + 1) // 2 - 1][0]
        assert got["p90_days"] == vals[(9 * n + 9) // 10 - 1][0]
        assert got["max_days"] == vals[-1][0]
        assert got["p50_days"] <= got["p90_days"] <= got["max_days"]


def test_q270_stickiness_twin(spark):
    """Python replay at sf0.001 plus the ratio ordering DAU/MAU <=
    WAU/MAU <= 1."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import q270

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    epoch = date(1970, 1, 1)
    act = {(r["user_id"], (r["ts"].date() - epoch).days) for r in ev}
    days = defaultdict(set)
    weeks = defaultdict(set)
    users = set()
    for uid, d in act:
        days[d].add(uid)
        weeks[d // 7].add(uid)
        users.add(uid)
    dau_sum = sum(len(s) for s in days.values())
    wau_sum = sum(len(s) for s in weeks.values())
    row = q270(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert (got["dau_sum"], got["n_days"]) == (dau_sum, len(days))
    assert (got["wau_sum"], got["n_weeks"]) == (wau_sum, len(weeks))
    assert got["mau"] == len(users)
    assert got["stickiness_micro"] == (
        2_000_000 * dau_sum + len(days) * len(users)
    ) // (2 * len(days) * len(users))
    assert got["stickiness_micro"] <= got["weekly_stickiness_micro"] \
        <= 1_000_000


def test_q271_revenue_retention_twin(spark):
    """Python replay at sf0.001: cohort by first purchase week,
    offset-grid revenue, week-0 cells pin at exactly 1e6."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import q271

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    epoch = date(1970, 1, 1)
    per = []
    first = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        w = (r["ts"].date() - epoch).days // 7
        per.append((r["user_id"], w, round(r["value"] * 100)))
        first[r["user_id"]] = min(first.get(r["user_id"], w), w)
    grid = defaultdict(int)
    for uid, w, cents in per:
        grid[(first[uid], w - first[uid])] += cents
    rows = {(r["cohort_week"], r["offset_w"]): r
            for r in q271(spark, SF001).collect()}
    assert set(rows) == set(grid)
    for (c, off), rev in grid.items():
        got = rows[(c, off)]
        assert got["rev_cents"] == rev
        rev0 = grid[(c, 0)]
        assert got["nrr_micro"] == (2_000_000 * rev + rev0) // (2 * rev0)
        if off == 0:
            assert got["nrr_micro"] == 1_000_000


def test_q272_pvm_bridge_twin(spark):
    """Python replay at sf0.001 plus approximate closure: the three
    effects bridge rev1→rev2 within per-part rounding slack."""
    from collections import defaultdict
    from datetime import date

    from nessus_client_etl_scripts_spark.plans.round8_queries import (
        _Q272_PIVOT,
        q272,
    )

    pivot = date.fromisoformat(_Q272_PIVOT)
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").collect()
    per = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        sd = r["l_shipdate"]
        sd_d = sd.date() if hasattr(sd, "date") else sd
        st = per[r["l_partkey"]]
        if sd_d < pivot:
            st[0] += int(r["l_quantity"])
            st[1] += round(r["l_extendedprice"] * 100)
        else:
            st[2] += int(r["l_quantity"])
            st[3] += round(r["l_extendedprice"] * 100)
    want = dict.fromkeys(
        ("rev1", "rev2", "new", "lost", "pe", "ve", "ce"), 0
    )
    n_common = 0
    for q1, r1, q2, r2 in per.values():
        if q1 and q2:
            n_common += 1
            want["rev1"] += r1
            want["rev2"] += r2
            p1, p2 = r1 / q1, r2 / q2
            want["pe"] += round(1000 * q1 * (p2 - p1))
            want["ve"] += round(1000 * (q2 - q1) * p1)
            want["ce"] += round(1000 * (q2 - q1) * (p2 - p1))
        elif q2:
            want["new"] += r2
        elif q1:
            want["lost"] += r1
    row = q272(spark, SF001).collect()
    assert len(row) == 1
    got = row[0]
    assert got["rev1_common"] == want["rev1"]
    assert got["rev2_common"] == want["rev2"]
    assert got["rev_new"] == want["new"]
    assert got["rev_lost"] == want["lost"]
    assert got["price_effect_milli"] == want["pe"]
    assert got["volume_effect_milli"] == want["ve"]
    assert got["cross_effect_milli"] == want["ce"]
    bridge = (
        got["price_effect_milli"]
        + got["volume_effect_milli"]
        + got["cross_effect_milli"]
    )
    true_delta = 1000 * (want["rev2"] - want["rev1"])
    assert abs(bridge - true_delta) <= n_common  # per-part rounding slack
