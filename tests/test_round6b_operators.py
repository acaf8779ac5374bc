"""Unit tests for the round-6 second wave: BM25 keyword scoring
(q132), reciprocal-rank fusion (q133), and sorted-neighborhood
candidate pairs (q134). The oracle harness proves cross-engine value
parity; these pin semantics on controlled inputs — hand-computed
BM25 scores, RRF tie handling, window/block boundaries."""

import math

import pyspark.sql.functions as F

from nessus_client_etl_scripts_spark.operators.dedup import (
    sorted_neighborhood_pairs,
)
from nessus_client_etl_scripts_spark.operators.ranking import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)


# ---------------------------------------------------------------------------
# bm25_scores / bm25_topk
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Independent float-space BM25 (raw RSJ odds-ratio idf)."""
    toks = [t.lower().split() for t in texts]
    n = len(toks)
    avgdl = sum(len(d) for d in toks) / n
    df = {
        t: sum(1 for d in toks if t in d) for t in terms
    }
    out = {}
    for i, d in enumerate(toks):
        micro = 0
        hit = 0
        for t in terms:
            tf = d.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hit += 1
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            micro += round(c * 1e6)
        if hit:
            out[i] = (hit, micro)
    return out


def test_bm25_matches_reference(spark):
    texts = [
        "spark shuffle join hash join",
        "hash table scan",
        "sort merge join strategy",
        "unrelated words only here",
    ]
    terms = ("join", "hash", "scan")
    got = {
        r["doc_id"]: (r["n_terms"], r["score_micro"])
        for r in bm25_scores(_docs(spark, texts), terms).collect()
    }
    assert got == _bm25_reference(texts, terms)


def test_bm25_term_absent_everywhere(spark):
    # a term with df=0 must simply contribute nothing, not poison idf
    texts = ["a b c", "b c d"]
    got = {
        r["doc_id"]: r["n_terms"]
        for r in bm25_scores(_docs(spark, texts), ("b", "zzz")).collect()
    }
    assert got == {0: 1, 1: 1}


def test_bm25_topk_rank_dense_and_cut(spark):
    texts = ["q q q", "q q", "q", "x"]
    top = bm25_topk(_docs(spark, texts), ("q",), k=2).collect()
    assert [r["doc_id"] for r in top] == [0, 1]
    assert [r["rank"] for r in top] == [1, 2]
    # higher tf (same dl trend) must not rank below lower tf here:
    assert top[0]["score_micro"] >= top[1]["score_micro"]


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------

def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def test_rrf_scores_and_order(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (1, 2), (4, 3)])
    got = rrf_fuse(a, b, top=10).collect()
    by_id = {r["doc_id"]: r for r in got}
    # only ids present in BOTH rankings fuse
    assert set(by_id) == {1, 3}
    assert math.isclose(by_id[1]["rrf_score"], 1 / 61 + 1 / 62)
    assert math.isclose(by_id[3]["rrf_score"], 1 / 63 + 1 / 61)
    # doc 1: 1/61+1/62 > doc 3: 1/63+1/61 → doc 1 first
    assert [r["doc_id"] for r in got] == [1, 3]
    assert [r["fused_rank"] for r in got] == [1, 2]


def test_rrf_tie_breaks_by_id(spark):
    a = _ranked(spark, [(7, 1), (5, 2)])
    b = _ranked(spark, [(7, 2), (5, 1)])
    got = rrf_fuse(a, b, top=10).collect()
    # identical scores → lower doc_id first
    assert [r["doc_id"] for r in got] == [5, 7]
    assert got[0]["rrf_score"] == got[1]["rrf_score"]


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs
# ---------------------------------------------------------------------------

def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_snm_window_bounds_pairs(spark):
    # 4 docs, one block, window=2 → each doc pairs only with its
    # immediate successor in (norm, doc_id) order: exactly 3 pairs
    rows = [
        (1, "aa bb cc dd", "en"),
        (2, "aa bb cc ee", "en"),
        (3, "zz yy xx ww", "en"),
        (4, "zz yy xx vv", "en"),
    ]
    got = sorted_neighborhood_pairs(
        _corpus(spark, rows), window=2
    ).collect()
    assert len(got) == 3
    assert all(r["dist"] == 1 for r in got)
    # sort order is the normalized text: 1<2<4<3 alphabetically ("zz
    # yy xx vv" < "zz yy xx ww"), so near-dups land adjacent
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert pairs == {(1, 2), (2, 4), (4, 3)}


def test_snm_blocks_do_not_mix(spark):
    rows = [
        (1, "same words here now", "en"),
        (2, "same words here now", "fr"),
    ]
    got = sorted_neighborhood_pairs(_corpus(spark, rows), window=5).collect()
    assert got == []


def test_snm_jaccard_values(spark):
    # identical docs adjacent in sort order → jaccard exactly 1.0
    rows = [
        (1, "one two three four five", "en"),
        (2, "one two three four five", "en"),
        (3, "totally different tokens apart entirely", "en"),
    ]
    got = sorted_neighborhood_pairs(
        _corpus(spark, rows), window=2
    ).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in got}
    dup = by_pair[(1, 2)]
    assert dup["jaccard"] == 1.0
    assert dup["inter"] == 3  # 5 tokens → 3 distinct 3-shingles
    other = [r for p, r in by_pair.items() if p != (1, 2)]
    assert all(r["jaccard"] == 0.0 for r in other)
