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
from nessus_client_etl_scripts_spark.operators.graph import (
    triangle_counts,
)
from nessus_client_etl_scripts_spark.operators.lm import pmi_pairs
from nessus_client_etl_scripts_spark.operators.temporal import (
    gap_fill_interpolate,
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


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_simple(spark):
    # triangle 1-2-3 plus a dangling edge 3-4
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_orientation_and_dupes(spark):
    # reversed/duplicate edges must canonicalize; K4 has C(4,3)=4
    # triangles, each vertex participating in 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, k4 + k4)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_self_loops_dropped(spark):
    got = triangle_counts(_edges(spark, [(1, 1), (1, 2), (2, 2)])).collect()
    assert got == []


# ---------------------------------------------------------------------------
# pmi_pairs
# ---------------------------------------------------------------------------

def test_pmi_lift_values(spark):
    # a,b always together (lift = N/(n_a*n_b) * n_ab); c independent
    texts = ["a b", "a b", "a b c", "c d"]
    df = _docs(spark, texts)
    got = {
        (r["tok_a"], r["tok_b"]): r
        for r in pmi_pairs(df, vocab_size=3).collect()
    }
    # vocab by df: a=3, b=3, c=2 (d excluded at size 3)
    ab = got[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (3, 3, 3)
    assert ab["lift"] == (3 * 4) / (3 * 3)
    bc = got[("b", "c")]
    assert (bc["n_ab"], bc["lift"]) == (1, (1 * 4) / (3 * 2))


def test_pmi_pairs_ordered_and_bounded(spark):
    texts = ["x y z w", "x y z w", "x y"]
    got = pmi_pairs(_docs(spark, texts), vocab_size=2).collect()
    # only vocab pairs appear, and always in (a < b) order
    assert all(r["tok_a"] < r["tok_b"] for r in got)
    assert len(got) <= 1


# ---------------------------------------------------------------------------
# gap_fill_interpolate
# ---------------------------------------------------------------------------

def test_gap_fill_linear_midpoints(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 10.0),
        (1, dt.datetime(2024, 1, 1, 3, 15), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = sorted(
        gap_fill_interpolate(df, ["user_id"], "ts", "value").collect(),
        key=lambda r: r["bucket_epoch"],
    )
    # hours 0,1,2,3 → 1000 cents observed, two interpolated, 4000 observed
    assert [r["value_cents"] for r in got] == [1000, 2000, 3000, 4000]
    assert [r["observed"] for r in got] == [True, False, False, True]
    assert [r["n_obs"] for r in got] == [1, 0, 0, 1]


def test_gap_fill_aggregates_within_bucket(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), 1.25),
        (1, dt.datetime(2024, 1, 1, 0, 50), 2.25),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = gap_fill_interpolate(df, ["user_id"], "ts", "value").collect()
    assert len(got) == 1
    assert got[0]["value_cents"] == 350
    assert got[0]["n_obs"] == 2 and got[0]["observed"]


def test_gap_fill_no_cross_group_fill(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (2, dt.datetime(2024, 1, 1, 5, 0), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = gap_fill_interpolate(df, ["user_id"], "ts", "value").collect()
    # each group has a single observation → exactly one row each
    assert sorted((r["user_id"], r["observed"]) for r in got) == [
        (1, True),
        (2, True),
    ]
