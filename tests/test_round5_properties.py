"""Property tests for the round-5 operators, each differenced against
a driver-side Python reference on hypothesis-generated inputs:
intra-document segment dedup (q97), Bloom membership's no-false-
negative guarantee (q98), SCD2 gaps-and-islands intervals (q99), and
SimHash hamming pairs vs brute-force popcount (q103)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORD = st.sampled_from(["a", "b", "c", "dd", "ee"])


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(_WORD, min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_segment_dedup_matches_python_reference(spark, docs):
    from nessus_client_etl_scripts_spark.operators.text import (
        first_occurrence_filter,
        token_segments,
    )

    seg = 3
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.select("doc_id", F.split("text", " ").alias("toks"))
    out = staged.select(
        "doc_id", token_segments(F.col("toks"), seg).alias("segs")
    ).select(
        "doc_id",
        "segs",
        first_occurrence_filter(F.col("segs")).alias("keep"),
    )
    got = {r.doc_id: (list(r.segs), list(r.keep)) for r in out.collect()}
    for i, words in enumerate(docs):
        toks = " ".join(words).split(" ")  # mirrors split(): [''] for ""
        segs = [
            " ".join(toks[j : j + seg]) for j in range(0, len(toks), seg)
        ]
        keep, seen = [], set()
        for s in segs:
            if s not in seen:
                seen.add(s)
                keep.append(s)
        assert got[i] == (segs, keep), (i, got[i], segs, keep)


@settings(**_SET)
@given(
    corpus=st.lists(st.text("xyz", min_size=1, max_size=4), max_size=20),
    probes=st.lists(
        st.text("xyz", min_size=1, max_size=4), min_size=1, max_size=10
    ),
)
def test_bloom_membership_never_false_negative(spark, corpus, probes):
    """Every probe whose fingerprint IS in the corpus must come back
    maybe_member=True (Bloom's one-sided error), at any filter width —
    including a tiny m where false POSITIVES are common."""
    from nessus_client_etl_scripts_spark.operators.dedup import (
        bloom_membership,
    )

    c = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)], "doc_id long, fp string"
    )
    p = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probes)], "doc_id long, fp string"
    )
    got = {
        r.doc_id: r.maybe_member
        for r in bloom_membership(c, p, m=32, k=3).collect()
    }
    members = set(corpus)
    for i, v in enumerate(probes):
        assert i in got
        if v in members:
            assert got[i] is True, (v, "member reported absent")


@settings(**_SET)
@given(
    log=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=1, max_value=9),  # seq (unique w/ idx)
            st.sampled_from(["A", "B"]),  # value
        ),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_islands_match_python_rle(spark, log):
    """Gaps-and-islands intervals equal a per-key run-length encoding
    of the change log; valid_to chains to the next interval's
    valid_from; n_orders per interval sums to the log size."""
    rows = [(k, s * 100 + i, v) for i, (k, s, v) in enumerate(log)]
    df = spark.createDataFrame(rows, "k long, seq long, v string")
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("seq")
    prev = F.lag("v").over(w)
    flagged = df.withColumn(
        "_chg",
        F.when(prev.isNull() | (prev != F.col("v")), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    grouped = (
        islands.groupBy("k", "v", "island")
        .agg(F.min("seq").alias("valid_from"), F.count(F.lit(1)).alias("n"))
    )
    w2 = Window.partitionBy("k").orderBy("island")
    out = grouped.select(
        "k",
        "v",
        "island",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n",
    )
    got = sorted(
        (r.k, r.island, r.v, r.valid_from, r.valid_to, r.n)
        for r in out.collect()
    )
    # Python reference: run-length encode per key in seq order
    want = []
    bykey: dict[int, list[tuple[int, str]]] = {}
    for k, seq, v in rows:
        bykey.setdefault(k, []).append((seq, v))
    for k, items in bykey.items():
        items.sort()
        runs = []  # (value, first_seq, count)
        for seq, v in items:
            if runs and runs[-1][0] == v:
                runs[-1][2] += 1
            else:
                runs.append([v, seq, 1])
        for i, (v, first, cnt) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((k, i + 1, v, first, nxt, cnt))
    assert got == sorted(want)


@settings(**_SET)
@given(
    hashes=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=20,
        unique=True,
    )
)
def test_hamming_pairs_match_bruteforce(spark, hashes):
    """simhash_hamming_pairs returns EXACTLY the brute-force pair set
    within the radius — pigeonhole completeness (threshold < n_blocks
    guarantees a shared block) plus exact verify correctness, for
    arbitrary 64-bit hashes including sign-bit patterns."""
    from nessus_client_etl_scripts_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    sims = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, simhash long"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(sims, threshold=3).collect()
    }
    want = {}
    for i, a in enumerate(hashes):
        for j in range(i + 1, len(hashes)):
            d = bin((a ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want


def test_count_min_absent_query_estimates_zero(spark):
    """A queried item none of whose cells any occurrence hashed to
    must come back with estimate 0 (and must not vanish) — the
    left-join + coalesce contract. Width is large so the absent
    item's cells are almost surely all empty; the assertion also
    accepts a collision-inflated upper bound but NEVER a missing row."""
    from nessus_client_etl_scripts_spark.operators.sketches import (
        count_min_estimates,
    )

    items = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, ["v"])
    queries = spark.createDataFrame([("a",), ("b",), ("absent",)], ["v"])
    est = {
        r["v"]: r["cm_estimate"]
        for r in count_min_estimates(
            items, "v", queries, depth=4, width=1 << 20
        ).collect()
    }
    assert set(est) == {"a", "b", "absent"}
    assert est["a"] == 5 and est["b"] == 3
    assert est["absent"] == 0


def test_token_segments_empty_array_yields_empty(spark):
    import pyspark.sql.functions as F

    from nessus_client_etl_scripts_spark.operators.text import (
        token_segments,
    )

    df = spark.createDataFrame(
        [(1, ["x", "y", "z"]), (2, [])], "id long, toks array<string>"
    )
    got = {
        r.id: list(r.segs)
        for r in df.select(
            "id", token_segments(F.col("toks"), 2).alias("segs")
        ).collect()
    }
    assert got == {1: ["x y", "z"], 2: []}


def test_hamming_pairs_rejects_oversized_block_count(spark):
    import pytest

    from nessus_client_etl_scripts_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    sims = spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        simhash_hamming_pairs(sims, threshold=4, n_blocks=5)
