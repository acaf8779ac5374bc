"""Property tests for the round-7 operators on hypothesis-generated
corpora: BPE train/encode vs the greedy Python reference (including
the encode-reproduces-trainer-state identity), aligned duplicate runs
vs the brute token-DP longest-common-substring, and winnowing's
selection guarantee on random token streams."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet → dense bigram collisions and repeated substrings
_WORD = st.sampled_from(["a", "b", "c", "ab", "x"])


def _greedy_merge(toks: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(f"{a}~{b}")
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(_WORD, min_size=1, max_size=12), min_size=1, max_size=6
    )
)
def test_bpe_train_property(spark, docs):
    from collections import Counter

    from nessus_client_etl_scripts_spark.operators.lm import bpe_train

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["merged_pair"], r["pair_count"],
         r["n_merges"], r["n_tokens_after"])
        for r in bpe_train(df, n_merges=3).orderBy("merge_rank").collect()
    ]
    state = [list(ws) for ws in docs]
    expect = []
    for r in range(1, 4):
        counts: Counter = Counter()
        for toks in state:
            for x, y in zip(toks, toks[1:]):
                counts[f"{x} {y}"] += 1
        if not counts:
            break
        pair, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        before = sum(len(t) for t in state)
        a, b = pair.split(" ")
        state = [_greedy_merge(t, a, b) for t in state]
        after = sum(len(t) for t in state)
        expect.append((r, pair, c, before - after, after))
    assert got == expect


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(_WORD, min_size=1, max_size=12), min_size=1, max_size=6
    )
)
def test_bpe_encode_reproduces_trainer_state(spark, docs):
    """encode(corpus, trained merges) must land on exactly the token
    counts the trainer's own final state has — the train/encode
    consistency identity."""
    from nessus_client_etl_scripts_spark.operators.lm import (
        bpe_encode,
        bpe_train,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    table = bpe_train(df, n_merges=3).orderBy("merge_rank").collect()
    merges = [r["merged_pair"] for r in table]
    enc = bpe_encode(df, merges).collect()
    if table:
        assert sum(r["n_tokens_bpe"] for r in enc) == (
            table[-1]["n_tokens_after"]
        )
    for r in enc:
        assert r["n_tokens_bpe"] + r["n_saved"] == r["n_tokens_raw"]
        assert 1 <= r["n_tokens_bpe"] <= r["n_tokens_raw"]


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(_WORD, min_size=2, max_size=14), min_size=2, max_size=5
    ),
    w=st.integers(min_value=2, max_value=3),
)
def test_aligned_runs_property(spark, docs, w):
    """max_dup_tokens == brute DP longest common substring (length ≥ w)
    for every pair, on arbitrary corpora with a tiny alphabet."""
    from nessus_client_etl_scripts_spark.operators.dedup import (
        aligned_duplicate_runs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["max_dup_tokens"]
        for r in aligned_duplicate_runs(df, w=w, max_freq=10**9).collect()
    }
    expect = {}
    for da in range(len(docs)):
        for db in range(da, len(docs)):
            s, t = docs[da], docs[db]
            best = 0
            prev = [0] * (len(t) + 1)
            for i in range(1, len(s) + 1):
                cur = [0] * (len(t) + 1)
                for j in range(1, len(t) + 1):
                    if s[i - 1] == t[j - 1] and not (da == db and i == j):
                        cur[j] = prev[j - 1] + 1
                        best = max(best, cur[j])
                prev = cur
            if best >= w:
                expect[(da, db)] = best
    assert got == expect


@settings(**_SET)
@given(
    toks=st.lists(_WORD, min_size=8, max_size=30),
    shift=st.integers(min_value=0, max_value=4),
)
def test_winnowing_guarantee_property(spark, toks, shift):
    """Any two documents sharing an 8-token span share at least one
    winnowing fingerprint (k=5, w=4 → guarantee length 8), regardless
    of what surrounds the span — checked via the same row-local
    expression q209 uses."""
    from pyspark.sql import functions as F

    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        tokens,
    )

    k, win = 5, 4
    span = toks[:8]
    d0 = " ".join(["p"] * shift + span + ["q", "r"])
    d1 = " ".join(["m", "n", "o"] + span + ["s"] * shift)
    df = spark.createDataFrame(
        [(0, d0), (1, d1)], "doc_id long, text string"
    )
    staged = df.select(
        "doc_id", tokens(normalize_text("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    hashed = staged.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.col("n") - F.lit(k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, k))),
        ).alias("hl"),
    )
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in hashed.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("hl") - F.lit(win - 1)
                    ),
                    lambda j: F.array_min(F.slice(F.col("hl"), j, win)),
                )
            ).alias("fp"),
        ).collect()
    }
    assert fps[0] & fps[1], "winnowing guarantee violated"


@settings(**_SET)
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_group_median_property(spark, vals):
    from nessus_client_etl_scripts_spark.operators.windows import (
        group_median,
    )

    df = spark.createDataFrame(
        [(("g"), float(v)) for v in vals], "g string, v double"
    )
    row = group_median(df, "g", "v").collect()[0]
    s = sorted(vals)
    n = len(s)
    lo, hi = (n + 1) // 2, (n + 2) // 2
    want = s[lo - 1] if lo == hi else (s[lo - 1] + s[hi - 1]) / 2
    assert row["n"] == n and row["median"] == want
