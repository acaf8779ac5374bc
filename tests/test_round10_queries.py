"""Round-10 wave tests (plans/round10_queries.py): Python twins and
operator-contract checks for the cross-encoder rerank (q332) and the
streaming sliding-log rate-limit audit (q333)."""

from __future__ import annotations

import math
from bisect import bisect_left, bisect_right
from collections import defaultdict

import pandas as pd

SF001 = "/root/testdata/sf0.001"


def _cos(a, b):
    return sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def _nano(x):
    # exact half-away via the fractional-part compare (floor(abs+0.5)
    # misrounds doubles one ulp below a half — the r11 hardening)
    a = abs(x) * 1_000_000_000
    f = math.floor(a)
    r = f + 1 if a - f >= 0.5 else f
    return int(r) if x >= 0 else -int(r)


def test_q332_rerank_twin(spark):
    """Brute-force two-stage replay with the same nano quantization:
    stage-1 top-N by cosine, stage-2 rerank by cosine(q∘q, d); every
    emitted row must carry both ranks exactly, and the rerank must
    actually REORDER at least one query's candidates (the interaction
    kernel is not a monotone transform of plain cosine)."""
    from nessus_client_etl_scripts_spark.plans.round10_queries import (
        _Q332_K,
        _Q332_NQ,
        _Q332_RETRIEVE,
        q332,
    )

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    }
    queries = {i: v for i, v in emb.items() if i < _Q332_NQ}
    corpus = {i: v for i, v in emb.items() if i >= _Q332_NQ}

    want = {}
    reordered = False
    for qid, qv in queries.items():
        s1 = sorted(
            ((_nano(_cos(qv, cv)), cid) for cid, cv in corpus.items()),
            key=lambda t: (-t[0], t[1]),
        )[:_Q332_RETRIEVE]
        tq = [x * x for x in qv]
        s2 = sorted(
            ((_nano(_cos(tq, corpus[cid])), cid, r1 + 1, sc1)
             for r1, (sc1, cid) in enumerate(s1)),
            key=lambda t: (-t[0], t[1]),
        )
        if [t[1] for t in s2[:_Q332_K]] != [t[1] for t in s1[:_Q332_K]]:
            reordered = True
        for r2, (sc2, cid, r1, sc1) in enumerate(s2[:_Q332_K], 1):
            want[(qid, cid)] = (r1, sc1, r2, sc2)

    got = q332(spark, SF001).collect()
    assert len(got) == len(want) == _Q332_NQ * _Q332_K
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key in want
        r1, sc1, r2, sc2 = want[key]
        assert (r["retr_rank"], r["retr_score_nano"]) == (r1, sc1)
        assert (r["ce_rank"], r["ce_score_nano"]) == (r2, sc2)
    assert reordered, "interaction kernel never changed the order"


def test_q332_stage2_is_bounded_broadcast(spark):
    """The expensive scorer must touch only broadcast-joined bounded
    candidates: the physical plan carries broadcast exchanges and no
    cartesian product of the corpus with itself."""
    from nessus_client_etl_scripts_spark.plans.round10_queries import q332

    plan = q332(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rate_update_order_insensitive():
    """The per-key state fold must yield the same final emission for
    any batching/arrival order of the same event multiset (the q83
    dominance contract) — exercised WITHOUT Spark via the raw
    update fn."""
    from nessus_client_etl_scripts_spark.streaming.stateful import (
        _make_rate_update,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    secs = [100, 100, 250, 1000, 40000, 40001, 90000]
    fn = _make_rate_update(window_s=43200, limit=2)

    def run(batches):
        st = FakeState()
        out = None
        for b in batches:
            out = list(fn((7,), iter([pd.DataFrame({"sec": b})]), st))[-1]
        return out.iloc[0].to_dict()

    a = run([secs])
    b = run([secs[4:], secs[:4]])  # out of order across batches
    c = run([[s] for s in secs[::-1]])  # one event per batch, reversed
    assert a == b == c
    # brute-force twin with RANGE peer semantics
    ss = sorted(secs)
    iw = [
        bisect_right(ss, t) - bisect_left(ss, t - 43199)
        for t in ss
    ]
    assert a["n_events"] == len(secs)
    assert a["max_rate"] == max(iw)
    assert a["n_rejected"] == sum(1 for x in iw if x > 2)


def test_q333_matches_batch_window_replay(spark):
    """End-to-end streaming run vs a Python batch replay of the
    sliding RANGE window on the same parquet: per-user n_events,
    peak rate and rejection count must agree exactly."""
    from nessus_client_etl_scripts_spark.plans.round10_queries import (
        _Q333_LIMIT,
        _Q333_WINDOW_S,
        q333,
    )

    ev = spark.read.parquet(f"{SF001}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in ev:
        ts = r["ts"]
        sec = (
            ts // 1_000_000_000
            if isinstance(ts, int)
            else int(ts.timestamp())
        )
        per_user[r["user_id"]].append(sec)
    want = {}
    for u, secs in per_user.items():
        ss = sorted(secs)
        iw = [
            bisect_right(ss, t) - bisect_left(ss, t - (_Q333_WINDOW_S - 1))
            for t in ss
        ]
        want[u] = (len(ss), max(iw), sum(1 for x in iw if x > _Q333_LIMIT))

    got = {r["user_id"]: r for r in q333(spark, SF001).collect()}
    assert set(got) == set(want)
    for u, (n, mx, rej) in want.items():
        assert (
            got[u]["n_events"],
            got[u]["max_rate"],
            got[u]["n_rejected"],
        ) == (n, mx, rej)


def test_rate_update_property_random_multisets():
    """Hypothesis-style sweep without Spark: random event-second
    multisets and random batch partitions must all agree with the
    brute-force RANGE-peer replay."""
    import random

    from nessus_client_etl_scripts_spark.streaming.stateful import (
        _make_rate_update,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    rng = random.Random(0xC0FFEE)
    for trial in range(25):
        w = rng.choice([10, 100, 3600])
        lim = rng.randint(1, 5)
        n = rng.randint(1, 60)
        secs = [rng.randint(0, 5000) for _ in range(n)]
        fn = _make_rate_update(window_s=w, limit=lim)
        # random batch split, random order
        shuffled = secs[:]
        rng.shuffle(shuffled)
        batches, i = [], 0
        while i < len(shuffled):
            j = i + rng.randint(1, 7)
            batches.append(shuffled[i:j])
            i = j
        st_ = FakeState()
        out = None
        for b in batches:
            out = list(fn((1,), iter([pd.DataFrame({"sec": b})]), st_))[-1]
        got = out.iloc[0]
        ss = sorted(secs)
        iw = [
            bisect_right(ss, t) - bisect_left(ss, t - (w - 1)) for t in ss
        ]
        assert got["n_events"] == n
        assert got["max_rate"] == max(iw)
        assert got["n_rejected"] == sum(1 for x in iw if x > lim)


def test_q332_stage1_pushes_topk_groupwise(spark):
    """Stage-1's per-query rank must ship only triples and push the
    top-N partially map-side (WindowGroupLimit below the exchange) —
    the shape that keeps the corpus un-shuffled at 100 TB."""
    from nessus_client_etl_scripts_spark.plans.round10_queries import q332

    plan = q332(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_bpe_trainer_deterministic_and_uncached(spark):
    """The shared trainer must return identical rows on repeat calls
    (the determinism q201/q206/q217 rely on to agree) WITHOUT any
    module-level result memo — per-call training is the round-13
    no-result-caching posture (the r12 gaming audit)."""
    from nessus_client_etl_scripts_spark.plans import round7_queries as r7

    assert not hasattr(r7, "_BPE_MEMO")  # the memo must stay retired
    a = r7.shared_bpe_merge_rows(spark, SF001)
    b = r7.shared_bpe_merge_rows(spark, SF001)
    assert a is not b  # fresh rows per call — no shared cache object
    assert [r["merged_pair"] for r in a] == [r["merged_pair"] for r in b]
    assert a == b


def test_q299_lcg_hash_is_engine_portable(spark):
    """The q299 sample hash must evaluate bit-identically in Spark and
    DuckDB for arbitrary BIGINT vec_ids — the property the sampled
    branch's cross-engine compare stands on (r9 ADVICE: the previous
    xxhash64 sample was Spark-only)."""
    import random

    import duckdb

    from nessus_client_etl_scripts_spark.plans.round8b_queries import (
        _Q299_HASH,
    )

    rng = random.Random(299)
    ids = [rng.randint(0, 2**62) for _ in range(500)] + list(range(8))
    got_spark = {
        r["vec_id"]: r["h"]
        for r in spark.createDataFrame([(i,) for i in ids], "vec_id long")
        .selectExpr("vec_id", f"{_Q299_HASH} AS h")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    got_duck = dict(
        con.execute(f"SELECT vec_id, {_Q299_HASH} FROM t").fetchall()
    )
    assert got_spark == got_duck
    # and the hash actually spreads (sample selection isn't degenerate)
    assert len(set(got_spark.values())) > 450
