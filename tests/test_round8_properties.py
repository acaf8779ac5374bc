"""Property tests for the round-8 operators on hypothesis-generated
inputs: URL canonicalization idempotence + invariants, the registered-
domain suffix rule, per-domain budget invariants on random corpora,
and the mixture schedule's prefix-proportionality guarantee."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_LABEL = st.sampled_from(["site1", "cdn", "a2", "www", "x"])
_TLD = st.sampled_from(["com", "org", "co.uk", "net", "com.au"])
_PARAM = st.sampled_from(["a=1", "b=2", "utm_source=x", "c=", "utm_z=9"])


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http://", "https://", ""]))
    www = draw(st.sampled_from(["www.", ""]))
    host = draw(_LABEL) + "." + draw(_TLD)
    path = draw(st.sampled_from(["", "/", "/p/1", "/a/b"]))
    params = draw(st.lists(_PARAM, max_size=3))
    frag = draw(st.sampled_from(["", "#top"]))
    q = ("?" + "&".join(params)) if params else ""
    return scheme + www + host + path + q + frag


@settings(**_SET)
@given(st.lists(_urls(), min_size=1, max_size=8))
def test_canonicalize_url_idempotent_and_clean(spark, urls):
    import pyspark.sql.functions as F

    from nessus_client_etl_scripts_spark.operators.web import (
        canonicalize_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url("url").alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c1"]  # idempotent
        assert "://" not in r["c1"]
        assert "#" not in r["c1"]
        if r["c1"].startswith("www."):
            # a kept www. prefix means stripping would have left a
            # non-registrable host: dotless, or a bare public suffix
            import re as _re

            rest = _re.sub(r"^(www\.)+", "", r["c1"])
            rhost = _re.split(r"[/?]", rest)[0]
            assert "." not in rhost or rhost in {
                "co.uk",
                "com.au",
                "co.jp",
            }
        assert "utm" not in r["c1"]
        if "?" in r["c1"]:
            ps = r["c1"].split("?", 1)[1].split("&")
            assert ps == sorted(ps) and all(ps)


@settings(**_SET)
@given(st.lists(st.tuples(_LABEL, _TLD), min_size=1, max_size=8))
def test_registered_domain_suffix_rule(spark, hosts):
    from nessus_client_etl_scripts_spark.operators.web import (
        registered_domain,
    )

    df = spark.createDataFrame(
        [(f"{l}.{t}", t) for l, t in hosts], "host string, tld string"
    )
    for r in df.select(
        "host", "tld", registered_domain("host").alias("dom")
    ).collect():
        if r["tld"] in ("co.uk", "com.au"):
            # two-label suffix → keep three labels = the whole host here
            assert r["dom"] == r["host"]
        else:
            assert r["dom"] == ".".join(r["host"].split(".")[-2:])


@settings(**_SET)
@given(
    st.lists(
        st.tuples(st.sampled_from(["d1.com", "d2.org"]), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 3),
)
def test_domain_budget_invariants(spark, rows, cap):
    import pyspark.sql.functions as F

    from nessus_client_etl_scripts_spark.operators.web import domain_budget

    df = spark.createDataFrame(
        [(i, d, n) for i, (d, n) in enumerate(rows)],
        "doc_id long, domain string, n_chars long",
    )
    out = domain_budget(
        df, "domain", cap, (F.col("n_chars").desc(), F.col("doc_id").asc())
    ).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    for rs in by_dom.values():
        assert sorted(r["drank"] for r in rs) == list(range(1, len(rs) + 1))
        assert sum(r["kept"] for r in rs) == min(cap, len(rs))
        # keep-priority: every kept row sorts before every dropped row
        key = lambda r: (-r["n_chars"], r["doc_id"])  # noqa: E731
        kept = sorted(key(r) for r in rs if r["kept"])
        dropped = sorted(key(r) for r in rs if not r["kept"])
        assert not dropped or not kept or kept[-1] < dropped[0]


def test_q219_prefix_proportionality(spark):
    """In every prefix of the schedule, each source's count tracks its
    weight share within ±1 interleave slot — the smooth-interleave
    guarantee (virtual time (2m−1)/w): after any prefix ending at key
    K, source s has emitted m_s docs with |m_s − K·w_s/24| ≤ 1 while
    its supply lasts."""
    from nessus_client_etl_scripts_spark.plans.round8_queries import q219

    rows = sorted(
        q219(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["pos"],
    )
    weights = {r["source"]: r["w"] for r in rows}
    supply = {}
    for r in rows:
        supply[r["source"]] = max(supply.get(r["source"], 0), r["src_rank"])
    seen = dict.fromkeys(weights, 0)
    for r in rows:
        seen[r["source"]] += 1
        k = r["ikey"]
        for s, w in weights.items():
            if seen[s] < supply[s]:  # only while the source still emits
                expected = k * w / 24
                assert abs(seen[s] - expected) <= 1.0 + w / 12
