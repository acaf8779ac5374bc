"""Property-based normalization checks (SURVEY.md §5.4): for ARBITRARY
nested scan-run documents — not just the fixture corpus — the explode
chain preserves every nesting level's cardinality, surrogate FKs stay
structurally intact, and the A1 severity pivot equals a Python
recomputation of the reference's ``calculate_severities`` semantics
(/root/reference/export.py:60-65) in both faithful (severity-0 dropped
by falsiness) and corrected modes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nessus_client_etl_scripts_spark.pipeline import normalize
from nessus_client_etl_scripts_spark.sources.nessus_schemas import (
    SCAN_RUN_DOC_SCHEMA,
)


def _plugin(pid: int, sev: int) -> dict:
    return {
        "plugin_id": pid,
        "severity": sev,
        "name": f"p{pid}",
        "family": "f",
        "pluginattributes": {
            "see_also": None,
            "synopsis": None,
            "description": None,
            "solution": None,
            "plugin_publication_date": None,
            "plugin_modification_date": None,
            "risk_information": {
                "cvss_base_score": None,
                "cvss3_base_score": None,
                "cvss_vector": None,
                "cvss3_vector": None,
            },
        },
        "ref": None,
    }


@st.composite
def scan_run_docs(draw):
    docs = []
    n_docs = draw(st.integers(1, 3))
    for d in range(n_docs):
        scan_id, history_id = d, 1000 + d
        targets = []
        for h in range(draw(st.integers(0, 3))):
            host_id = 100 * d + h
            vulns = []
            for j in range(draw(st.integers(0, 4))):
                sev = draw(st.integers(0, 4))
                cnt = draw(st.integers(1, 5))
                pid = draw(st.integers(1, 6))
                n_out = draw(st.integers(0, 2))
                vulns.append(
                    {
                        "plugin": _plugin(pid, sev),
                        "host_vuln": {
                            "nessus_host_id": host_id,
                            "scan_run_id": history_id,
                            "plugin_id": pid,
                        },
                        "outputs": [
                            {"port": str(22 + k), "output": f"o{k}"}
                            for k in range(n_out)
                        ],
                        "severity": sev,
                        "count": cnt,
                    }
                )
            targets.append(
                {
                    "host_id": host_id,
                    "history_id": history_id,
                    "scan_id": scan_id,
                    "host_ip": f"10.0.0.{h}",
                    "host_fqdn": None,
                    "host_start": None,
                    "host_end": None,
                    "os": None,
                    "critical_count": 0,
                    "high_count": 0,
                    "medium_count": 0,
                    "low_count": 0,
                    "info_count": 0,
                    "vulnerabilities": vulns,
                }
            )
        docs.append(
            {
                "history_id": history_id,
                "scan_id": scan_id,
                "scanner_start": 1700000000,
                "scanner_end": 1700003600,
                "host_count": len(targets),
                "critical_count": 0,
                "high_count": 0,
                "medium_count": 0,
                "low_count": 0,
                "info_count": 0,
                "targets": targets,
            }
        )
    return docs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=scan_run_docs())
def test_normalize_preserves_cardinalities_and_fks(spark, docs):
    df = spark.createDataFrame(docs, SCAN_RUN_DOC_SCHEMA)
    tables = normalize.normalize_scan_runs(df, id_mode="hash")

    n_targets = sum(len(d["targets"]) for d in docs)
    n_vulns = sum(
        len(t["vulnerabilities"]) for d in docs for t in d["targets"]
    )
    n_outputs = sum(
        len(v["outputs"])
        for d in docs
        for t in d["targets"]
        for v in t["vulnerabilities"]
    )
    assert tables["scan_run"].count() == len(docs)
    assert tables["host"].count() == n_targets
    assert tables["host_vuln"].count() == n_vulns
    assert tables["vuln_output"].count() == n_outputs

    # plugin is deduplicated on plugin_id
    pids = {
        v["plugin"]["plugin_id"]
        for d in docs
        for t in d["targets"]
        for v in t["vulnerabilities"]
    }
    plugin_rows = tables["plugin"].collect()
    assert len(plugin_rows) == len(pids)
    assert {r["plugin_id"] for r in plugin_rows} == pids

    # structural FK integrity: every child key exists in its parent
    hv = tables["host_vuln"].collect()
    host_keys = {
        (r["scan_run_id"], r["nessus_host_id"])
        for r in tables["host"].collect()
    }
    assert all(
        (r["scan_run_id"], r["nessus_host_id"]) in host_keys for r in hv
    )
    hv_ids = {r["host_vuln_id"] for r in hv}
    assert all(
        r["host_vuln_id"] in hv_ids
        for r in tables["vuln_output"].collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=scan_run_docs())
def test_severity_pivot_matches_python_recompute(spark, docs):
    df = spark.createDataFrame(docs, SCAN_RUN_DOC_SCHEMA)
    names = {
        4: "critical_count",
        3: "high_count",
        2: "medium_count",
        1: "low_count",
        0: "info_count",
    }
    for faithful in (True, False):
        got = {
            r["scan_run_id"]: {n: r[n] for n in names.values()}
            for r in normalize.severity_rollup(
                df, level="run", faithful=faithful
            ).collect()
        }
        want: dict = {}
        for d in docs:
            acc = {n: 0 for n in names.values()}
            for t in d["targets"]:
                for v in t["vulnerabilities"]:
                    # reference semantics (export.py:60-65): falsiness
                    # guard drops severity 0 in faithful mode
                    if v["severity"] or not faithful:
                        acc[names[v["severity"]]] += v["count"]
            want[d["history_id"]] = acc
        assert got == want

        # host level: zero-vuln hosts still get a zero-counter row
        # (export.py:170), hostless runs contribute nothing
        got_h = {
            (r["scan_run_id"], r["nessus_host_id"]): {
                n: r[n] for n in names.values()
            }
            for r in normalize.severity_rollup(
                df, level="host", faithful=faithful
            ).collect()
        }
        want_h: dict = {}
        for d in docs:
            for t in d["targets"]:
                acc = {n: 0 for n in names.values()}
                for v in t["vulnerabilities"]:
                    if v["severity"] or not faithful:
                        acc[names[v["severity"]]] += v["count"]
                want_h[(d["history_id"], t["host_id"])] = acc
        assert got_h == want_h
