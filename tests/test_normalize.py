"""Phase-2 normalization tests — bronze nested documents → 7 silver
tables (SURVEY.md §5 items 2-4: unit + end-to-end + property checks)."""

import pyspark.sql.functions as F

from nessus_client_etl_scripts_spark.pipeline import fixtures
from nessus_client_etl_scripts_spark.pipeline.normalize import severity_rollup

N_SCANS = fixtures.N_FOLDERS * fixtures.SCANS_PER_FOLDER
N_RUNS = N_SCANS * fixtures.RUNS_PER_SCAN


def test_table_cardinalities(silver):
    assert silver["folder"].count() == fixtures.N_FOLDERS
    assert silver["scan"].count() == N_SCANS
    assert silver["scan_run"].count() == N_RUNS
    assert silver["host"].count() == N_RUNS * fixtures.HOSTS_PER_RUN
    # plugin deduped to the closed id space
    plugin_ids = {r.plugin_id for r in silver["plugin"].select("plugin_id").collect()}
    assert plugin_ids == set(range(1, fixtures.N_PLUGINS + 1))


def test_referential_closure(silver):
    """FK conventions hold along folder←scan←scan_run←host←host_vuln→plugin,
    host_vuln←vuln_output (schema.sql FKs as join-key invariants)."""
    def orphans(child, key, parent):
        return child.join(parent, key, "left_anti").count()

    assert orphans(silver["scan"], "folder_id", silver["folder"]) == 0
    assert orphans(silver["scan_run"], "scan_id", silver["scan"]) == 0
    assert orphans(silver["host"], "scan_run_id", silver["scan_run"]) == 0
    assert orphans(silver["host_vuln"], "plugin_id", silver["plugin"]) == 0
    assert orphans(silver["vuln_output"], "host_vuln_id", silver["host_vuln"]) == 0
    assert (
        orphans(
            silver["host_vuln"],
            ["nessus_host_id", "scan_run_id"],
            silver["host"],
        )
        == 0
    )


def test_surrogate_ids_unique(silver):
    for name, key in [
        ("host", "host_id"),
        ("host_vuln", "host_vuln_id"),
        ("vuln_output", "vuln_output_id"),
    ]:
        t = silver[name]
        assert t.count() == t.select(key).distinct().count(), name


def test_vuln_output_counts_match_documents(spark):
    """Property check (SURVEY.md §5.4): the explode chain preserves the
    total number of outputs declared in the nested documents."""
    docs = fixtures.scan_run_docs(spark)
    expected = docs.select(
        F.explode("targets").alias("t")
    ).select(F.explode("t.vulnerabilities").alias("v")).select(
        F.sum(F.size("v.outputs")).alias("n")
    ).collect()[0].n
    from nessus_client_etl_scripts_spark.pipeline.normalize import normalize_scan_runs

    tables = normalize_scan_runs(docs)
    assert tables["vuln_output"].count() == expected


def test_plugin_ref_is_joined_see_also(silver):
    """F1 — ref = '\\n'.join(see_also) with None passthrough
    (format_plugin, export.py:136-142)."""
    rows = {r.plugin_id: r.ref for r in silver["plugin"].select("plugin_id", "ref").collect()}
    assert rows[4] is None  # every 4th plugin has see_also=None
    assert rows[1] == "https://ex/1\nhttps://ex/1/b"


def test_scan_run_projection(silver):
    r = (
        silver["scan_run"]
        .filter(F.col("scan_run_id") == 1001)  # scan 1, run 1
        .collect()[0]
    )
    assert r.scan_id == 1
    assert r.scan_start == fixtures.run_start(1, 1)
    assert r.scan_end == r.scan_start + 3600
    assert r.host_count == fixtures.HOSTS_PER_RUN


def test_severity_rollup_faithful_excludes_zero(spark):
    """A1 faithful mode reproduces the reference's severity-0 falsiness
    exclusion (export.py:60-65): recomputed info_count is always 0 and
    every other counter matches the document's enrichment fields."""
    docs = fixtures.scan_run_docs(spark)
    recomputed = severity_rollup(docs, level="host", faithful=True)
    declared = docs.select(F.explode("targets").alias("t")).select(
        F.col("t.history_id").alias("scan_run_id"),
        F.col("t.host_id").alias("nessus_host_id"),
        *[F.col(f"t.{c}").alias(f"decl_{c}") for c in
          ("critical_count", "high_count", "medium_count", "low_count", "info_count")],
    ).filter(F.size("t.vulnerabilities") > 0)
    joined = declared.join(recomputed, ["scan_run_id", "nessus_host_id"], "inner")
    assert joined.count() == declared.count()
    bad = joined.filter(
        (F.col("critical_count") != F.col("decl_critical_count"))
        | (F.col("high_count") != F.col("decl_high_count"))
        | (F.col("medium_count") != F.col("decl_medium_count"))
        | (F.col("low_count") != F.col("decl_low_count"))
        | (F.col("info_count") != 0)
    )
    assert bad.count() == 0


def test_severity_rollup_corrected_includes_zero(spark):
    docs = fixtures.scan_run_docs(spark)
    corrected = severity_rollup(docs, level="run", faithful=False)
    total_info = corrected.agg(F.sum("info_count")).collect()[0][0]
    assert total_info > 0  # severity-0 vulns exist in the fixtures
