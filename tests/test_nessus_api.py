"""Phase-3 query API tests — the four stored-procedure analogues
end-to-end on normalized fixtures (SURVEY.md §3.3, §5.3)."""

import pyspark.sql.functions as F

from nessus_client_etl_scripts_spark.pipeline import fixtures
from nessus_client_etl_scripts_spark.plans import nessus_api as api

LAST = fixtures.RUNS_PER_SCAN - 1


def test_scan_stats_latest(silver):
    out = api.get_scan_stats(silver, scan_id=4).collect()
    assert len(out) == 1
    r = out[0]
    # latest run = highest run index (distinct starts for scan 4)
    assert r.scan_run_id == 4000 + LAST
    assert r.scan_start == fixtures.run_start(4, LAST)
    assert r.folder_id == 1 and r.name == "scan-4"


def test_scan_stats_offset(silver):
    r = api.get_scan_stats(silver, scan_id=4, offset=1).collect()[0]
    assert r.scan_run_id == 4000 + LAST - 1  # 2nd-latest


def test_scan_stats_offset_past_end_is_empty(silver):
    assert api.get_scan_stats(silver, 4, offset=fixtures.RUNS_PER_SCAN).count() == 0


def test_scan_stats_tiebreak(silver):
    """Scan 1: runs 2 and 3 share scan_start (fixture tie pair). MySQL
    LIMIT 1 is nondeterministic there; the engine pins desc(scan_run_id)
    → run 3 wins the tie, run LAST(3) is also... the tied pair is
    (1002, 1003) with equal starts ABOVE run 1's start, so latest=1003."""
    r = api.get_scan_stats(silver, scan_id=1).collect()[0]
    assert r.scan_run_id == 1003
    r2 = api.get_scan_stats(silver, scan_id=1, offset=1).collect()[0]
    assert r2.scan_run_id == 1002  # the tie partner, not run 1


def test_column_order_matches_reference(silver):
    assert tuple(api.get_scan_stats(silver, 4).columns) == api._STATS_COLUMNS
    assert tuple(api.get_scan_results(silver, 4).columns) == api._RESULTS_COLUMNS


def test_scan_results_restricted_to_latest_run(silver):
    out = api.get_scan_results(silver, scan_id=4)
    runs = {r.scan_run_id for r in out.select("scan_run_id").distinct().collect()}
    assert runs == {4000 + LAST}
    # every host_vuln of that run with >=1 output appears
    hv = silver["host_vuln"].filter(F.col("scan_run_id") == 4000 + LAST)
    with_outputs = hv.join(silver["vuln_output"], "host_vuln_id", "left_semi")
    assert out.select("host_vuln_id").distinct().count() == with_outputs.count()


def test_folder_stats_one_row_per_scan(silver):
    out = api.get_folder_stats(silver, folder_id=1).collect()
    assert {r.scan_id for r in out} == {3, 4, 5}
    assert all(r.scan_run_id == r.scan_id * 1000 + LAST for r in out)


def test_folder_results_plugin_filter(silver):
    all_rows = api.get_folder_results(silver, folder_id=1)
    filtered = api.get_folder_results(silver, folder_id=1, plugin_id=5)
    assert 0 < filtered.count() < all_rows.count()
    assert filtered.filter(F.col("plugin_id") != 5).count() == 0


def test_folder_results_equals_union_of_scan_results(silver):
    """The folder SP's cursor loop is semantically the union of per-scan
    results (SURVEY.md §2.8 C1) — the window form must agree."""
    folder = api.get_folder_results(silver, folder_id=2)
    per_scan = None
    for sid in (6, 7, 8):
        df = api.get_scan_results(silver, scan_id=sid)
        per_scan = df if per_scan is None else per_scan.unionAll(df)
    assert folder.exceptAll(per_scan).count() == 0
    assert per_scan.exceptAll(folder).count() == 0
