"""Public query API — SURVEY.md §7 Phase 3.

The four stored procedures of ``/root/reference/queries/`` as plain
functions over the silver tables, one Catalyst plan each — the SPs'
cursor loops + temp tables (get_folder_stats.sql:12-57,
get_folder_results.sql:13-79) collapse into a single ranking window
(W1) over all scans at once.

NATURAL JOIN semantics are pinned to explicit key lists (SURVEY.md risk
register): MySQL natural-joins on *whatever columns share names*, which
for this schema resolves to
``host ⋈(nessus_host_id, scan_run_id) host_vuln ⋈(plugin_id) plugin
⋈(host_vuln_id) vuln_output`` and ``scan_run ⋈(scan_id) scan``.
Column ORDER mirrors MySQL's natural-join output (shared keys fronted),
verified against the SPs' temp-table DDL
(get_folder_results.sql:23-54, get_folder_stats.sql:21-36).

Tie semantics: MySQL ``ORDER BY scan_start DESC LIMIT 1`` is
nondeterministic on equal ``scan_start``; every window here adds
``desc(scan_run_id)`` as the deterministic tiebreaker.

Scale: `scan`/`plugin`/the latest-run set broadcast (small dims); the
fact chain host⋈host_vuln⋈vuln_output sort-merges on its keys with AQE
skew handling. The latest-run restriction is applied to each fact table
BEFORE the fact⋈fact joins, so at 100 TB the join inputs are one run's
rows per scan, not the full history.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import latest_per_group

# scan_run NATURAL JOIN scan output order (get_folder_stats.sql:21-36)
_STATS_COLUMNS = (
    "scan_id",
    "scan_run_id",
    "scan_start",
    "scan_end",
    "targets",
    "host_count",
    "critical_count",
    "high_count",
    "medium_count",
    "low_count",
    "info_count",
    "folder_id",
    "type",
    "name",
)

# host ⋈ host_vuln ⋈ plugin ⋈ vuln_output output order
# (get_folder_results.sql:23-54)
_RESULTS_COLUMNS = (
    "host_vuln_id",
    "plugin_id",
    "nessus_host_id",
    "scan_run_id",
    "host_id",
    "scan_id",
    "host_ip",
    "host_fqdn",
    "host_start",
    "host_end",
    "os",
    "critical_count",
    "high_count",
    "medium_count",
    "low_count",
    "info_count",
    "severity",
    "name",
    "family",
    "synopsis",
    "description",
    "solution",
    "cvss_base_score",
    "cvss3_base_score",
    "cvss_vector",
    "cvss3_vector",
    "ref",
    "pub_date",
    "mod_date",
    "vuln_output_id",
    "port",
    "output",
)

Tables = Mapping[str, DataFrame]


def _latest_runs(
    tables: Tables, offset: int, folder_id: int | None = None, scan_id: int | None = None
) -> DataFrame:
    """The (offset+1)-th latest run per scan (W1), restricted to one
    scan or one folder's scans. Replaces the SPs' per-scan scalar
    subquery ``ORDER BY scan_start DESC LIMIT 1 OFFSET k``
    (get_scan_stats.sql:14-16) — one window over all groups."""
    scan = tables["scan"]
    if folder_id is not None:
        scan = scan.filter(F.col("folder_id") == folder_id)
    runs = tables["scan_run"]
    if scan_id is not None:
        runs = runs.filter(F.col("scan_id") == scan_id)
    joined = runs.join(
        F.broadcast(
            scan.select(
                "scan_id",
                "folder_id",
                F.col("type").alias("_scan_type"),
                F.col("name").alias("_scan_name"),
            )
        ),
        "scan_id",
        "inner",
    )
    return latest_per_group(
        joined, ["scan_id"], "scan_start", "scan_run_id", offset=offset
    ).withColumnsRenamed({"_scan_type": "type", "_scan_name": "name"})


def get_scan_stats(tables: Tables, scan_id: int, offset: int = 0) -> DataFrame:
    """get_scan_stats(sid, offset) (get_scan_stats.sql:8-17): the
    (offset+1)-th most recent run of one scan, joined to its scan row."""
    return _latest_runs(tables, offset, scan_id=scan_id).select(*_STATS_COLUMNS)


def get_folder_stats(tables: Tables, folder_id: int, offset: int = 0) -> DataFrame:
    """get_folder_stats(fid, offset) (get_folder_stats.sql:8-60): one
    summary row per scan in the folder — the cursor loop as a window."""
    return _latest_runs(tables, offset, folder_id=folder_id).select(*_STATS_COLUMNS)


def _results_for_runs(tables: Tables, latest: DataFrame) -> DataFrame:
    """The 4-way fact chain (J2) restricted to the given runs.

    The semi-join restriction is pushed onto ``host`` and ``host_vuln``
    BEFORE they join each other — the run predicate prunes both fact
    scans instead of filtering a joined intermediate."""
    run_ids = F.broadcast(latest.select("scan_run_id"))
    host = tables["host"].join(run_ids, "scan_run_id", "left_semi")
    host_vuln = tables["host_vuln"].join(run_ids, "scan_run_id", "left_semi")
    return (
        host.join(host_vuln, ["nessus_host_id", "scan_run_id"], "inner")
        .join(F.broadcast(tables["plugin"]), "plugin_id", "inner")
        .join(tables["vuln_output"], "host_vuln_id", "inner")
    )


def get_scan_results(tables: Tables, scan_id: int, offset: int = 0) -> DataFrame:
    """get_scan_results(sid, offset) (get_scan_results.sql:8-23): full
    vuln detail for the (offset+1)-th latest run of one scan."""
    latest = _latest_runs(tables, offset, scan_id=scan_id)
    return _results_for_runs(tables, latest).select(*_RESULTS_COLUMNS)


def get_folder_results(
    tables: Tables,
    folder_id: int,
    plugin_id: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """get_folder_results(fid, pid, offset) (get_folder_results.sql:9-88):
    full vuln detail for the latest runs of every scan in a folder, with
    the optional plugin filter (P7) resolved at plan time so it reaches
    the host_vuln scan."""
    latest = _latest_runs(tables, offset, folder_id=folder_id)
    facts = _results_for_runs(tables, latest)
    if plugin_id is not None:
        facts = facts.filter(F.col("plugin_id") == plugin_id)
    return facts.select(*_RESULTS_COLUMNS)
