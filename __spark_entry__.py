"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nessus_client_etl_scripts_spark``; this module is the
thin declared surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nessus_client_etl_scripts_spark.plans import corpus_queries as _cq  # noqa: F401 — registers q20+
from nessus_client_etl_scripts_spark.plans import relational_queries as _rq  # noqa: F401 — registers q42+
from nessus_client_etl_scripts_spark.plans import streaming_queries as _sq  # noqa: F401 — registers q53
from nessus_client_etl_scripts_spark.plans import testdata_queries as _tq

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_folder_results analogue — SURVEY.md §3.3) on
    sf0.001: latest order per customer in one segment joined through the
    fact chain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _tq.spark_queries()["q01_folder_results_latest"](spark, SF0001)


# Round-5 driver-budget ordering (the driver checks ~50 queries in
# iteration order per round).  HEAD: queries needing a FRESH row this
# round — q53 has NEVER been driver-checked (the one gap in r1-r4);
# q55's last row (r2) predates the star-contraction default; q39
# gained a full value oracle in r5 (was rows-only); q92's pos switched
# to the true global row number; q96+ are new this round.  MIDDLE: the
# r3-era block (q12-q40, q42-q52, q54, q56, q58 — last proven r3) so
# the budget refreshes the oldest evidence.  TAIL: the r4-green block.
_R5_HEAD = ("q39", "q53", "q55", "q92") + tuple(f"q{n}" for n in range(96, 125))
_R4_GREEN = (
    tuple(f"q{n:02d}" for n in range(1, 12))
    + ("q41", "q57")
    + tuple(f"q{n}" for n in range(59, 96))
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order == driver iteration order; see the ordering note
    above (_R5_HEAD / r3-era refresh / r4-green tail)."""
    all_queries = dict(sorted(_tq.spark_queries().items()))

    def prefix(name: str) -> str:
        return name.split("_", 1)[0]

    head = {n: f for n, f in all_queries.items() if prefix(n) in _R5_HEAD}
    mid = {
        n: f
        for n, f in all_queries.items()
        if n not in head and prefix(n) not in _R4_GREEN
    }
    rest = {n: f for n, f in all_queries.items() if n not in head and n not in mid}
    return {**head, **mid, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return _tq.oracle_queries()
