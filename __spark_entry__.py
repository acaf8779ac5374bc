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
from nessus_client_etl_scripts_spark.plans import round6_queries as _r6  # noqa: F401 — registers q125+
from nessus_client_etl_scripts_spark.plans import round6b_queries as _r6b  # noqa: F401 — registers q132+
from nessus_client_etl_scripts_spark.plans import round6c_queries as _r6c  # noqa: F401 — registers q153
from nessus_client_etl_scripts_spark.plans import round6d_queries as _r6d  # noqa: F401 — registers q177+
from nessus_client_etl_scripts_spark.plans import streaming_queries as _sq  # noqa: F401 — registers q53
from nessus_client_etl_scripts_spark.plans import testdata_queries as _tq

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_folder_results analogue — SURVEY.md §3.3) on
    sf0.001: latest order per customer in one segment joined through the
    fact chain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _tq.spark_queries()["q01_folder_results_latest"](spark, SF0001)


# Round-6 driver-budget ordering (the driver checks ~50 queries in
# iteration order per round).  HEAD, in priority order: q120 (its r5
# row is the only non-green — a HUGEINT-vs-BIGINT oracle cast, fixed
# post-r5, needs its first green row); q125-q176 (new this round —
# never driver-checked; 52 queries — the head alone overfills the
# ~50 budget, so the r7 head starts where this round's check
# stops); then the oldest-evidence blocks — the
# r2-era queries (q51/q52/q54/q56/q58, last proven r2) and the
# r3-era block (q29-q50, last proven r3) take the remaining slots.
# MIDDLE: the r4-green block (second-oldest evidence).  TAIL: the
# queries proven green in r5.
_R6_HEAD = (
    ("q120",)
    + tuple(f"q{n}" for n in range(125, 201))
    + ("q51", "q52", "q54", "q56", "q58")
    + tuple(f"q{n}" for n in range(29, 39))
    + ("q40",)
    + tuple(f"q{n}" for n in range(42, 51))
)
_R5_GREEN = (
    tuple(f"q{n}" for n in range(96, 120))
    + tuple(f"q{n}" for n in range(121, 125))
    + tuple(f"q{n:02d}" for n in range(12, 29))
    + ("q39", "q53", "q55", "q92")
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order == driver iteration order; see the ordering note
    above (_R6_HEAD / r4-green middle / r5-green tail)."""
    all_queries = dict(sorted(_tq.spark_queries().items()))

    def prefix(name: str) -> str:
        return name.split("_", 1)[0]

    head = {
        n: all_queries[n]
        for p in _R6_HEAD
        for n in all_queries
        if prefix(n) == p
    }
    mid = {
        n: f
        for n, f in all_queries.items()
        if n not in head and prefix(n) not in _R5_GREEN
    }
    rest = {n: f for n, f in all_queries.items() if n not in head and n not in mid}
    return {**head, **mid, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return _tq.oracle_queries()
