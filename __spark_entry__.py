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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Sorted by query number (insertion order == iteration order for the
    driver): reference-parity queries first, newest extensions last, so
    a budget-bounded correctness run covers the core surface before the
    long tail (CORRECTNESS_r02 recorded only the first 50 registered —
    registration order, not importance, decided what got checked)."""
    return dict(sorted(_tq.spark_queries().items()))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return _tq.oracle_queries()
