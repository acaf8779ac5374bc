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
from nessus_client_etl_scripts_spark.plans import round7_queries as _r7  # noqa: F401 — registers q201+
from nessus_client_etl_scripts_spark.plans import round8_queries as _r8  # noqa: F401 — registers q214+
from nessus_client_etl_scripts_spark.plans import round8b_queries as _r8b  # noqa: F401 — registers q273+
from nessus_client_etl_scripts_spark.plans import streaming_queries as _sq  # noqa: F401 — registers q53
from nessus_client_etl_scripts_spark.plans import testdata_queries as _tq

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_folder_results analogue — SURVEY.md §3.3) on
    sf0.001: latest order per customer in one segment joined through the
    fact chain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _tq.spark_queries()["q01_folder_results_latest"](spark, SF0001)


# Round-9 driver-budget ordering (the driver checks ~50 queries in
# iteration order per round).  Round 9 adds ZERO queries — the whole
# budget clears evidence debt per the r8 verdict.  HEAD, in priority
# order: (a) the thirteen queries whose PLANS CHANGED this round
# (entity-scale windows routed through the two-phase machinery;
# q299's sampled-medoid cap; q290's fixpoint early-exit) — four of
# them (q227/q291/q294/q290) held r8 green rows that the edits
# staled; (b) the riskiest never-checked r8
# additions (graph/iterative/quantized-float: q307/q316/q323/q331),
# then the remaining never-checked pool — q239-q272 and q298-q331
# minus the 47 r8-checked — interleaved so both waves earn rows;
# (c) the r2-era trio q54/q56/q58; (d) the r3-era nineteen.  That is
# 12+4+50+3+19 ≈ 88 against a ~50 budget: the overflow (lowest-risk
# never-checked + the stale blocks) spills to r10 by design.
def _interleave(*seqs):
    out = []
    for group in __import__("itertools").zip_longest(*seqs):
        out.extend(n for n in group if n is not None)
    return tuple(out)


_R9_CHANGED = (
    "q299", "q266", "q291", "q227", "q251", "q259",
    "q294", "q303", "q315", "q326", "q327", "q330", "q290",
    # float-path restages: the r9 full-sf0.1 sweep proved DuckDB's
    # HUGEINT→DOUBLE cast double-rounds (PLANS.md #17) — both now emit
    # pinned integer micro ratios and need fresh rows
    "q155", "q164",
)
_R9_RISKY = ("q307", "q316", "q323", "q331")
_R9_HEAD = (
    _R9_CHANGED
    + _R9_RISKY
    + _interleave(
        tuple(f"q{n}" for n in range(239, 273)),
        tuple(f"q{n}" for n in range(298, 332)),
    )
    + ("q54", "q56", "q58")
    + tuple(f"q{n}" for n in range(29, 39))
    + tuple(f"q{n}" for n in range(40, 50))
)
# Fresh-evidence tail: r8-green rows (q177/q179/q182 re-proofs plus
# the two checked new-wave blocks q214-q238 and q273-q297 — minus the
# four whose plans changed this round, which sit in the head), the
# r7-green rows, the r6-green block q120+q125-q173, and the r5-green
# block.
_FRESH_GREEN = (
    ("q177", "q179", "q182")
    + tuple(f"q{n}" for n in range(214, 239) if n != 227)
    + tuple(f"q{n}" for n in range(273, 298) if n not in (291, 294))
    + tuple(f"q{n}" for n in range(174, 214) if n not in (177, 179, 182))
    + ("q114", "q115", "q92", "q112", "q50", "q55", "q93", "q96")
    + ("q51", "q52")
    + ("q120",)
    + tuple(f"q{n}" for n in range(125, 174))
    + tuple(f"q{n}" for n in range(97, 112) if n not in (103,))
    + ("q103", "q113", "q116", "q117", "q118", "q119")
    + tuple(f"q{n}" for n in range(121, 125))
    + tuple(f"q{n:02d}" for n in range(12, 29))
    + ("q39", "q53")
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order == driver iteration order; see the ordering note
    above (_R9_HEAD / stale middle / fresh-green tail)."""
    all_queries = dict(sorted(_tq.spark_queries().items()))

    def prefix(name: str) -> str:
        return name.split("_", 1)[0]

    head = {
        n: all_queries[n]
        for p in _R9_HEAD
        for n in all_queries
        if prefix(n) == p
    }
    mid = {
        n: f
        for n, f in all_queries.items()
        if n not in head and prefix(n) not in _FRESH_GREEN
    }
    rest = {n: f for n, f in all_queries.items() if n not in head and n not in mid}
    return {**head, **mid, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return _tq.oracle_queries()
