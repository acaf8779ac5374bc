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
from nessus_client_etl_scripts_spark.plans import round10_queries as _r10  # noqa: F401 — registers q332+
from nessus_client_etl_scripts_spark.plans import round11_queries as _r11  # noqa: F401 — registers q334+
from nessus_client_etl_scripts_spark.plans import round12_queries as _r12  # noqa: F401 — registers q344+
from nessus_client_etl_scripts_spark.plans import streaming_queries as _sq  # noqa: F401 — registers q53
from nessus_client_etl_scripts_spark.plans import testdata_queries as _tq

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_folder_results analogue — SURVEY.md §3.3) on
    sf0.001: latest order per customer in one segment joined through the
    fact chain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _tq.spark_queries()["q01_folder_results_latest"](spark, SF0001)


# Round-12 driver-budget ordering (the driver checks ~50 queries in
# iteration order per round).  HEAD, in priority order: (a) the four
# queries whose PLANS CHANGED this round — the r11 ADVICE fixes
# (q339 NULL-safe tiebreak; q335/q341/q342 integer-div derived keys);
# (b) the six NEW round-12 queries q344–q349 (never-checked ranks
# above mere staleness); (c) the r4 leftover q84–q91/q94/q95 — incl.
# the §2.10 UDTF anchor q86 and §2.11 lookback anchor q90; (d) 30
# rows of the r5 cohort in stale order (q12–q28 carry the §2 F-family
# anchors q12/q13/q14/q17/q22).  Total = exactly 50; the r5 leftover
# (q108–q111, q113, q116–q119, q121–q124) leads the post-head
# rotation and is the r13 target.
_R12_HEAD = (
    # (a0) the r12 OPTIMIZATION pass's changed plans — every query
    # whose physical plan was restructured this round (posting size
    # carry, singleton-split cluster resolution, duplicate-subtree
    # pins, marginal-derived totals) re-proves before anything merely
    # stale; each is already oracle-green at sf0.01 AND in the full
    # sf0.1 sweep locally
    # (q26 and q349 are changed too but already sit in sections (b)
    # and (d) below — listed once to keep the head duplicate-free)
    (
        "q55", "q65", "q71", "q93", "q96", "q123", "q127",
        "q135", "q148", "q165", "q167", "q175", "q180", "q190",
        "q192", "q220", "q244", "q248", "q299",
    )
    # session-4 changed plans (BM25 token-frame pin and riders, q112
    # kernel total, q219 constant-group rank, q310 single-pass melt,
    # shared-scan delta view q171, lm/sketch operator pins q168/q169/
    # q149, multi-consumer pins q241/q275/q315/q221, q291 kernel total)
    + ("q112", "q132", "q133", "q173", "q219", "q265", "q310")
    + ("q171", "q168", "q169", "q241", "q149", "q275", "q291",
       "q221", "q315")
    + ("q335", "q339", "q341", "q342")
    + tuple(f"q{n}" for n in range(344, 350))
    + tuple(f"q{n}" for n in range(84, 92))
    + ("q94", "q95")
    + tuple(f"q{n:02d}" for n in range(12, 29))
    + ("q39", "q53")
    + tuple(f"q{n}" for n in range(97, 108))
)
# Post-head rotation: every remaining query ordered by the ROUND of
# its latest green driver row, oldest first (r5 leftover → r11 per
# the CORRECTNESS_r* scan — tools/evidence.py regenerates the
# cohorts), so any budget overflow refreshes the stalest evidence
# first.
_R12_STALE_ORDER = (
    # r5 leftover (next round's rotation target)
    tuple(f"q{n}" for n in range(108, 112))
    + ("q113", "q116", "q117", "q118", "q119")
    + tuple(f"q{n}" for n in range(121, 125))
    # r6 cohort
    + ("q120",)
    + tuple(f"q{n}" for n in range(125, 174) if n not in (155, 164))
    # r7 cohort
    + ("q50", "q51", "q52", "q55", "q92", "q93", "q96", "q112", "q114", "q115")
    + tuple(f"q{n}" for n in range(174, 214) if n not in (177, 179, 182, 201, 207))
    # r8 cohort
    + ("q177", "q179", "q182")
    + tuple(f"q{n}" for n in range(214, 239) if n != 227)
    + tuple(f"q{n}" for n in range(273, 298) if n not in (290, 291, 294))
    # r9 cohort
    + ("q155", "q164", "q227")
    + tuple(f"q{n}" for n in range(239, 260))
    + ("q266", "q291", "q294")
    + tuple(
        f"q{n}"
        for n in range(298, 332)
        if n
        not in (299, 307, 316, 317, 318, 319, 320, 321, 322, 324, 325, 328, 329)
    )
    # r10 cohort
    + ("q299", "q207", "q316")
    + (
        "q268", "q272", "q322", "q328", "q329",
        "q260", "q261", "q262", "q263", "q264", "q265", "q267",
        "q269", "q270", "q271", "q317", "q318", "q319", "q320",
        "q321", "q324", "q325",
    )
    + ("q332", "q333")
    + ("q54", "q56", "q58")
    + tuple(f"q{n}" for n in range(29, 39))
    + tuple(f"q{n}" for n in range(40, 50) if n != 41)
    + ("q201",)
    # r11 cohort (last round's head — freshest evidence; q335/q339/
    # q341/q342 re-appear in _R12_HEAD as changed plans, harmless here)
    + ("q290", "q307")
    + tuple(f"q{n}" for n in range(334, 344))
    + tuple(f"q{n:02d}" for n in range(1, 12))
    + ("q41", "q57")
    + tuple(f"q{n}" for n in range(59, 84))
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order == driver iteration order; see the ordering note
    above (_R12_HEAD, then staleness-ordered rotation)."""
    all_queries = dict(sorted(_tq.spark_queries().items()))

    def prefix(name: str) -> str:
        return name.split("_", 1)[0]

    by_prefix = {}
    for n in all_queries:
        by_prefix.setdefault(prefix(n), []).append(n)

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for p in _R12_HEAD + _R12_STALE_ORDER:
        for n in by_prefix.get(p, ()):
            out.setdefault(n, all_queries[n])
    for n, f in all_queries.items():  # safety net for unlisted names
        out.setdefault(n, f)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return _tq.oracle_queries()
