"""Structural gate: no declared oracle may emit DuckDB HUGEINT /
DECIMAL columns in its FINAL projection.

Why this exists: the driver's correctness check fetches oracle results
via Arrow, and DuckDB renders an uncast integer SUM() as HUGEINT →
Arrow ``decimal128(38,0)``, which the driver canonicalizes differently
from int64 — a value-hash mismatch that the LOCAL harness provably
cannot see (Python stringifies Decimal and int identically).  Round 7
shipped exactly three such oracles (q177/q179/q182) and they were the
first red driver rows in seven rounds.  The portability rule (PLANS.md,
round 3): every integer aggregate in an oracle's final projection must
be ``CAST(... AS BIGINT)``.

This test runs every declared oracle as ``SELECT * FROM (sql) LIMIT 0``
through DuckDB's Arrow surface at sf0.001 and fails on any decimal
column — making the whole class structurally impossible to reship.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nessus_client_etl_scripts_spark.catalog import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TYPECHECK_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _oracles() -> dict[str, str]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_no_oracle_emits_decimal_columns():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    offenders: list[str] = []
    for name, sql in sorted(_oracles().items()):
        tbl = con.execute(
            f"SELECT * FROM ({sql}) __typeprobe LIMIT 0"
        ).fetch_arrow_table()
        bad = [
            f"{f.name}:{f.type}"
            for f in tbl.schema
            if pa.types.is_decimal(f.type)
        ]
        if bad:
            offenders.append(f"{name} -> {', '.join(bad)}")
    assert not offenders, (
        "oracle final projections emit DuckDB HUGEINT/DECIMAL — wrap the "
        "aggregate in CAST(... AS BIGINT) (PLANS.md r3 rule):\n  "
        + "\n  ".join(offenders)
    )
