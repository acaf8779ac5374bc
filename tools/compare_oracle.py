"""Local oracle-differential harness — mirrors the driver's check:
row-count + schema + order-insensitive value comparison between each
declared Spark query and its DuckDB oracle SQL at a given sf dir.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from nessus_client_etl_scripts_spark.catalog import TESTDATA_TABLES
from nessus_client_etl_scripts_spark.session import get_spark


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Order columns by name, stringify cells, sort rows — mirrors the
    driver's order-insensitive value hash over collected Python values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def _cell(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(float(v))  # float(): numpy 2 reprs np.float64 verbosely
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            # Arrow fetch, not fetchall: CORRECTNESS_r02 showed the
            # driver sees DuckDB HUGEINT (sum of integers) as float
            # ("120588.0" vs Spark's "120588" → hash mismatch on q49)
            # while nullable BIGINT stays integer (q42 green) — that is
            # exactly DuckDB's Arrow conversion. fetchall()'s python
            # ints would mask the HUGEINT class of mismatch locally.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            o_cols = list(tbl.column_names)
            o_rows = [
                tuple(d[c] for c in o_cols) for d in tbl.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if len(s_rows) != len(o_rows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duckdb={len(o_rows)}")
            continue
        if sorted(s_cols) != sorted(o_cols):
            failures.append(name)
            print(
                f"FAIL  {name}: columns spark={sorted(s_cols)} "
                f"duckdb={sorted(o_cols)}"
            )
            continue
        cs = _canon_rows(s_cols, s_rows)
        co = _canon_rows(o_cols, o_rows)
        if cs != co:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b]
            print(f"FAIL  {name}: value mismatch in {len(bad)} rows")
            for i in bad[:3]:
                print(f"  spark : {dict(zip(sorted(s_cols), cs[i]))}")
                print(f"  duckdb: {dict(zip(sorted(o_cols), co[i]))}")
            continue
        print(f"ok    {name}: {len(s_rows)} rows match")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
