"""Marginal-cost measurement: time the given queries at sf0.01 and
sf0.1 (warmup + min-of-2, the bench.py protocol) and print table rows
for BASELINE.md's 10x-data table.

Usage: python tools/marginal_bench.py q114_semantic_dedup [more ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nessus_client_etl_scripts_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("marginal", master="local[32]")
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for name in names:
            fn = qs[name]
            best = None
            for i in range(3):  # pass 0 = warmup
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if i > 0:
                    best = dt if best is None else min(best, dt)
            results[name][sf_dir] = best
    for name in names:
        a = results[name]["/root/testdata/sf0.01"]
        b = results[name]["/root/testdata/sf0.1"]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | +{b - a:.2f} s |")


if __name__ == "__main__":
    main()
