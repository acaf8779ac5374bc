"""Driver-evidence ledger: for every declared query, the latest round
with a green CORRECTNESS row (rows+schema+hash), queries never checked,
and the staleness cohorts — the input for building the next round's
`_R{N}_HEAD` ordering in __spark_entry__.py (changed plans first, then
never-checked riskiest-first, then oldest cohorts).

Usage: python tools/evidence.py            # summary + cohorts
       python tools/evidence.py --check    # exit 1 if any red/never rows
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Rows recorded under a PRE-RENAME query name: folded into the current
# prefix so "queries ever checked" audits don't read one high (the r11
# verdict's hygiene note — 339 named rows ≠ 338 queries).
# q41_groupwise_pandas_rank is the r3 twin of today's
# q41_group_pct_rank; both collapse to prefix q41 anyway, this map just
# makes the aliasing explicit and auditable.
RENAMED_ROWS = {"q41_groupwise_pandas_rank": "q41"}


def load_evidence(repo: str = "/root/repo") -> dict[str, tuple[int, bool]]:
    """prefix -> (latest round checked, green at that round)."""
    latest: dict[str, tuple[int, bool]] = {}
    # numeric sort, not lexicographic — r100 would sort before r11,
    # and an unpadded r1 before r01, silently corrupting "latest round"
    files = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, row in json.load(open(f)).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)  # rows-only ops
                and not row.get("err")
            )
            latest[RENAMED_ROWS.get(q, q.split("_", 1)[0])] = (rnd, green)
    return latest


def main() -> int:
    import __spark_entry__ as entrymod

    latest = load_evidence()
    names = list(entrymod.queries())
    never = [n for n in names if n.split("_", 1)[0] not in latest]
    red = [
        n
        for n in names
        if n.split("_", 1)[0] in latest
        and not latest[n.split("_", 1)[0]][1]
    ]
    cohorts: dict[int, list[str]] = defaultdict(list)
    for n in names:
        p = n.split("_", 1)[0]
        if p in latest:
            cohorts[latest[p][0]].append(n)

    print(f"declared: {len(names)}")
    print(f"never-checked: {len(never)}")
    for n in never:
        print(f"  {n}")
    print(f"red at latest check: {len(red)}")
    for n in red:
        print(f"  {n}")
    print("cohorts (latest green round -> count):")
    for rnd in sorted(cohorts):
        qs = cohorts[rnd]
        print(f"  r{rnd}: {len(qs)}: {' '.join(sorted(qs)[:8])}"
              + (" ..." if len(qs) > 8 else ""))
    if "--check" in sys.argv:
        return 1 if (never or red) else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
