"""Guard the driver-budget head ordering in __spark_entry__.py.

The driver checks ~50 queries per round in queries() iteration order;
the _R{N}_HEAD tuple encodes that priority. A typo'd prefix there is
silently swallowed by by_prefix.get() and strands the query at the
back of the rotation — exactly the failure the r10 ADVICE flagged.

Rule: every prefix in a HEAD tuple must name a declared query (zero
tolerance — the head is hand-curated each round). STALE_ORDER tuples
are range-generated and may contain known-retired numbers, listed
explicitly below so a NEW miss still fails.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

# Query numbers that were never assigned (range-generated gaps in the
# stale-order cohorts). Grows only when a number is deliberately
# skipped; a typo in a hand-written tuple is NOT added here.
RETIRED = {"q222", "q226", "q228", "q243", "q245"}


def _declared_prefixes() -> set[str]:
    return {n.split("_", 1)[0] for n in entrymod.queries()}


def _ordering_tuples() -> dict[str, tuple[str, ...]]:
    out = {}
    for attr in dir(entrymod):
        if re.fullmatch(r"_R\d+_(HEAD|STALE_ORDER)", attr):
            out[attr] = getattr(entrymod, attr)
    return out


def test_ordering_tuples_exist():
    tuples = _ordering_tuples()
    assert any(a.endswith("_HEAD") for a in tuples), tuples.keys()


def test_head_prefixes_all_declared():
    declared = _declared_prefixes()
    for attr, tup in _ordering_tuples().items():
        if not attr.endswith("_HEAD"):
            continue
        missing = [p for p in tup if p not in declared]
        assert not missing, (attr, missing)


def test_stale_order_prefixes_declared_or_retired():
    declared = _declared_prefixes()
    for attr, tup in _ordering_tuples().items():
        if not attr.endswith("_STALE_ORDER"):
            continue
        missing = [p for p in tup if p not in declared and p not in RETIRED]
        assert not missing, (attr, missing)


def test_retired_set_is_minimal():
    """Every RETIRED entry must actually be absent — a declared query
    listed as retired would mask a future regression."""
    declared = _declared_prefixes()
    wrongly_retired = sorted(RETIRED & declared)
    assert not wrongly_retired, wrongly_retired


def test_head_has_no_duplicates():
    for attr, tup in _ordering_tuples().items():
        if not attr.endswith("_HEAD"):
            continue
        dupes = sorted({p for p in tup if tup.count(p) > 1})
        assert not dupes, (attr, dupes)


def test_head_fits_driver_budget():
    """The CURRENT round's head must be exactly the ~50-query driver
    budget: a longer head silently pushes its own tail outside the
    round's sample (the r12 ADVICE bug — an 85-entry head left
    sections (c)/(d) unchecked while the comment still said 50)."""
    tuples = _ordering_tuples()
    latest = max(
        (a for a in tuples if a.endswith("_HEAD")),
        key=lambda a: int(re.search(r"_R(\d+)_", a).group(1)),
    )
    assert len(tuples[latest]) == 50, (latest, len(tuples[latest]))


def test_head_and_stale_cover_every_query_once():
    """HEAD + STALE_ORDER of the current round must enumerate every
    declared prefix exactly once — the safety-net loop in queries()
    hides coverage gaps, which silently demote missing queries to the
    very back of the rotation."""
    tuples = _ordering_tuples()
    latest_n = max(
        int(re.search(r"_R(\d+)_", a).group(1)) for a in tuples
    )
    head = tuples.get(f"_R{latest_n}_HEAD", ())
    stale = tuples.get(f"_R{latest_n}_STALE_ORDER", ())
    combined = list(head) + list(stale)
    dupes = sorted({p for p in combined if combined.count(p) > 1})
    assert not dupes, dupes
    assert set(combined) == _declared_prefixes()
