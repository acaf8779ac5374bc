"""Generate QUERY_INDEX.md — one row per declared query: where it
lives, whether it has a DuckDB value oracle, and its first docstring
sentence. Regenerable any time; the committed copy is the navigable
map of the full declared surface for reviewers.

Usage: python tools/gen_query_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".— ", "; "):
        i = text.find(stop)
        if 0 < i < 240:
            return text[: i + 1]
    return text[:240]


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    lines = [
        "# QUERY_INDEX — the declared surface",
        "",
        f"{len(qs)} queries; {len(oracles)} with DuckDB value oracles"
        + (
            ""
            if len(oracles) == len(qs)
            else " (the rest are rows-only by nature)"
        )
        + ". Regenerate with `python tools/gen_query_index.py`."
        " Order below is numeric; the driver iterates `queries()` in"
        " evidence-priority order (see the head tuple in `__spark_entry__.py`).",
        "",
        "| query | module | oracle | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.replace(
            "nessus_client_etl_scripts_spark.plans.", "plans/"
        )
        summary = first_sentence(fn.__doc__).replace("|", "\\|")
        lines.append(
            f"| {name} | `{mod}` |"
            f" {'value' if name in oracles else 'rows-only'} |"
            f" {summary} |"
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERY_INDEX.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
