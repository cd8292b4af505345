"""Generate OPERATORS.md — the consolidated queries()/oracle_sql() catalog —
from the live registry (names, docstring summaries, verification status).

Usage: PYTHONPATH=/root/repo python tools/gen_catalog.py > OPERATORS.md
"""

from __future__ import annotations

import inspect
import sys

sys.path.insert(0, "/root/repo")

from signalsharp_ray.pipelines.queries import build_oracle_sql, build_queries  # noqa: E402


def summary(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    first = doc.split("\n\n")[0].replace("\n", " ").strip()
    return first if first else "(see module docstring)"


def main() -> None:
    qs = build_queries()
    oracles = build_oracle_sql()
    print("# Operator catalog")
    print()
    print(
        f"All **{len(qs)} `queries()` entries** ({len(oracles)} DuckDB-oracle-"
        "verified), generated from the live registry by tools/gen_catalog.py."
    )
    print("Status: `SQL` = driver hash-compares rows/schema/values against the")
    print("oracle at sf0.01; `rows` = approximate-by-design or no SQL ground")
    print("truth (each is error-bounded or pinned against an exact counterpart")
    print("in tests — see SURVEY.md §8).")
    print()
    print("| # | query | status | what it computes |")
    print("|---|---|---|---|")
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        status = "SQL" if name in oracles else "rows"
        print(f"| {i} | `{name}` | {status} | {summary(fn)} |")


if __name__ == "__main__":
    main()
