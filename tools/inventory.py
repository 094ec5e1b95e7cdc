"""Regenerate QUERIES.md — the registry inventory table.

One row per registered query: name, the first line of its implementation
comment (the intent), and whether a DuckDB oracle twin is present
(always yes — the registry rejects oracle-less registrations; the column
exists so a future exception would be visible, not silent).

Usage: python tools/inventory.py
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_comment_line(fn) -> str:
    src = inspect.getsource(fn)
    for line in src.splitlines():
        t = line.strip()
        if t.startswith("#"):
            return t.lstrip("# ").rstrip()
    return ""


def main() -> None:
    from opc2mongodb_spark.queries import REGISTRY

    lines = [
        "# QUERIES — the oracle-checked registry inventory",
        "",
        f"{len(REGISTRY)} registered queries; every one carries a DuckDB",
        "oracle twin (the registry rejects oracle-less registrations).",
        "Regenerate with `python tools/inventory.py`.",
        "",
        "| query | intent (first implementation comment line) | oracle |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        intent = first_comment_line(spec.build) or "(see docstring/SQL)"
        intent = re.sub(r"\|", "\\|", intent)[:110]
        has_oracle = "yes" if getattr(spec, "oracle", None) else "NO"
        lines.append(f"| `{name}` | {intent} | {has_oracle} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(REGISTRY)} queries)")


if __name__ == "__main__":
    main()
