"""Compute the default-profile pytest budget from a full-matrix
``--durations=0`` log (r13: VERDICT item 2 follow-through — the r13
session-1 bounded profile narrowed only the oracle sweep; the measured
default profile still projected ~57 min, so the long goldens must
actually carry the ``full_matrix`` marker).

Reads a pytest log containing the ``slowest durations`` block, drops the
second-SF oracle-sweep entries (the bounded profile already excludes
sf0.001), aggregates call+setup+teardown per test, and prints:

- the projected default-profile total,
- the top tests by cost with a cumulative column — the data for choosing
  which goldens to mark ``full_matrix``,
- the projected total if every test above ``--mark-threshold`` seconds
  (default 45) outside test_oracle.py were marked.

Usage: python tools/profile_budget.py /tmp/pytest_full_r13.log
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--mark-threshold", type=float, default=45.0)
    args = ap.parse_args()

    pat = re.compile(
        r"^([0-9.]+)s (call|setup|teardown)\s+(\S+)$"
    )
    per_test: dict[str, float] = defaultdict(float)
    with open(args.log, encoding="utf-8", errors="replace") as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                per_test[m.group(3)] += float(m.group(1))

    # default profile = everything except the sf0.001 oracle-sweep leg
    default_tests = {
        t: s for t, s in per_test.items() if "sf0.001" not in t
    }
    total_full = sum(per_test.values())
    total_default = sum(default_tests.values())
    print(f"full matrix measured: {total_full / 60:.1f} min "
          f"({len(per_test)} timed entries)")
    print(f"default profile projected: {total_default / 60:.1f} min "
          f"({len(default_tests)} tests)")

    ranked = sorted(default_tests.items(), key=lambda kv: -kv[1])
    cum = 0.0
    print("\ntop default-profile tests (cumulative):")
    for t, s in ranked[:40]:
        cum += s
        print(f"{s:8.1f}s {cum / 60:6.1f}min  {t}")

    markable = [
        (t, s)
        for t, s in ranked
        if s >= args.mark_threshold and "test_oracle.py" not in t
    ]
    saved = sum(s for _, s in markable)
    print(f"\nmarking {len(markable)} tests >= {args.mark_threshold}s "
          f"(outside test_oracle.py) saves {saved / 60:.1f} min -> "
          f"projected default {(total_default - saved) / 60:.1f} min")
    for t, s in markable:
        print(f"  {s:8.1f}s {t}")


if __name__ == "__main__":
    main()
