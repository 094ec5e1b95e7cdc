"""Generate the r13 operator checklist table (OPTIMIZATION_r13.md) from
the round's committed artifacts: every bench query gets its r12-record
vs r13-record medians, the box-factor-normalized ratio, and a verdict
slot; streaming operators are listed with their round evidence.

Usage: python tools/checklist_r13.py BENCH_DETAIL_r12.json BENCH_DETAIL_r13.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    common = [k for k in new if k in old and old[k] > 0.05]
    box = statistics.median(new[k] / old[k] for k in common)
    print(f"<!-- box factor (median ratio over {len(common)} bit-identical"
          f" or compared queries): {box:.2f}x -->")
    print("| query | r12 record s | r13 record s | ratio | vs box |")
    print("|---|---|---|---|---|")
    for k in sorted(new, key=lambda k: -new[k]):
        o = old.get(k)
        if not o:
            print(f"| {k} | — | {new[k]:.3f} | — | new |")
            continue
        r = new[k] / o
        rel = r / box
        tag = "improved" if rel < 0.8 else ("check" if rel > 1.35 else "flat")
        print(f"| {k} | {o:.3f} | {new[k]:.3f} | {r:.2f}x | {rel:.2f} {tag} |")


if __name__ == "__main__":
    main()
