"""Per-round scale gate: the sf0.1 → sf1 slope as a GATED artifact
(r10 VERDICT #2).

The r9 q_setsim_join cliff (2,150 s at sf1 from an AQE plan flip) was
invisible at sf0.1 and caught only by an ad-hoc sf1 sweep; r10 proved the
fix at sf1. This tool makes that sweep a once-per-round contract like the
stress rotation: it runs the CORE bench set plus the heavy extended
entries at both scale points (median-of-RUNS, warm-first discipline — see
tools/extended_slope_bench.py's JIT note), applies a regression rule that
WOULD have flagged the setsim cliff, and writes ``SCALE_GATE_r{N}.json``.

Rules (per query):
  1. **slope rule** — flag when ``time_ratio > max(CAP, SLOPE_K ×
     output_ratio)``. Time may grow super-linearly only when the ANSWER
     does (output-bound joins: q_neardup_embedding's 34× time for 2,389×
     rows is fine; r9 setsim's 330× time for 107× rows is the cliff —
     330 > 2×107 flags, the fixed 132 ≤ 214 passes).
  2. **round-over-round rule** — when a previous SCALE_GATE artifact is
     given via ``--prev``, flag sf1 medians that regressed by more than
     the bench_compare noise model (>1.5× AND >2 s absolute — sub-second
     jitter and environmental drift stay out, a real cliff cannot hide).

Usage:
    python tools/make_sf1.py               # once (fixture is idempotent)
    python tools/scale_gate.py --round 11 [--prev SCALE_GATE_r10.json]
        [--out SCALE_GATE_r11.json] [query ...]

Exit status 1 when any query flags — the gate semantic.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaling",
    "sf1",
)
RUNS = int(os.environ.get("SPARK_GRAFT_SLOPE_RUNS", "3"))

# slope rule constants (rationale in the module docstring)
CAP = 20.0
SLOPE_K = 2.0
# round-over-round noise model (tools/bench_compare.py discipline)
PREV_RATIO = 1.5
PREV_ABS_S = 2.0

# Heavy extended entries beyond CORE — the loop/graph/join-heavy operators
# whose plan shape is the 100 TB risk surface (extended_slope_bench DEFAULT).
EXTENDED_HEAVY = [
    "q_pagerank2",
    "q_setsim_join",
    "q_pca_power",
    "q_bfs_reach",
    "q_link_prediction",
    # r12: the other two capped pair generators — their row_number /
    # in-array caps must stay no-ops at sf1's real key cardinalities
    "q_item_item_cosine",
    "q_copurchase",
]


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def run_query(registry, spark, name: str, sf_dir: str) -> tuple[float, int]:
    runs, rows = [], 0
    for i in range(RUNS):
        t0 = time.perf_counter()
        rows = registry[name].build(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
        print(f"# {name} {os.path.basename(sf_dir)} run{i}: "
              f"{runs[-1]:.2f}s", flush=True)
    return median(runs), rows


def evaluate(rec: dict, prev: dict | None) -> list[str]:
    flags = []
    if rec["time_ratio"] is None:
        # t_small measured as 0 — no usable small-SF baseline; surface it
        # rather than TypeError-ing on the comparison below
        return ["no t_small baseline (sf0.1 time measured as 0)"]
    if rec["time_ratio"] > max(CAP, SLOPE_K * rec["output_ratio"]):
        flags.append(
            f"slope: {rec['time_ratio']:.1f}x time for "
            f"{rec['output_ratio']:.1f}x output exceeds "
            f"max({CAP:.0f}, {SLOPE_K:.0f}*output)"
        )
    if prev is not None:
        p = prev.get("t_big")
        if (
            p
            and rec["t_big"] > p * PREV_RATIO
            and rec["t_big"] - p > PREV_ABS_S
        ):
            flags.append(
                f"regression: sf1 {rec['t_big']:.2f}s vs prev {p:.2f}s "
                f"(> {PREV_RATIO}x and > {PREV_ABS_S}s)"
            )
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--prev", default=None,
                    help="previous round's SCALE_GATE artifact for the "
                         "round-over-round rule")
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*",
                    help="override the CORE+extended-heavy default set")
    args = ap.parse_args()
    out_path = args.out or f"SCALE_GATE_r{args.round}.json"

    if not os.path.isdir(SF_BIG):
        sys.exit("sf1 fixture missing — run tools/make_sf1.py first")

    from bench import CORE
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    names = args.queries or (CORE + EXTENDED_HEAVY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not registered: {unknown}")
    prev_q: dict[str, dict] = {}
    if args.prev:
        with open(args.prev, encoding="utf-8") as f:
            prev_q = json.load(f).get("queries", {})

    spark = get_spark(app_name="scale_gate")
    queries: dict[str, dict] = {}
    all_flags: dict[str, list[str]] = {}
    for name in names:
        # warm-first: JIT the whole pipeline on the tiny slice so the sf1
        # first-run cost is the plan's, not the interpreter's
        REGISTRY[name].build(spark, "/root/testdata/sf0.001").count()
        t_small, r_small = run_query(REGISTRY, spark, name, SF_SMALL)
        t_big, r_big = run_query(REGISTRY, spark, name, SF_BIG)
        rec = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "rows_small": r_small,
            "rows_big": r_big,
            "time_ratio": round(t_big / t_small, 2) if t_small else None,
            "output_ratio": round(r_big / r_small, 2) if r_small else 1.0,
        }
        flags = evaluate(rec, prev_q.get(name))
        rec["flags"] = flags
        queries[name] = rec
        if flags:
            all_flags[name] = flags
        print(f"## {name}: {rec['time_ratio']}x time, "
              f"{rec['output_ratio']}x output"
              + (f"  FLAGGED: {flags}" if flags else ""), flush=True)

    record = {
        "metric": "scale_gate",
        "round": args.round,
        "sf_pair": ["sf0.1", "sf1"],
        "runs_per_point": RUNS,
        "rule": {
            "slope": f"time_ratio <= max({CAP:.0f}, "
                     f"{SLOPE_K:.0f} * output_ratio)",
            "prev": f"sf1 median <= prev * {PREV_RATIO} or delta <= "
                    f"{PREV_ABS_S}s" + ("" if args.prev else " (no prev)"),
        },
        "queries": queries,
        "flags": all_flags,
        "ok": not all_flags,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(json.dumps(record, separators=(",", ":")) + "\n")
    print(json.dumps({"scale_gate_ok": not all_flags,
                      "flagged": sorted(all_flags)}))
    if all_flags:
        sys.exit(1)


if __name__ == "__main__":
    main()
