"""Extended-suite slope: the heaviest NON-core bench entries at sf0.1 vs
sf1 (r9 follow-up to tools/core_slope_bench.py, which covers the frozen
CORE contract only).

The CORE sf1 table proved no super-linear CORE entry; this measures the
iterative/graph/join-heavy extended entries that dominate the rest of the
bench wall — the operators whose loop shape (one shuffle per round,
checkpoint+release) or output-bound joins are the 100 TB risk surface.

Usage: python tools/make_sf1.py && python tools/extended_slope_bench.py
       [query ...]          # default: the five heaviest extended entries
Appends nothing; prints the markdown rows to paste into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaling",
        "sf1",
    ),
}
RUNS = int(os.environ.get("SPARK_GRAFT_SLOPE_RUNS", "3"))

# The five most expensive extended-suite entries by r9 bench medians
# (BENCH_DETAIL_r09.json): the loop operators + the set-similarity join.
DEFAULT = [
    "q_pagerank2",
    "q_setsim_join",
    "q_pca_power",
    "q_bfs_reach",
    "q_link_prediction",
]


def main() -> None:
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not registered: {unknown}")
    if not os.path.isdir(SF_DIRS["sf1"]):
        sys.exit("sf1 fixture missing — run tools/make_sf1.py first")

    spark = get_spark(app_name="extended_slope_bench")
    # Per-query JIT warm-up at sf0.001 (below, in the loop) is load-bearing,
    # not cosmetic: cold generated code runs interpreted until the JIT
    # thresholds trip, so its cost scales with the data the FIRST execution
    # touches. Measured: q_minhash_signatures cold-first at sf1 (one 50k-row
    # input split) runs minutes-scale interpreted, but after a 4.7 s
    # sf0.001 warm pass the same sf1 job is 1.3 s. Multi-stage pipelines
    # (q_pagerank2's sigs→bands→pairs→rounds) compound this per stage —
    # an unwarmed sf1 first run stalled >60 min where the warmed steady
    # state is seconds. Always warm on the small slice first; bench.py gets
    # this implicitly from suite ordering.

    print("| query | sf0.1 s | sf1 s | time ratio | rows 0.1 | rows 1 | output ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        REGISTRY[name].build(spark, "/root/testdata/sf0.001").count()  # warm
        res = {}
        for sf, d in SF_DIRS.items():
            runs, rows = [], None
            for i in range(RUNS):
                t0 = time.perf_counter()
                rows = REGISTRY[name].build(spark, d).count()
                runs.append(time.perf_counter() - t0)
                print(f"# {name} {sf} run{i}: {runs[-1]:.2f}s", flush=True)
            runs.sort()
            res[sf] = (runs[len(runs) // 2], rows)
        (t1, r1), (t10, r10) = res["sf0.1"], res["sf1"]
        tr = t10 / t1 if t1 else float("nan")
        orr = r10 / r1 if r1 else float("nan")
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | {tr:.1f}x | {r1:,} | "
            f"{r10:,} | {orr:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
