"""CORE-contract slope: the frozen 27-query bench set at sf0.1 vs sf1 (r9).

SCALING.md's 5x slopes cover selected heavy operators over
documents/events/embeddings; the CORE regression contract itself had only
ever been measured at sf0.1. This runs every CORE query at both scale
points (10x apart — tools/make_sf1.py supplies the full star schema at
sf1), records median-of-RUNS wall + output rows, rewrites the
"## CORE contract slope" section of SCALING.md, and spot-asserts that
three representative plan shapes are unchanged at sf1 (broadcast star
join, full scan pushdown, join-free dedup) — AQE must not have flipped a
strategy between scale points.

Usage: python tools/make_sf1.py && python tools/core_slope_bench.py
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
RUNS = 3

# (query, plan fragments that must appear, fragments that must NOT appear)
PLAN_SPOTS = [
    # star join keeps its broadcast dim chain at 10x
    ("q_tpch_q3", ["BroadcastHashJoin"], ["CartesianProduct"]),
    # pure-scan query keeps full predicate pushdown
    ("q_tpch_q6", ["PushedFilters: [IsNotNull"], ["SortMergeJoin"]),
    # exact dedup stays join-free partial aggregation
    ("q_dedup_exact", ["HashAggregate"], ["Join", "CartesianProduct"]),
]


def main() -> None:
    from opc2mongodb_spark.plans.checks import explain_str
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    from bench import CORE

    spark = get_spark(app_name="core_slope_bench")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, tuple[float, int]]] = {}
    for name in CORE:
        results[name] = {}
        for sf, d in SF_DIRS.items():
            runs, rows = [], None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = REGISTRY[name].build(spark, d)
                rows = df.count()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            results[name][sf] = (runs[len(runs) // 2], rows)
            print(
                f"{name} {sf}: {results[name][sf][0]:.2f}s rows={rows}",
                flush=True,
            )

    plan_lines = []
    for name, must, must_not in PLAN_SPOTS:
        verdicts = []
        for sf, d in SF_DIRS.items():
            plan = explain_str(REGISTRY[name].build(spark, d))
            missing = [f for f in must if f not in plan]
            present = [f for f in must_not if f in plan]
            ok = not missing and not present
            verdicts.append(ok)
            if not ok:
                raise SystemExit(
                    f"plan shape drift: {name} at {sf}: "
                    f"missing={missing} forbidden-present={present}"
                )
        plan_lines.append(
            f"- `{name}`: {' + '.join(must)} held, "
            f"{'/'.join(must_not)} absent, at BOTH scale points"
        )
        print(f"plan spot-assert {name}: ok")

    section = [
        "## CORE contract slope (sf0.1 -> sf1, 10x — r9)",
        "",
        "Full star schema + documents/embeddings/events at 10x",
        f"(`tools/make_sf1.py`, key-offset blocks). Median-of-{RUNS} wall on",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]; read the time",
        "ratio against the OUTPUT ratio (a groupBy keyed on a replicated key",
        "space legitimately emits 10x rows).",
        "",
        "| query | sf0.1 s | sf1 s | time ratio | rows 0.1 | rows 1 | output ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    worst = (None, 0.0)
    for name in CORE:
        (t1, r1), (t10, r10) = results[name]["sf0.1"], results[name]["sf1"]
        tr = t10 / t1 if t1 else float("nan")
        orr = r10 / r1 if r1 else float("nan")
        if tr > worst[1]:
            worst = (name, tr)
        section.append(
            f"| {name} | {t1:.2f} | {t10:.2f} | {tr:.1f}x | {r1:,} | "
            f"{r10:,} | {orr:.1f}x |"
        )
    core1 = sum(results[n]["sf0.1"][0] for n in CORE)
    core10 = sum(results[n]["sf1"][0] for n in CORE)
    section += [
        "",
        f"CORE totals: {core1:.1f} s (sf0.1) -> {core10:.1f} s (sf1) = "
        f"{core10 / core1:.1f}x wall for 10x data; worst per-query ratio "
        f"{worst[1]:.1f}x ({worst[0]}).",
        "",
        "Plan spot-asserts at sf1 (AQE strategy unchanged vs sf0.1):",
        "",
        *plan_lines,
        "",
    ]

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(out).read()
    marker = "\n## CORE contract slope"
    idx = old.find(marker)
    body = "\n".join(section)
    if idx != -1:
        # replace the existing section IN PLACE (up to the next "## "
        # heading) so hand-written sections that follow — e.g. the slope
        # analysis referring to "the table above" — keep their position
        nxt = old.find("\n## ", idx + 1)
        new = old[:idx] + "\n" + body + (old[nxt:] if nxt != -1 else "\n")
    else:
        new = old.rstrip() + "\n\n" + body
    with open(out, "w") as fh:
        fh.write(new)
    print(f"wrote CORE slope section to {out}")


if __name__ == "__main__":
    main()
