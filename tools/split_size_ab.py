"""maxPartitionBytes A/B — scan split sizing measured honestly (r12 ledger
open item 2, r12 VERDICT #9, guide §6 / §2.2).

session.py ships ``spark.sql.files.maxPartitionBytes=128m`` and documents
512m-1g as the production value for large sequential scans; until r13 that
production claim was unproven because every committed fixture was at most
one 128m split. This tool measures the knob on inputs big enough to
discriminate (tools/make_split_fixture.py):

- ``scan_agg`` / ``scan_filter`` — q_tpch_q1/q6-shaped probes over a
  ~3.2 GB lineitem (25x 128m splits vs 7x 512m splits): pure scan+agg,
  the workload class the 512m-1g advice targets.
- the three heaviest non-output-bound extended queries at sf3
  (q_dedup_clusters, q_hybrid_neardup, q_pagerank2 — documents/embeddings
  inputs): does split size matter once shuffles dominate?

Methodology: the GATE_CODEC_AB discipline — one JVM, warm-first, arms
interleaved per rep (box drift hits both), noop-forced actions, median of
RUNS reps; per-arm scan partition counts recorded from the planned scan
RDD (untimed); per-probe row counts asserted identical across arms.
``maxPartitionBytes`` is a runtime SQL conf, so arms alternate without JVM
restarts. Honors $SPARK_GRAFT_CPUS — run once at 32 and once at 8 with
``--scan-only`` to see the parallelism-floor side (512m on a small scan
leaves cores idle; the production advice only holds when splits >> cores).

Usage:
    python tools/make_split_fixture.py
    python tools/split_size_ab.py [--out SPLIT_AB_r13.json] [--scan-only]
        [--runs 3] [--arms 128m,512m]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling"
)
SCAN_DIR = os.path.join(ROOT, "scan")
SF3_DIR = os.path.join(ROOT, "sf3")

HEAVY = ["q_dedup_clusters", "q_hybrid_neardup", "q_pagerank2"]

SIZES = {"64m": 64 << 20, "128m": 128 << 20, "512m": 512 << 20, "1g": 1 << 30}


def _probes(spark, scan_only: bool):
    """(name, build) pairs; build() returns a fresh DataFrame per call so
    each run replans under the arm's active maxPartitionBytes."""
    from pyspark.sql import functions as F

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.sources.tables import load_table

    def scan_agg():
        li = load_table(spark, SCAN_DIR, "lineitem")
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )

    def scan_filter():
        li = load_table(spark, SCAN_DIR, "lineitem")
        return (
            li.filter(
                (F.col("l_discount") >= 0.05)
                & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24)
            )
            .groupBy(F.lit(1).alias("g"))
            .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("rev"))
        )

    out = [("scan_agg", scan_agg), ("scan_filter", scan_filter)]
    if not scan_only:
        for name in HEAVY:
            out.append((name, lambda n=name: REGISTRY[n].build(spark, SF3_DIR)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SPLIT_AB_r13.json")
    ap.add_argument("--scan-only", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--arms", default="128m,512m")
    args = ap.parse_args()
    arms = args.arms.split(",")
    for a in arms:
        if a not in SIZES:
            raise SystemExit(f"unknown arm {a!r} (known: {sorted(SIZES)})")

    from opc2mongodb_spark.session import get_spark
    from opc2mongodb_spark.sources.tables import load_table

    spark = get_spark(app_name="split_size_ab")
    sc = spark.sparkContext
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    probes = _probes(spark, args.scan_only)

    key = "spark.sql.files.maxPartitionBytes"
    results: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in arms} for n, _ in probes
    }
    counts: dict[str, dict[str, int]] = {n: {} for n, _ in probes}
    scan_parts: dict[str, int] = {}

    # warm-up: one full pass per probe (JIT + page cache) on the default arm
    spark.conf.set(key, str(SIZES[arms[0]]))
    for name, build in probes:
        sc.setJobDescription(f"split_ab warmup {name}")
        build().write.format("noop").mode("overwrite").save()

    for rep in range(args.runs):
        order = arms if rep % 2 == 0 else list(reversed(arms))
        for arm in order:
            spark.conf.set(key, str(SIZES[arm]))
            if arm not in scan_parts:
                scan_parts[arm] = load_table(
                    spark, SCAN_DIR, "lineitem"
                ).rdd.getNumPartitions()
            for name, build in probes:
                sc.setJobDescription(f"split_ab {name} {arm} rep{rep}")
                df = build()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                results[name][arm].append(round(time.perf_counter() - t0, 3))
                if arm not in counts[name]:
                    counts[name][arm] = build().count()
    sc.setJobDescription(None)

    for name in counts:
        vals = set(counts[name].values())
        assert len(vals) == 1, f"{name}: row counts differ across arms {counts[name]}"

    med = lambda xs: sorted(xs)[len(xs) // 2]
    summary = {
        name: {a: {"median": med(r[a]), "runs": r[a]} for a in arms}
        for name, r in results.items()
    }
    artifact = {
        "metric": "maxPartitionBytes A/B (interleaved, noop-forced, warm)",
        "cpus": int(cpus),
        "arms": arms,
        "scan_lineitem_partitions": scan_parts,
        "scan_only": args.scan_only,
        "runs_per_arm": args.runs,
        "probes": summary,
        "row_counts": {n: list(counts[n].values())[0] for n in counts},
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
