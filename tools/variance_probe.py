"""Attribute bench run-to-run variance (r6 VERDICT #3).

`q_winnow_fingerprints` (map-only, zero shuffles) showed a 20.8 s spread
on a 3.4 s best, and `q_setsim_join` 10.6 s on 4.5 s — nothing in either
plan varies between runs, so the suspect list is JVM-level: JIT
compilation of the giant generated whole-stage methods, GC, or codegen
falling back to the interpreted path.

This probe runs one registry query N times in a single session and
prints, per run: wall seconds, delta JIT compilation ms
(CompilationMXBean.getTotalCompilationTime — cumulative ms the JIT
compiler threads spent; a big delta on a slow run = the run paid
compilation), and delta GC ms (sum over GarbageCollectorMXBeans).  Both
beans are process-wide and monotone, read through py4j — no listener
plumbing needed in local mode where driver == executor JVM.

Usage:
    python tools/variance_probe.py q_winnow_fingerprints 10
    SPARK_GRAFT_WSCG=0 python tools/variance_probe.py q_winnow_fingerprints 10
        (control: whole-stage codegen off — if variance vanishes, the
        generated-method JIT is the source)
    python tools/variance_probe.py --control-alu 10
        (fixed-work ALU-bound plan: xxhash64 over 600M rows, no shuffle —
        flat if general CPU scheduling is healthy)
    python tools/variance_probe.py --control-mem 10
        (fixed-work MEMORY-bound plan: hash-agg 120M rows onto 30M keys —
        the random-access hash-table class of work a broadcast probe +
        distinct does; swings ~5x when the shared sandbox's memory
        subsystem is contended)

Findings land in SCALING.md ("Variance attribution", r7).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _jvm_counters(spark):
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    jit = mf.getCompilationMXBean().getTotalCompilationTime()
    gc = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc += it.next().getCollectionTime()
    return jit, gc


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark(app_name="variance_probe")
    if os.environ.get("SPARK_GRAFT_WSCG") == "0":
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    from pyspark.sql import functions as F

    def _run_once():
        if name == "--control-alu":
            df = (
                spark.range(0, 600_000_000, 1, 32)
                .select(F.xxhash64("id").alias("h"))
                .select(F.sum(F.col("h") / F.lit(1e9)))
            )
        elif name == "--control-mem":
            df = (
                spark.range(0, 120_000_000, 1, 32)
                .select((F.xxhash64("id") % 30_000_000).alias("k"))
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("c"))
                .select(F.sum(F.col("c") / F.lit(1e9)))
            )
        else:
            df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for i in range(n):
        jit0, gc0 = _jvm_counters(spark)
        t0 = time.perf_counter()
        _run_once()
        wall = time.perf_counter() - t0
        jit1, gc1 = _jvm_counters(spark)
        rows.append(
            {
                "run": i,
                "wall_s": round(wall, 3),
                "jit_ms": int(jit1 - jit0),
                "gc_ms": int(gc1 - gc0),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    walls = sorted(r["wall_s"] for r in rows)
    print(
        json.dumps(
            {
                "query": name,
                "best": walls[0],
                "median": walls[len(walls) // 2],
                "spread": round(walls[-1] - walls[0], 3),
                "wscg": os.environ.get("SPARK_GRAFT_WSCG", "1"),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
