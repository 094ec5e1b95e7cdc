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
    python tools/variance_probe.py --control-ckpt 10
        (fixed-work BLOCK-STORE control: eager localCheckpoint of a 4M-row
        frame + deterministic release — isolates the per-round checkpoint
        materialization cost of the driver-loop operators; if THIS swings
        with the sandbox's memory contention, the loops' wall variance is
        checkpoint-write-bound, not plan-bound)
    python tools/variance_probe.py --lloyd3 5
        (the bench's non-registry driver loop: three full Lloyd rounds)
    SPARK_GRAFT_STAGES=1 python tools/variance_probe.py q_pagerank2 5
        (stage-level split per run via the UI REST API: per-run stage
        wall / GC / spill totals + the top stages by executor runtime,
        checkpoint-materializing jobs classified by their job groups —
        r7 VERDICT #2's attribution surface)

Findings land in SCALING.md ("Variance attribution", r7/r8).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _jvm_counters(spark):
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    jit = mf.getCompilationMXBean().getTotalCompilationTime()
    gc = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc += it.next().getCollectionTime()
    return jit, gc


class _StageProbe:
    """Per-run stage split via the UI REST API (public, stable JSON).

    The loops' lazy checkpoints materialize INSIDE the stage that first
    computes the frame (a block-store write side effect, like persist), so
    there is no separate "checkpoint stage" to read — what the split CAN
    attribute is (a) how much of a slow run is GC vs executor runtime vs
    spill, and (b) which named stages move between fast and slow runs.
    Combined with --control-ckpt (pure block-store write) that pins
    whether the variance lives in the checkpoint write path.
    """

    def __init__(self, spark) -> None:
        self._base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            if ui:
                with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
                    apps = json.load(r)
                self._base = f"{ui}/api/v1/applications/{apps[0]['id']}"
        except Exception as exc:  # pragma: no cover - UI disabled
            print(f"# stage probe disabled: {exc}", file=sys.stderr)
        self._seen = -1

    def _stages(self):
        if self._base is None:
            return []
        url = f"{self._base}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    def mark(self) -> None:
        self._seen = max(
            [s["stageId"] for s in self._stages()], default=self._seen
        )

    def split(self):
        new = [s for s in self._stages() if s["stageId"] > self._seen]
        if not new:
            return None
        self._seen = max(s["stageId"] for s in new)
        top = sorted(new, key=lambda s: -s["executorRunTime"])[:3]
        return {
            "n_stages": len(new),
            "executor_run_ms": sum(s["executorRunTime"] for s in new),
            "gc_ms": sum(s["jvmGcTime"] for s in new),
            "spill_bytes": sum(s["memoryBytesSpilled"] for s in new),
            "shuffle_write_bytes": sum(
                s["shuffleWriteBytes"] for s in new
            ),
            "top_stages": [
                {
                    "name": s["name"].split("\n")[0][:60],
                    "run_ms": s["executorRunTime"],
                    "gc_ms": s["jvmGcTime"],
                }
                for s in top
            ],
        }


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    want_stages = os.environ.get("SPARK_GRAFT_STAGES") == "1"

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark(
        app_name="variance_probe",
        extra_conf={"spark.ui.enabled": "true"} if want_stages else None,
    )
    if os.environ.get("SPARK_GRAFT_WSCG") == "0":
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    from pyspark.sql import functions as F

    def _run_once():
        if name == "--control-ckpt":
            # fixed-work block-store write: materialize ~4M rows x 2 longs
            # into checkpoint blocks, then release — the per-round cost the
            # driver loops pay, isolated from their joins/aggregates.
            from opc2mongodb_spark.operators.components import (
                release_checkpoint,
            )

            ck = (
                spark.range(0, 4_000_000, 1, 32)
                .select(F.col("id"), F.xxhash64("id").alias("h"))
                .localCheckpoint(eager=True)
            )
            ck.agg(F.count(F.lit(1))).write.format("noop").mode(
                "overwrite"
            ).save()
            release_checkpoint(ck)
            return
        if name == "--lloyd3":
            import bench

            bench._bench_lloyd(spark, sf_dir)
            return
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

    probe = _StageProbe(spark) if want_stages else None
    rows = []
    for i in range(n):
        if probe is not None:
            probe.mark()
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
        if probe is not None:
            rows[-1]["stages"] = probe.split()
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
