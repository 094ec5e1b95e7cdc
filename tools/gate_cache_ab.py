"""A/B for the r12 within-run gate index cache (dedup_gate module
docstring): fixed-size batches through CorpusIngestGate.process_batch with
the cache enabled vs disabled. Two designs:

- ``on`` / ``off``: one arm per JVM (run the script once per arm) — the
  GATE_AB_r12 methodology, vulnerable to box drift between arms.
- ``interleave``: BOTH arms in one process, two gate instances fed the
  same batch data, processing order alternating per batch — drift hits
  both arms equally, so the per-batch delta is the code's.

Admitted-corpus row counts are recorded so the verdict-identity claim is
checkable from the artifact.

Usage: python tools/gate_cache_ab.py <on|off|interleave> <n_batches> <rows_per_batch> <out.json>
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opc2mongodb_spark.session import get_spark  # noqa: E402
from opc2mongodb_spark.streaming.dedup_gate import CorpusIngestGate  # noqa: E402


def _docs(spark, start: int, n: int, tag: str):
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit(tag), F.pmod(F.hash("id", i), F.lit(4000)).cast("string")
        ),
    )
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def _interleave(n_batches: int, rows: int, out: str) -> None:
    spark = get_spark(app_name="gate_cache_ab_interleave")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix="gate_cache_ab_il_")
    times: dict[str, list[float]] = {"on": [], "off": []}
    try:
        gates = {
            "on": CorpusIngestGate(
                os.path.join(workdir, "c_on"), compact_after=16
            ),
            "off": CorpusIngestGate(
                os.path.join(workdir, "c_off"),
                compact_after=16,
                cache_index=False,
            ),
        }
        for b in range(n_batches):
            df = _docs(spark, b * rows, rows, "w")
            order = ("on", "off") if b % 2 == 0 else ("off", "on")
            for arm in order:
                t0 = time.perf_counter()
                gates[arm].process_batch(df, b)
                times[arm].append(round(time.perf_counter() - t0, 3))
            print(
                f"batch {b}: on={times['on'][-1]}s off={times['off'][-1]}s",
                flush=True,
            )
        rows_by_arm = {
            a: gates[a].read_corpus(spark).count() for a in ("on", "off")
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    rec: dict = {
        "design": "interleave",
        "n_batches": n_batches,
        "rows_per_batch": rows,
        "corpus_rows": rows_by_arm,
    }
    for a in ("on", "off"):
        srt = sorted(times[a])
        rec[a] = {
            "per_batch_s": times[a],
            "p50": srt[len(srt) // 2],
            "warm_last10_mean": round(
                sum(times[a][-10:]) / min(10, len(times[a])), 3
            ),
            "total_s": round(sum(times[a]), 3),
        }
    deltas = [x - y for x, y in zip(times["on"], times["off"])]
    deltas.sort()
    rec["delta_on_minus_off_p50"] = round(deltas[len(deltas) // 2], 3)
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: rec[k] for k in (
        "corpus_rows", "delta_on_minus_off_p50")}))
    print(json.dumps({a: {k: rec[a][k] for k in ("p50", "warm_last10_mean", "total_s")} for a in ("on", "off")}))


def main() -> None:
    arm, n_batches, rows, out = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    assert arm in ("on", "off", "interleave")
    if arm == "interleave":
        _interleave(n_batches, rows, out)
        return
    spark = get_spark(app_name=f"gate_cache_ab_{arm}")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix=f"gate_cache_ab_{arm}_")
    per_batch = []
    try:
        gate = CorpusIngestGate(
            os.path.join(workdir, "corpus"),
            compact_after=16,
            cache_index=(arm == "on"),
        )
        for b in range(n_batches):
            df = _docs(spark, b * rows, rows, "w")
            t0 = time.perf_counter()
            gate.process_batch(df, b)
            per_batch.append(round(time.perf_counter() - t0, 3))
            print(f"batch {b}: {per_batch[-1]}s", flush=True)
        corpus_rows = gate.read_corpus(spark).count()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    srt = sorted(per_batch)
    rec = {
        "arm": arm,
        "n_batches": n_batches,
        "rows_per_batch": rows,
        "per_batch_s": per_batch,
        "p50": srt[len(srt) // 2],
        "p95": srt[min(len(srt) - 1, int(len(srt) * 0.95))],
        "warm_last10_mean": round(sum(per_batch[-10:]) / min(10, len(per_batch)), 3),
        "total_s": round(sum(per_batch), 3),
        "corpus_rows": corpus_rows,
    }
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "per_batch_s"}))


if __name__ == "__main__":
    main()
