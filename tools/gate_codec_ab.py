"""One-off r12 A/B: ``spark.sql.parquet.compression.codec`` (the gate's
data + index parquet writes, default snappy) vs zstd, on the dedup-gate
ingest lane (guide §6: output file compression is a CPU-vs-bytes trade —
measure, don't assume; the shuffle-codec A/B does not transfer because the
gate is write-heavy, not shuffle-heavy).

Interleaved design: one process, one gate instance per codec fed the same
batch data, processing order alternating per batch so box drift hits both
arms equally. The codec is a mutable SQL conf, set immediately before
each arm's batch. Records per-batch wall time, admitted corpus rows
(verdict-identity check), and each corpus dir's total on-disk bytes (the
ratio side of the trade).

Usage: python tools/gate_codec_ab.py <codecA> <codecB> <n_batches> <rows_per_batch> <out.json>
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


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    codec_a, codec_b, n_batches, rows, out = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
        sys.argv[5],
    )
    spark = get_spark(app_name=f"gate_codec_ab_{codec_a}_vs_{codec_b}")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix="gate_codec_ab_")
    times: dict[str, list[float]] = {codec_a: [], codec_b: []}
    disk: dict[str, int] = {}
    rows_by: dict[str, int] = {}
    try:
        gates = {
            c: CorpusIngestGate(
                os.path.join(workdir, f"c_{c}"), compact_after=16
            )
            for c in (codec_a, codec_b)
        }
        for b in range(n_batches):
            df = _docs(spark, b * rows, rows, "w")
            order = (codec_a, codec_b) if b % 2 == 0 else (codec_b, codec_a)
            for codec in order:
                spark.conf.set("spark.sql.parquet.compression.codec", codec)
                t0 = time.perf_counter()
                gates[codec].process_batch(df, b)
                times[codec].append(round(time.perf_counter() - t0, 3))
            print(
                f"batch {b}: "
                + " ".join(f"{c}={times[c][-1]}s" for c in (codec_a, codec_b)),
                flush=True,
            )
        for c in (codec_a, codec_b):
            rows_by[c] = gates[c].read_corpus(spark).count()
            disk[c] = _du(os.path.join(workdir, f"c_{c}"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    rec: dict = {
        "design": "interleave",
        "n_batches": n_batches,
        "rows_per_batch": rows,
        "corpus_rows": rows_by,
        "disk_bytes": disk,
    }
    for c in (codec_a, codec_b):
        srt = sorted(times[c])
        rec[c] = {
            "per_batch_s": times[c],
            "p50": srt[len(srt) // 2],
            "warm_last10_mean": round(
                sum(times[c][-10:]) / min(10, len(times[c])), 3
            ),
            "total_s": round(sum(times[c]), 3),
        }
    deltas = sorted(x - y for x, y in zip(times[codec_b], times[codec_a]))
    rec[f"delta_{codec_b}_minus_{codec_a}_p50"] = round(
        deltas[len(deltas) // 2], 3
    )
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: rec[k] for k in rec if k not in (codec_a, codec_b)}))
    print(
        json.dumps(
            {
                c: {k: rec[c][k] for k in ("p50", "warm_last10_mean", "total_s")}
                for c in (codec_a, codec_b)
            }
        )
    )


if __name__ == "__main__":
    main()
