"""One-off r12 profiler for the dedup-gate per-batch probe cost.

Builds a corpus through CorpusIngestGate (N batches x B synthetic docs, the
stream_bench doc shape), then times the probe-path components for one
batch-sized novel frame at the final corpus size:

  read_s    — read_index(): listings + per-table union + bloom bit_or agg,
              forced with a count of each frame
  exact_s   — fingerprint semi-join alone
  band_s    — bloom prune + band join + signature scoring alone
  full_s    — the whole incremental_keep_list verdict plan (what the lane's
              probe_s measures)

Usage: python tools/gate_profile.py [n_batches] [rows_per_batch]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opc2mongodb_spark.operators.dedup import incremental_keep_list  # noqa: E402
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


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="gate_profile")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix="gate_profile_")
    try:
        gate = CorpusIngestGate(os.path.join(workdir, "corpus"), compact_after=16)
        t0 = time.perf_counter()
        for b in range(n_batches):
            gate.process_batch(_docs(spark, b * rows, rows, "w"), b)
        build_s = time.perf_counter() - t0
        print(f"build: {n_batches}x{rows} in {build_s:.1f}s "
              f"({n_batches * rows / build_s:.0f} rows/s)")

        probe = _docs(spark, 10**9, rows, "v")

        for rep in range(3):
            t0 = time.perf_counter()
            fps_c, sigs_c, bloom_c = gate.read_index(spark)
            for f_ in (fps_c, sigs_c, bloom_c):
                f_.count()
            read_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            fps_c, sigs_c, bloom_c = gate.read_index(spark)
            from opc2mongodb_spark.functions.text import fingerprint
            fp_b = probe.select("doc_id", fingerprint(F.col("text")).alias("fp"))
            fp_b.join(fps_c.select("fp").distinct(), "fp", "left_semi").count()
            exact_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            fps_c, sigs_c, bloom_c = gate.read_index(spark)
            incremental_keep_list(
                None, probe, "doc_id", "text",
                corpus_fps=fps_c, corpus_sigs=sigs_c, corpus_bloom=bloom_c,
            ).filter(F.col("verdict") == "keep").count()
            full_s = time.perf_counter() - t0
            print(f"rep{rep}: read_s={read_s:.2f} exact_s={exact_s:.2f} "
                  f"full_s={full_s:.2f}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
