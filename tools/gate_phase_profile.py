"""One-off r12 phase profiler: where does a dedup-gate micro-batch spend
its time?  Replays process_batch() step by step with timers around each
phase (same code path, same order — mirrors the r12 enrichment-checkpoint
shape of CorpusIngestGate.process_batch).

Lazy phases ("plan_*", "ckpt_plan") measure Catalyst/driver-side work
only; execution lands in the first action that consumes the plan (the
data write executes the dedup+probe plan up to the admitted checkpoint,
the index writes read the checkpoint back).

Usage: python tools/gate_phase_profile.py [n_batches] [rows_per_batch]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opc2mongodb_spark.operators.bloom import bloom_sketch  # noqa: E402
from opc2mongodb_spark.operators.dedup import (  # noqa: E402
    band_bloom_key,
    incremental_keep_list,
    minhash_band_rows,
    minhash_signatures,
)
from opc2mongodb_spark.functions.text import fingerprint  # noqa: E402
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


def timed_batch(gate: CorpusIngestGate, batch, batch_id: int) -> dict:
    spark = batch.sparkSession
    t = {}

    def mark(key, t0):
        t[key] = round(time.perf_counter() - t0, 3)

    sig_cols = [gate._sig_col(j) for j in range(gate.k)]

    # (1) enrichment checkpoint (lazy)
    t0 = time.perf_counter()
    sigs_b = minhash_signatures(batch, gate.id_col, gate.text_col, gate.k)
    enriched = batch.withColumn(
        gate._FP, fingerprint(F.col(gate.text_col))
    ).join(
        sigs_b.select(
            F.col(gate.id_col),
            *[F.col(f"mh{j}").alias(gate._sig_col(j)) for j in range(gate.k)],
        ),
        gate.id_col,
    ).localCheckpoint(eager=False)
    mark("plan_enrich", t0)

    # (2) within-batch exact dedup (lazy)
    t0 = time.perf_counter()
    keep_ids = (
        enriched.groupBy(gate._FP)
        .agg(F.min(gate.id_col).alias(gate.id_col))
        .select(gate.id_col)
    )
    kept = enriched.join(keep_ids, gate.id_col, "left_semi")
    mark("plan_exact", t0)

    # (3) repair + index read + probe plan
    t0 = time.perf_counter()
    gate.repair_index(spark, exclude_batch=batch_id)
    mark("repair", t0)

    t0 = time.perf_counter()
    index = gate.read_index(spark, exclude_batch=batch_id)
    mark("read_index_plan", t0)

    if index is not None:
        t0 = time.perf_counter()
        fps_c, sigs_c, bloom_c = index
        verdicts = incremental_keep_list(
            None, kept, gate.id_col, gate.text_col,
            k=gate.k, threshold=gate.threshold,
            corpus_fps=fps_c, corpus_sigs=sigs_c, corpus_bloom=bloom_c,
            batch_fps=kept.select(
                F.col(gate.id_col), F.col(gate._FP).alias("fp")
            ),
            batch_sigs=kept.select(
                F.col(gate.id_col),
                *[
                    F.col(gate._sig_col(j)).alias(f"mh{j}")
                    for j in range(gate.k)
                ],
            ),
        )
        kept = kept.join(
            verdicts.filter(F.col("verdict") == "keep").select(gate.id_col),
            gate.id_col, "left_semi",
        )
        mark("plan_probe", t0)

    t0 = time.perf_counter()
    kept = kept.localCheckpoint(eager=False)
    mark("ckpt_plan", t0)

    # (4) the four writes — write_data executes the whole dedup+probe plan
    t0 = time.perf_counter()
    gate._swap_in(
        kept.drop(gate._FP, *sig_cols), gate.corpus_dir, batch_id, "data"
    )
    mark("write_data", t0)

    fps = kept.select(F.col(gate.id_col), F.col(gate._FP).alias("fp"))
    sigs = kept.select(
        F.col(gate.id_col),
        *[F.col(gate._sig_col(j)).alias(f"mh{j}") for j in range(gate.k)],
    )
    bloom = bloom_sketch(
        minhash_band_rows(sigs, gate.id_col, gate.k).select(
            band_bloom_key().alias("_bkey")
        ),
        "_bkey",
    )
    for table, frame in (("fps", fps), ("sigs", sigs), ("bloom", bloom)):
        t0 = time.perf_counter()
        gate._swap_in(frame, gate._index_dir(table), batch_id, table)
        mark(f"write_{table}", t0)

    t0 = time.perf_counter()
    if gate.compact_after is not None:
        gate.compact_index(spark, before_batch=batch_id)
    mark("compact", t0)
    t["TOTAL"] = round(sum(t.values()), 3)
    return t


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="gate_phase_profile")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix="gate_phase_")
    try:
        gate = CorpusIngestGate(os.path.join(workdir, "corpus"), compact_after=16)
        for b in range(n_batches):
            t = timed_batch(gate, _docs(spark, b * rows, rows, "w"), b)
            print(f"batch {b}: {t}", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
