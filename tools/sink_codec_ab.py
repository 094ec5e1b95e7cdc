"""One-off r13 A/B (r12 VERDICT item 7 / r12 ledger deferred item 3):
``spark.sql.parquet.compression.codec`` snappy (session default) vs zstd
on the upsert sink's OWN lane — CurrentValuesStore parquet backend,
per-batch partition-pruned merges. The gate's zstd adoption
(GATE_CODEC_AB_r12.json) does not transfer automatically: the sink's
write volume is bounded by live keys (touched server partitions are
REWRITTEN each batch, so the same bytes are re-compressed and re-read
every merge), a different read/write mix than the gate's append-only
index.

Interleaved design (the GATE_CODEC_AB methodology): one process, one
store instance per codec fed identical batch data, processing order
alternating per batch so box drift cancels. Records per-batch wall time,
final state rows (equality check) and on-disk bytes.

Usage: python tools/sink_codec_ab.py <n_batches> <rows_per_batch> <n_servers> <out.json>
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
from opc2mongodb_spark.streaming.sinks import CurrentValuesStore  # noqa: E402

CODEC_KEY = "spark.sql.parquet.compression.codec"


def _batch(spark, b: int, rows: int, n_servers: int):
    """Deterministic micro-batch: rows cycle over (server, tag) keys with a
    monotonically growing timestamp, ~25% of keys re-touched per batch —
    the upsert steady state (most writes update existing keys)."""
    return spark.range(rows).select(
        F.concat(F.lit("srv"), (F.col("id") % n_servers).cast("string")).alias(
            "server"
        ),
        F.concat(
            F.lit("tag"), ((F.col("id") * 7 + b) % (rows * 4)).cast("string")
        ).alias("tag"),
        (F.lit(b * 1_000_000) + F.col("id")).alias("serverTimestamp"),
        (F.col("id").cast("double") * 1.5 + b).alias("value"),
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
    n_batches, rows, n_servers, out = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    spark = get_spark(app_name="sink_codec_ab")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    workdir = tempfile.mkdtemp(prefix="sink_codec_ab_")
    codecs = ("snappy", "zstd")
    times: dict[str, list[float]] = {c: [] for c in codecs}
    try:
        stores = {
            c: CurrentValuesStore(
                os.path.join(workdir, f"s_{c}"), backend="parquet"
            )
            for c in codecs
        }
        for b in range(n_batches):
            order = codecs if b % 2 == 0 else codecs[::-1]
            df = _batch(spark, b, rows, n_servers).persist()
            df.count()
            for c in order:
                spark.conf.set(CODEC_KEY, c)
                spark.sparkContext.setJobDescription(
                    f"sink_codec_ab batch={b} codec={c}"
                )
                t0 = time.perf_counter()
                stores[c].merge_batch(df)
                times[c].append(round(time.perf_counter() - t0, 3))
            df.unpersist()
        spark.conf.unset(CODEC_KEY)
        state = {
            c: sorted(
                (r.server, r.tag, r.serverTimestamp, r.value)
                for r in stores[c].read(spark).collect()
            )
            for c in codecs
        }
        identical = state["snappy"] == state["zstd"]
        record = {
            "metric": "sink_codec_ab",
            "n_batches": n_batches,
            "rows_per_batch": rows,
            "n_servers": n_servers,
            "interleaved": True,
            "per_batch_sec": times,
            "p50": {
                c: sorted(v)[len(v) // 2] for c, v in times.items()
            },
            "total_sec": {c: round(sum(v), 3) for c, v in times.items()},
            "state_rows": {c: len(state[c]) for c in codecs},
            "state_identical": identical,
            "disk_bytes": {
                c: _du(os.path.join(workdir, f"s_{c}")) for c in codecs
            },
        }
        with open(out, "w") as f:
            f.write(json.dumps(record, separators=(",", ":")) + "\n")
        print(json.dumps({k: record[k] for k in (
            "p50", "total_sec", "disk_bytes", "state_identical")}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
