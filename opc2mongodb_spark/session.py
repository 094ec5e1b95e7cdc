"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` but every setting is chosen to also be the
right default on a large multi-executor cluster reading ~100 TB:

- AQE on (runtime coalesce / skew-join splitting / plan re-optimization).
- UTC session timezone so timestamp semantics are engine- and host-independent
  (and match the DuckDB oracle, which reads parquet TIMESTAMP as naive UTC).
- Arrow enabled for any pandas-UDF path (the only sanctioned Python hot path).
- shuffle.partitions left to AQE coalescing from a modest initial value in
  local mode; on a real cluster this would be ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Streaming state-store provider for production-scale key spaces: the
# default HDFS-backed provider keeps every key in executor heap, which a
# 100 TB deployment's tag/user cardinality outgrows; RocksDB keeps state on
# local disk with incremental checkpoints. Bundled with Spark — no extra
# dependency. The stateful-gate goldens run on BOTH providers
# (tests/test_scale_patterns.py).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "opc2mongodb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points work under the driver harness and in tests. On a
    real cluster the caller simply passes ``master=None`` with a cluster
    ``spark.master`` already set in the environment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the driver IS the executor — size its heap for the
        # core count (default 1g OOMs under 32 concurrent spilling tasks).
        # Applies only at JVM launch; harmless no-op on an existing session.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # --- correctness-critical session semantics -------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: the 100 TB story ---------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- scan efficiency ------------------------------------------------
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # --- Python boundary: Arrow everywhere ------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # quieter driver logs in the harness
        .config("spark.ui.enabled", "false")
    )
    # deployment toggle: SPARK_GRAFT_STATE_STORE=rocksdb flips every
    # stateful streaming query in the session onto the RocksDB provider
    # (per-query override: spark.conf.set the providerClass before .start()).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
