"""Delta MERGE backend of ``CurrentValuesStore`` (r7 VERDICT #6).

delta-spark is not installed in this sandbox, so the whole module
skips-unless-importable — but wherever delta IS importable (a CI lane, a
real cluster) this runs a REAL ``MERGE`` through
``CurrentValuesStore(backend='delta')`` and asserts row-for-row parity
with the parquet staging-swap backend on the same batch sequence,
including the out-of-order/replay regression guard
(``whenMatched`` keeps the newer stored row).
"""

from __future__ import annotations

import datetime

import pytest

from opc2mongodb_spark.streaming.sinks import CurrentValuesStore, delta_available

pytestmark = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not importable in this env"
)


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta SQL extension + catalog — built here (not
    the shared fixture) because the extension must be set before the
    session starts."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-backend-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    try:
        from delta import configure_spark_with_delta_pip

        builder = configure_spark_with_delta_pip(builder)
    except ImportError:
        pass
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


def _batch(spark, data):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("server", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("serverTimestamp", T.TimestampType()),
        ]
    )
    def ts(s):
        return datetime.datetime(2024, 1, 1, 10, 0, s)

    return spark.createDataFrame(
        [(srv, tag, v, ts(sec)) for srv, tag, v, sec in data], schema
    )


BATCHES = [
    # initial state
    [("A", "t1", 1.0, 0), ("A", "t2", 5.0, 0), ("B", "t3", 7.0, 0)],
    # newer update for t1, new key t4
    [("A", "t1", 2.0, 10), ("B", "t4", 8.0, 1)],
    # REPLAYED/out-of-order batch: older t1 must NOT regress state;
    # equal-timestamp t3 must take the batch value (ties: batch wins)
    [("A", "t1", 1.5, 5), ("B", "t3", 7.5, 0)],
]


def _state(spark, store):
    df = store.read(spark)
    return sorted(
        (r.server, r.tag, r.doubleValue, r.serverTimestamp)
        for r in df.collect()
    )


def test_delta_merge_matches_parquet_backend(delta_spark, tmp_path):
    delta_store = CurrentValuesStore(
        str(tmp_path / "delta"), key_cols=("server", "tag"), backend="delta"
    )
    pq_store = CurrentValuesStore(
        str(tmp_path / "pq"), key_cols=("server", "tag"), backend="parquet"
    )
    for data in BATCHES:
        delta_store.merge_batch(_batch(delta_spark, data))
        pq_store.merge_batch(_batch(delta_spark, data))

    got = _state(delta_spark, delta_store)
    assert got == _state(delta_spark, pq_store)
    by_key = {(s, t): (v, ts) for s, t, v, ts in got}
    assert by_key[("A", "t1")][0] == 2.0  # replay did not regress
    assert by_key[("B", "t3")][0] == 7.5  # tie: batch wins
    assert len(by_key) == 5


def test_delta_backend_requires_import():
    # trivially true here (module-level skip guarantees delta exists);
    # asserts the constructor accepts the explicit backend when it does.
    store = CurrentValuesStore("/tmp/x", backend="delta")
    assert store.backend == "delta"
