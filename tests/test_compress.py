"""Swinging-door trending compression (operators/compress.py).

SDT is sequential per signal, so (per SURVEY §5) it is verified by golden
cases with hand-computed archives plus a reconstruction-bound property test
— the same mechanism as the streaming goldens, not the DuckDB oracle.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opc2mongodb_spark.operators.compress import (
    _sdt_compress,
    reconstruct_error,
    swinging_door,
)


def _sig(spark, points, key="u"):
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, key, t0 + timedelta(seconds=10 * i), float(v))
            for i, v in enumerate(points)
        ],
        ["event_id", "tag", "ts", "value"],
    )


def _archived(df):
    return [r.value for r in df.orderBy("ts").collect()]


def test_straight_line_compresses_to_endpoints(spark):
    df = _sig(spark, [0, 1, 2, 3, 4, 5])
    out = swinging_door(df, ["tag"], "ts", "value", 0.5, "event_id")
    assert _archived(out) == [0.0, 5.0]


def test_step_change_archives_the_corner(spark):
    # flat then jump: the door closes at the jump; the corner point (last
    # flat sample) must be archived so the reconstruction keeps the edge.
    df = _sig(spark, [1, 1, 1, 10, 10, 10])
    out = swinging_door(df, ["tag"], "ts", "value", 0.5, "event_id")
    vals = _archived(out)
    assert vals[0] == 1.0 and vals[-1] == 10.0
    assert 1.0 in vals[1:-1]  # the corner survived


def test_zigzag_beyond_dev_keeps_everything(spark):
    pts = [0, 10, 0, 10, 0]
    df = _sig(spark, pts)
    out = swinging_door(df, ["tag"], "ts", "value", 1.0, "event_id")
    assert len(_archived(out)) == len(pts)


def test_zero_dev_drops_only_exact_collinear(spark):
    df = _sig(spark, [0, 1, 2, 5])
    out = swinging_door(df, ["tag"], "ts", "value", 0.0, "event_id")
    assert _archived(out) == [0.0, 2.0, 5.0]


def test_single_point_and_negative_dev(spark):
    df = _sig(spark, [7])
    out = swinging_door(df, ["tag"], "ts", "value", 1.0, "event_id")
    assert _archived(out) == [7.0]
    with pytest.raises(ValueError):
        swinging_door(df, ["tag"], "ts", "value", -1.0)


def test_duplicate_timestamps_within_band_collapse(spark):
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (0, "u", t0, 1.0),
            (1, "u", t0, 1.2),  # same ts, inside dev of anchor -> dropped
            (2, "u", t0, 9.0),  # same ts, outside dev -> archived
            (3, "u", t0 + timedelta(seconds=10), 9.0),
        ],
        ["event_id", "tag", "ts", "value"],
    )
    out = swinging_door(df, ["tag"], "ts", "value", 0.5, "event_id")
    assert _archived(out) == [1.0, 9.0, 9.0]


def test_groups_are_independent(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    for k, pts in (("a", [0, 1, 2, 3]), ("b", [5, 0, 5, 0])):
        rows += [
            (f"{k}{i}", k, t0 + timedelta(seconds=10 * i), float(v))
            for i, v in enumerate(pts)
        ]
    df = spark.createDataFrame(rows, ["event_id", "tag", "ts", "value"])
    out = swinging_door(df, ["tag"], "ts", "value", 0.5, "event_id")
    got = {
        k: [r.value for r in out.filter(out.tag == k).orderBy("ts").collect()]
        for k in ("a", "b")
    }
    assert got["a"] == [0.0, 3.0]
    assert got["b"] == [5.0, 0.0, 5.0, 0.0]


def test_reconstruction_error_audit_on_events(spark, sf_dir):
    """End-to-end on real data: compress the opc signal, then the columnar
    reconstruction audit proves every dropped point interpolates back
    within the SDT bound (2x comp_dev worst case; see operator docstring)."""
    from pyspark.sql import functions as F

    from opc2mongodb_spark.opcmodel import events_as_opc_values
    from opc2mongodb_spark.sources.tables import load_table

    dev = 25.0
    opc = events_as_opc_values(load_table(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    arch = swinging_door(
        opc, ["server", "tag"], "sourceTimestamp", "doubleValue", dev, "event_id"
    )
    n_raw = opc.count()
    n_arch = arch.count()
    assert 0 < n_arch < n_raw  # it actually compressed
    err = reconstruct_error(
        opc, arch, ["server", "tag"], "sourceTimestamp", "doubleValue"
    )
    worst = err.agg(F.max("max_err").alias("m")).collect()[0].m
    assert worst <= 2 * dev + 1e-9, worst


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    st.floats(min_value=0.01, max_value=20),
)
def test_sdt_pure_bound_property(points, dev):
    """Pure-python property: linear interpolation between archived indices
    reconstructs every point within 2*dev (the SDT worst-case bound), and
    first/last are always kept."""
    ts = [i * 1000 for i in range(len(points))]
    keep = list(_sdt_compress(ts, points, dev))
    assert keep[0] == 0 and keep[-1] == len(points) - 1
    assert keep == sorted(set(keep))
    for a, b in zip(keep, keep[1:]):
        for j in range(a, b + 1):
            frac = (ts[j] - ts[a]) / (ts[b] - ts[a])
            interp = points[a] + (points[b] - points[a]) * frac
            assert abs(points[j] - interp) <= 2 * dev + 1e-6


def test_sdt_stream_matches_batch_on_decided_prefix(spark, tmp_path, state_provider):
    """The streaming gate runs the SAME kernel as the batch operator: the
    streamed archive must equal the batch archive minus the undecided live
    tail, and a door closure in batch 2 must emit the point HELD from
    batch 1 (state crossed the micro-batch boundary). NULL values never
    move the doors."""
    from datetime import datetime

    from pyspark.sql import types as T

    from opc2mongodb_spark.streaming.stateful import sdt_stream

    schema = T.StructType(
        [
            T.StructField("server", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("serverTimestamp", T.TimestampType()),
        ]
    )

    def ts(s):
        return datetime.fromisoformat(f"2024-01-01 10:00:{s:02d}")

    b1 = [
        ("t1", 0.0, ts(0)),   # first -> archived immediately
        ("t1", None, ts(5)),  # bad sample: ignored
        ("t1", 1.0, ts(10)),  # on the line -> held
        ("t1", 2.0, ts(20)),  # still on the line -> held
        ("t2", 5.0, ts(0)),   # 1-point signal -> archived
    ]
    b2 = [
        ("t1", 10.0, ts(30)),  # doors close -> the HELD (ts 20, 2.0) archives
    ]

    def rows(batch):
        return spark.createDataFrame(
            [("s1", tag, v, t) for tag, v, t in batch], schema
        )

    src = tmp_path / "src"
    src.mkdir()
    rows(b1).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        sdt_stream(stream, comp_dev=0.5)
        .writeStream.format("memory")
        .queryName("sdt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        after_b1 = {
            (r.tag, r.serverTimestamp, r.doubleValue)
            for r in spark.sql("select * from sdt").collect()
        }
        rows(b2).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        streamed = {
            (r.tag, r.serverTimestamp, r.doubleValue)
            for r in spark.sql("select * from sdt").collect()
        }
    finally:
        q.stop()

    assert after_b1 == {("t1", ts(0), 0.0), ("t2", ts(0), 5.0)}
    # the cross-boundary closure emitted batch-1's held point
    assert streamed == after_b1 | {("t1", ts(20), 2.0)}

    # batch twin over the full signal = streamed archive + undecided tails
    from opc2mongodb_spark.operators.compress import swinging_door

    full = rows(b1 + b2).filter("doubleValue is not null")
    batch = {
        (r.tag, r.serverTimestamp, r.doubleValue)
        for r in swinging_door(
            full, ["tag"], "serverTimestamp", "doubleValue", 0.5
        ).collect()
    }
    assert batch == streamed | {("t1", ts(30), 10.0)}


def test_sdt_stream_state_survives_query_restart(
    spark, tmp_path, state_provider
):
    """Checkpoint recovery for the SDT gate: stop the query, start a FRESH
    one on the same checkpoint, feed the closing point — the held point
    from before the restart must be archived by the resumed query (kernel
    state reloaded from the state store, not reset)."""
    from datetime import datetime

    from pyspark.sql import types as T

    from opc2mongodb_spark.streaming.stateful import sdt_stream

    schema = T.StructType(
        [
            T.StructField("server", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("serverTimestamp", T.TimestampType()),
        ]
    )

    def ts(s):
        return datetime.fromisoformat(f"2024-01-01 10:00:{s:02d}")

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def run(batch, name):
        spark.createDataFrame(
            [("s1", "t1", v, t) for v, t in batch], schema
        ).coalesce(1).write.parquet(str(src / name))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = (
            sdt_stream(stream, comp_dev=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            return {
                (r.serverTimestamp, r.doubleValue)
                for r in spark.read.parquet(out).collect()
            }
        finally:
            q.stop()

    first = run([(0.0, ts(0)), (1.0, ts(10)), (2.0, ts(20))], "b1")
    assert first == {(ts(0), 0.0)}  # line held; only the start archived
    # FRESH query object, same checkpoint: the jump must archive the HELD
    # (ts 20, 2.0) that only exists in recovered state.
    second = run([(10.0, ts(30))], "b2")
    assert (ts(20), 2.0) in second, second
