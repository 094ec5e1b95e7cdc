"""Engine facade + stream-stream join + config parser edge cases."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opc2mongodb_spark.engine import Engine
from opc2mongodb_spark.sources.config import parse_config

CONF = os.path.join(os.path.dirname(__file__), "fixtures", "opcsim.conf")


def test_engine_batch_surfaces(spark, sf_dir):
    eng = Engine(spark)
    assert eng.table("nation", sf_dir).count() == 25
    assert (
        eng.sql("SELECT count(*) AS n FROM lineitem", sf_dir).first().n == 6000
    )
    assert eng.query("q_topk", sf_dir).count() == 10


def test_engine_ingest_roundtrip(spark, tmp_path):
    eng = Engine(spark)
    q, store = eng.ingest(
        CONF,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        sweeps_per_batch=3,
        max_sweeps=6,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    cv = eng.current_values(str(tmp_path / "state"))
    assert cv is not None and cv.count() == 9
    assert eng.current_values(str(tmp_path / "missing")) is None


def test_config_parser_edge_cases():
    topo = parse_config(
        """
# comment only

Orphan.Tag.Before.Server ,Double ,Y ,X.Y       # tag before any server: skipped
mongodb://localhost:27017/db
opc.tcp://h:1, ,
ns=1;s=A ,Double ,Y
not_a_tag_line
"""
    )
    assert topo.mongo_url == "mongodb://localhost:27017/db"
    assert len(topo.servers) == 1
    srv = topo.servers[0]
    assert srv.read_period == 10  # blank → default
    assert srv.name == "opc.tcp://h:1"  # blank name → url (Program.cs default)
    assert len(srv.entries) == 1
    assert srv.entries[0].mongo_tag == "ns=1;s=A"  # blank tag → path


def test_stream_stream_join(spark, tmp_path):
    """H6: interval join of two telemetry streams on tag."""
    from opc2mongodb_spark.streaming.pipeline import correlate_streams

    schema = T.StructType(
        [
            T.StructField("tag", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("serverTimestamp", T.TimestampType()),
        ]
    )

    def write(dirname, rows):
        spark.createDataFrame(
            [(t, v, datetime.fromisoformat(ts)) for t, v, ts in rows], schema
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / dirname))

    write("left", [("t1", 1.0, "2024-01-01 10:00:00"), ("t2", 2.0, "2024-01-01 10:00:00")])
    write(
        "right",
        [
            ("t1", 10.0, "2024-01-01 10:01:00"),   # within band
            ("t1", 99.0, "2024-01-01 10:05:00"),   # outside 2-minute band
            ("t3", 7.0, "2024-01-01 10:00:30"),    # no matching left key
        ],
    )
    left = spark.readStream.schema(schema).parquet(str(tmp_path / "left"))
    right = spark.readStream.schema(schema).parquet(str(tmp_path / "right"))
    q = (
        correlate_streams(left, right)
        .writeStream.format("memory")
        .queryName("correlated")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from correlated").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tag, r.left_value, r.right_value) == ("t1", 1.0, 10.0)


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """r8 H6 extension: the left-outer interval join holds an unmatched
    left row in state and emits it with a NULL right side only once both
    watermarks prove no in-band right row can still arrive — the "value
    with no alarm in its window" detector. The null emission must happen
    under normal watermark advance (later batches), not at stream end."""
    from opc2mongodb_spark.streaming.pipeline import correlate_streams

    schema = T.StructType(
        [
            T.StructField("tag", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("serverTimestamp", T.TimestampType()),
        ]
    )

    def write(dirname, rows):
        spark.createDataFrame(
            [(t, v, datetime.fromisoformat(ts)) for t, v, ts in rows], schema
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / dirname))

    # batch 1: t1 matches in-band; t2 has NO right row at all
    write("left", [("t1", 1.0, "2024-01-01 10:00:00"),
                   ("t2", 2.0, "2024-01-01 10:00:00")])
    write("right", [("t1", 10.0, "2024-01-01 10:01:00")])
    left = spark.readStream.schema(schema).parquet(str(tmp_path / "left"))
    right = spark.readStream.schema(schema).parquet(str(tmp_path / "right"))
    q = (
        correlate_streams(left, right, how="left_outer")
        .writeStream.format("memory")
        .queryName("outer_corr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r.tag, r.left_value, r.right_value)
            for r in spark.sql("select * from outer_corr").collect()
        }
        # t2's window (10:00 + 2m band + 30s delay) is not provably
        # closed yet — only the matched pair may have emitted
        assert ("t2", 2.0, None) not in got1

        # batch 2 advances BOTH watermarks past t2's close; batch 3
        # gives the engine the follow-up micro-batch in which outer
        # results are flushed
        write("left", [("t9", 9.0, "2024-01-01 11:00:00")])
        write("right", [("t9", 90.0, "2024-01-01 11:00:00")])
        q.processAllAvailable()
        write("left", [("t9", 9.5, "2024-01-01 11:30:00")])
        write("right", [("t9", 95.0, "2024-01-01 11:30:00")])
        q.processAllAvailable()
        got = {
            (r.tag, r.left_value, r.right_value)
            for r in spark.sql("select * from outer_corr").collect()
        }
    finally:
        q.stop()
    assert ("t1", 1.0, 10.0) in got
    assert ("t2", 2.0, None) in got, got  # the watermark-gated null row
    assert ("t9", 9.0, 90.0) in got


def test_mongo_document_shape(spark, sf_dir):
    """Sink payload parity with Program.cs:1162-1172: 8 fields, per-server
    collection routing, tag as key."""
    import json

    from opc2mongodb_spark.opcmodel import events_as_opc_values
    from opc2mongodb_spark.operators.last_value import last_value_per_key
    from opc2mongodb_spark.sources.tables import load_table
    from opc2mongodb_spark.streaming.sinks import to_mongo_documents

    opc = events_as_opc_values(load_table(spark, sf_dir, "events")).drop("event_id")
    latest = last_value_per_key(opc, ["server", "tag"], "serverTimestamp")
    docs = to_mongo_documents(latest).collect()
    assert len(docs) == latest.count()
    d = json.loads(docs[0].doc_json)
    assert set(d) == {
        "tag", "dataType", "doubleValue", "boolValue", "stringValue",
        "sourceTimestamp", "serverTimestamp", "quality",
    }
    assert docs[0].collection.startswith("server_")
    assert docs[0].key == d["tag"]


def test_source_format_roundtrip_json_csv(spark, sf_dir, tmp_path):
    """Source breadth: the catalog tables survive JSONL and CSV round-trips
    with schema enforcement — same rows either way (nation is small and has
    all base types)."""
    from pyspark.sql import functions as F

    from opc2mongodb_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    expected = sorted(tuple(r) for r in n.collect())

    jdir = str(tmp_path / "nation_json")
    n.write.mode("overwrite").json(jdir)
    back_j = spark.read.schema(n.schema).json(jdir)
    assert sorted(tuple(r) for r in back_j.collect()) == expected

    cdir = str(tmp_path / "nation_csv")
    n.write.mode("overwrite").option("header", True).csv(cdir)
    back_c = spark.read.schema(n.schema).option("header", True).csv(cdir)
    assert sorted(tuple(r) for r in back_c.collect()) == expected


def test_engine_curate_facade(spark, sf_dir):
    """Engine.curate runs the composed curation pipeline over the
    documents table and returns the (kept, stats) pair."""
    eng = Engine(spark)
    res = eng.curate(sf_dir, per_stratum_cap=10)
    stages = [r.stage for r in res.stats.orderBy("stage").collect()]
    assert set(stages) == {
        "input", "quality_lang", "exact_dedup", "near_dedup", "stratum_cap"
    }
    assert res.kept.count() <= res.stats.filter(
        F.col("stage") == "input"
    ).first().rows


def test_experiment_readout_matches_registered_queries(spark, sf_dir):
    """pipelines.experiment_readout is the COMPOSITION of the oracle-
    checked experiment queries, so its one-row output must agree with
    each stage run standalone: chi2/arm counts vs q_srm_check (same
    'srm:' seed), adjusted means vs q_cuped_adjusted (same 'cuped:'
    seed), and var/MDE vs q_power_analysis (per-user total metric)."""
    from opc2mongodb_spark.pipelines import experiment_readout
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    ro = experiment_readout(ev, seed="srm:").collect()[0]
    srm = REGISTRY["q_srm_check"].build(spark, sf_dir).collect()[0]
    assert (ro.n_treatment, ro.n_control) == (srm.n_t, srm.n_c)
    assert ro.chi2_stat == srm.chi2_stat
    assert ro.srm_alarm == srm.srm_alarm

    power = REGISTRY["q_power_analysis"].build(spark, sf_dir).collect()[0]
    assert ro.n_users == power.n_users
    assert ro.n_per_arm == power.n_per_arm
    assert ro.var_metric == power.var_metric
    assert ro.mde_abs == power.mde_abs

    ro2 = experiment_readout(ev, seed="cuped:").collect()[0]
    cuped = {
        r.arm: r
        for r in REGISTRY["q_cuped_adjusted"].build(spark, sf_dir).collect()
    }
    # the registered query renders %.9e; the readout returns raw doubles —
    # compare through the same rendering
    assert f"{ro2.mean_adj_treatment:.9e}" == cuped["treatment"].mean_post_adj
    assert f"{ro2.mean_adj_control:.9e}" == cuped["control"].mean_post_adj
    assert f"{ro2.mean_post_treatment:.9e}" == cuped["treatment"].mean_post
    assert (ro2.n_treatment, ro2.n_control) == (
        cuped["treatment"].n_users,
        cuped["control"].n_users,
    )


def test_user_features_matches_registered_query(spark, sf_dir):
    """pipelines.user_features IS q_user_feature_table's frame — the
    exported feature-store contract must stay bitwise in lock-step with
    the oracle-checked query."""
    from opc2mongodb_spark.pipelines import user_features
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = {r.user_id: r for r in user_features(ev).collect()}
    b = {
        r.user_id: r
        for r in REGISTRY["q_user_feature_table"].build(spark, sf_dir).collect()
    }
    assert a.keys() == b.keys()
    for uid in a:
        assert a[uid] == b[uid], (a[uid], b[uid])


def test_monitor_readout_matches_independent_duckdb(spark, sf_dir):
    """Cross-check pipelines.monitor_readout against an INDEPENDENT
    DuckDB derivation of the same three statistics (naive global-window
    KS, naive correlated-subquery PSI bins, direct contingency chi2) on
    the same parquet — the experiment_readout discipline applied to the
    drift suite.  Counts and the KS distance (a ratio of exact integer
    products) must match exactly; PSI/chi2 within 1e-9 (their pinned
    sums are exact, the tolerance covers libm ln edges in the
    independent derivation)."""
    import duckdb

    from opc2mongodb_spark.oracle import duckdb_connect
    from opc2mongodb_spark.pipelines import monitor_readout
    from opc2mongodb_spark.sources.tables import load_table

    got = monitor_readout(load_table(spark, sf_dir, "events")).collect()[0]

    con = duckdb_connect(sf_dir)
    exp = con.execute(
        """
WITH b AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
),
f AS (
    SELECT event_type, event_id, value,
           CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END AS i1,
           CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END AS i2
    FROM events CROSS JOIN b
),
v AS (SELECT * FROM f WHERE value IS NOT NULL),
nn AS (SELECT CAST(sum(i1) AS BIGINT) AS n1, CAST(sum(i2) AS BIGINT) AS n2
       FROM v),
u AS (SELECT value AS x, sum(i1) AS a, sum(i2) AS bb FROM v GROUP BY value),
cum AS (
    SELECT sum(a) OVER w AS cu1, sum(bb) OVER w AS cu2
    FROM u WINDOW w AS (ORDER BY x
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ks AS (
    SELECT max(abs(cu1 * nn.n2 - cu2 * nn.n1)) AS num FROM cum, nn
),
ref AS (SELECT value AS x, event_id FROM v WHERE i1 = 1),
cur AS (SELECT value AS x FROM v WHERE i2 = 1),
ranked AS (SELECT x, row_number() OVER (ORDER BY x, event_id) AS i
           FROM ref),
edges AS (
    SELECT x AS e FROM ranked, nn
    WHERE i IN (SELECT CAST(ceil(k * n3.n1 / 10.0) AS BIGINT)
                FROM generate_series(1, 9) AS g(k), nn AS n3)
),
b1 AS (SELECT 1 + (SELECT count(*) FROM edges WHERE e < r.x) AS bin
       FROM ref r),
b2 AS (SELECT 1 + (SELECT count(*) FROM edges WHERE e < c.x) AS bin
       FROM cur c),
spine AS (SELECT unnest(generate_series(1, 10)) AS bin),
counts AS (
    SELECT s.bin,
           (SELECT count(*) FROM b1 WHERE b1.bin = s.bin) AS c1,
           (SELECT count(*) FROM b2 WHERE b2.bin = s.bin) AS c2
    FROM spine s
),
psi AS (
    SELECT CAST(sum(CAST(
        ((c1 + 0.5) / (nn.n1 + 5.0) - (c2 + 0.5) / (nn.n2 + 5.0))
        * ln(((c1 + 0.5) / (nn.n1 + 5.0)) / ((c2 + 0.5) / (nn.n2 + 5.0)))
        AS DECIMAL(26,12))) AS DOUBLE) AS psi
    FROM counts, nn
),
mix AS (SELECT event_type, sum(i1) AS o1, sum(i2) AS o2 FROM f
        GROUP BY event_type),
mt AS (SELECT CAST(sum(o1) AS BIGINT) AS r1, CAST(sum(o2) AS BIGINT) AS r2
       FROM mix),
chi2 AS (
    SELECT CAST(sum(CAST(
        pow(o1 - (o1 + o2) * CAST(r1 AS DOUBLE) / (r1 + r2), 2)
            / ((o1 + o2) * CAST(r1 AS DOUBLE) / (r1 + r2))
        + pow(o2 - (o1 + o2) * CAST(r2 AS DOUBLE) / (r1 + r2), 2)
            / ((o1 + o2) * CAST(r2 AS DOUBLE) / (r1 + r2))
        AS DECIMAL(26,12))) AS DOUBLE) AS chi2
    FROM mix, mt
)
SELECT nn.n1, nn.n2,
       CAST(ks.num AS DOUBLE) / (CAST(nn.n1 AS DOUBLE) * nn.n2) AS ks_d,
       psi.psi, chi2.chi2
FROM nn, ks, psi, chi2
"""
    ).fetchone()

    assert got.n_ref == exp[0] and got.n_cur == exp[1], (got, exp)
    assert got.ks_d == exp[2], (got.ks_d, exp[2])
    assert abs(got.psi - exp[3]) < 1e-9, (got.psi, exp[3])
    assert abs(got.chi2_mix - exp[4]) < 1e-9, (got.chi2_mix, exp[4])
    # alarm columns are pure threshold compares on the same values
    assert got.ks_alarm == (got.ks_d > 0.1)
    assert got.psi_alarm == (got.psi > 0.2)
    assert got.mix_alarm == (got.chi2_mix > 9.488)
