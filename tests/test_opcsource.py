"""opcsim data source + config parser (R1/R2/R9 twins)."""

from __future__ import annotations

import os

from opc2mongodb_spark.sources.config import parse_config_file

CONF = os.path.join(os.path.dirname(__file__), "fixtures", "opcsim.conf")


def test_parse_config():
    topo = parse_config_file(CONF)
    assert topo.mongo_url.startswith("mongodb://")
    assert len(topo.servers) == 2
    a, b = topo.servers
    assert a.name == "ServerA" and a.is_ua and a.read_period == 10
    assert len(a.entries) == 6
    assert b.name == "ServerB" and not b.is_ua and b.read_period == 5
    # blank MONGO_TAG defaults to the OPC path (Program.cs:1283)
    status = next(e for e in b.entries if e.opc_path == "Channel1.Device1.Status")
    assert status.mongo_tag == "Channel1.Device1.Status"
    temp = next(e for e in a.entries if "Temperature" in e.opc_path)
    assert temp.subscribe


def test_batch_read(spark):
    from opc2mongodb_spark.sources.opc import register

    register(spark)
    df = (
        spark.read.format("opcsim")
        .option("config", CONF)
        .option("sweeps", 3)
        .load()
    )
    rows = df.collect()
    # 2 servers × (6 + 4 tags) × 3 sweeps
    assert len(rows) == 3 * 10
    assert {r.server for r in rows} == {"ServerA", "ServerB"}
    # deterministic: re-read gives identical data
    again = (
        spark.read.format("opcsim")
        .option("config", CONF)
        .option("sweeps", 3)
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_normalize_drops_unsupported(spark):
    from opc2mongodb_spark.opcmodel import raw_to_opc_values
    from opc2mongodb_spark.sources.opc import register

    register(spark)
    raw = (
        spark.read.format("opcsim")
        .option("config", CONF)
        .option("sweeps", 2)
        .load()
    )
    opc = raw_to_opc_values(raw)
    rows = opc.collect()
    # FunkyType tag dropped (READ UNSUPPORTED TYPE, Program.cs:718-720)
    assert len(rows) == 2 * (10 - 1)
    assert all(r.tag != "B.Device1.Weird" for r in rows)
    booleans = [r for r in rows if r.tag == "Plant.Line1.Running"]
    assert all(r.doubleValue in (0.0, 1.0) for r in booleans)
    dts = [r for r in rows if r.tag == "Plant.Line1.LastService"]
    assert all(r.boolValue is False for r in dts)  # Program.cs:432


def test_stream_two_microbatches(spark, tmp_path):
    from opc2mongodb_spark.sources.opc import register

    register(spark)
    stream = (
        spark.readStream.format("opcsim")
        .option("config", CONF)
        .option("sweeps_per_batch", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("opc_raw")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) from opc_raw").first()[0]
        q.processAllAvailable()
        n2 = spark.sql("select count(*) from opc_raw").first()[0]
    finally:
        q.stop()
    assert n1 >= 2 * 10  # at least one micro-batch of 2 sweeps × 10 tags
    assert n2 >= n1
    assert n1 % 10 == 0 and n2 % 10 == 0


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """R10: retry/reconnect = checkpoint + restart. A fresh reader instance
    must recover the high-water mark from the engine's replayed offsets —
    not reset to 0 and plan inverted/empty batch ranges — so the resumed
    stream continues exactly where the first run stopped, no gaps, no dups."""
    from opc2mongodb_spark.sources.opc import register

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(max_sweeps):
        stream = (
            spark.readStream.format("opcsim")
            .option("config", CONF)
            .option("sweeps_per_batch", 2)
            .option("max_sweeps", max_sweeps)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(4)   # first run drains sweeps [0, 4)
    run(8)   # restart with a FRESH reader instance; must resume at sweep 4

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8 * 10  # 8 sweeps x 10 tags, exactly once
    keys = [(r.server, r.tag, r.serverTimestamp) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate rows after restart"


def test_topology_df_surfaces_auth_posture(spark):
    """R9 CERT/PASS columns (Program.cs:104-121) surface in the queryable
    topology: UA servers with a certificate are auth_mode='certificate',
    DA servers are always anonymous. This is the live-connector swap-point
    contract — opcsim consumes the same rows."""
    from opc2mongodb_spark.sources.config import parse_config_file, topology_df

    rows = {r.server: r for r in topology_df(spark, CONF).collect()}
    a, b = rows["ServerA"], rows["ServerB"]
    assert a.protocol == "ua" and a.auth_mode == "certificate"
    assert a.certificate_file == "/certs/servera.pfx"
    assert a.read_period == 10 and a.n_tags == 6 and a.n_subscribed == 2
    assert b.protocol == "da" and b.auth_mode == "anonymous"
    assert b.certificate_file is None
    # and the password never leaves the parser into the queryable surface
    assert "certificate_password" not in rows["ServerA"].__fields__
    topo = parse_config_file(CONF)
    assert topo.servers[0].certificate_password == "s3cret"
