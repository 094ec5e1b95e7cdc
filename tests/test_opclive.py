"""Live OPC UA connector seam (r7 VERDICT #3/#5): the ``opcua`` source must
be interface-identical to ``opcsim`` — same wire schema, same offset/restart
contract — with the value fetch swapped behind a client factory. No OPC
server or asyncua package exists in this sandbox, so the integration tests
drive the REPLAY client (a deterministic file-backed fake) and assert
bit-for-bit parity against opcsim goldens; the asyncua path is covered by
import-guard + auth-plumbing tests (reference: OPC2MongoDB/
Program.cs:96-736 UA session, :104-121 certificate auth)."""

from __future__ import annotations

import json
import os

import pytest

from opc2mongodb_spark.sources.config import parse_config_file
from opc2mongodb_spark.sources.opc import _render_value

CONF = os.path.join(os.path.dirname(__file__), "fixtures", "opcsim.conf")


def _write_replay(path: str, sweeps: int) -> str:
    """Replay .jsonl mirroring opcsim's deterministic per-sweep values, so
    live-reader-over-replay vs opcsim parity is exact by construction."""
    topo = parse_config_file(CONF)
    with open(path, "w", encoding="utf-8") as f:
        for srv in topo.servers:
            for sweep in range(sweeps):
                for e in srv.entries:
                    f.write(
                        json.dumps(
                            {
                                "server": srv.name,
                                "path": e.opc_path,
                                "sweep": sweep,
                                "raw": _render_value(
                                    e.opc_type, e.mongo_tag, sweep, e.subscribe
                                ),
                                "quality": 192,
                            }
                        )
                        + "\n"
                    )
    return path


def test_live_replay_batch_matches_opcsim(spark, tmp_path):
    """Wire-schema + value parity: the live reader over a replay file must
    produce byte-identical rows to opcsim for the same sweeps."""
    from opc2mongodb_spark.sources import opc, opc_live

    opc.register(spark)
    opc_live.register(spark)
    replay = _write_replay(str(tmp_path / "replay.jsonl"), 3)

    sim = (
        spark.read.format("opcsim")
        .option("config", CONF)
        .option("sweeps", 3)
        .load()
    )
    live = (
        spark.read.format("opcua")
        .option("config", CONF)
        .option("sweeps", 3)
        .option("replay", replay)
        .load()
    )
    assert live.schema == sim.schema
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, sim.collect())
    )


def test_live_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Offset-recovery parity (R10): the live reader inherits opcsim's
    monotonic sweep high-water mark — a restart with a fresh reader must
    resume exactly where the checkpoint stopped, no gaps, no dups."""
    from opc2mongodb_spark.sources import opc_live

    opc_live.register(spark)
    replay = _write_replay(str(tmp_path / "replay.jsonl"), 8)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(max_sweeps):
        stream = (
            spark.readStream.format("opcua")
            .option("config", CONF)
            .option("sweeps_per_batch", 2)
            .option("max_sweeps", max_sweeps)
            .option("replay", replay)
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

    run(4)
    run(8)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8 * 10  # 8 sweeps x 10 tags, exactly once
    keys = [(r.server, r.tag, r.serverTimestamp) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate rows after restart"


def test_replay_client_holds_values_and_fails_loudly(tmp_path):
    """Poll-cadence hold: a sweep miss falls back to the latest recorded
    sweep <= N; a tag absent from the replay raises instead of fabricating
    data."""
    from opc2mongodb_spark.sources.opc_live import ReplayClientFactory

    topo = parse_config_file(CONF)
    srv = topo.servers[0]
    replay = str(tmp_path / "replay.jsonl")
    with open(replay, "w", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {
                    "server": srv.name,
                    "path": srv.entries[0].opc_path,
                    "sweep": 0,
                    "raw": "42.0",
                }
            )
            + "\n"
        )
    client = ReplayClientFactory(srv, replay).connect()
    path = srv.entries[0].opc_path
    raw0, sts0, _, q0 = client.read_value(path, 0)
    raw2, sts2, _, _ = client.read_value(path, 2)
    assert raw0 == raw2 == "42.0" and q0 == 192  # held value
    assert sts2 > sts0  # timestamps still advance with the sweep
    with pytest.raises(KeyError):
        client.read_value("ns=1;s=NoSuchTag", 0)


def test_auth_posture_threaded_into_live_factories(tmp_path):
    """CERT/PASS from the .conf (Program.cs:104-121) must reach the live
    client factory verbatim — the r7 VERDICT #5 plumbing: ServerA carries
    its certificate + password, a cert-less UA server stays anonymous."""
    from opc2mongodb_spark.sources.opc_live import (
        AsyncuaClientFactory,
        OpcUaLiveDataSource,
    )

    conf = tmp_path / "ua_only.conf"
    conf.write_text(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://sim-a.local:48484, 10, ServerA, /certs/servera.pfx, s3cret\n"
        "ns=1;s=Plant.Line1.Temperature ,Double ,Y ,Plant.Line1.Temperature\n"
        "opc.tcp://sim-c.local:48484, 5, ServerC\n"
        "ns=1;s=Other.Tag ,Double ,N ,Other.Tag\n"
    )
    ds = OpcUaLiveDataSource(options={"config": str(conf)})
    topo, factories = ds._topo_and_factories()
    assert [type(f) for f in factories] == [AsyncuaClientFactory] * 2
    a, c = factories
    assert a.url == "opc.tcp://sim-a.local:48484"
    assert a.certificate_file == "/certs/servera.pfx"
    assert a.certificate_password == "s3cret"
    assert a.read_period == topo.servers[0].read_period == 10
    assert c.certificate_file == "" and c.certificate_password == ""


def test_live_mode_rejects_da_servers():
    """asyncua is UA-only; a DA server in live mode (the fixture's ServerB)
    is an explicit configuration error, never a silent wrong-protocol
    connection attempt (the reference's DA path is Windows COM,
    Program.cs:739-1143)."""
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    ds = OpcUaLiveDataSource(options={"config": CONF})
    with pytest.raises(ValueError, match="ServerB"):
        ds._topo_and_factories()


def test_asyncua_import_guard():
    """Constructing the factory is always safe; connect() without the lib
    raises ImportError pointing at the replay option (the delta_available
    pattern, streaming/sinks.py)."""
    from opc2mongodb_spark.sources.opc_live import (
        AsyncuaClientFactory,
        asyncua_available,
    )

    if asyncua_available():
        pytest.skip("asyncua installed — live path exercised elsewhere")
    topo = parse_config_file(CONF)
    factory = AsyncuaClientFactory(topo.servers[0])
    with pytest.raises(ImportError, match="replay"):
        factory.connect()


def test_replay_factories_selected_when_replay_option_set(tmp_path):
    from opc2mongodb_spark.sources.opc_live import (
        OpcUaLiveDataSource,
        ReplayClientFactory,
    )

    replay = _write_replay(str(tmp_path / "replay.jsonl"), 1)
    ds = OpcUaLiveDataSource(options={"config": CONF, "replay": replay})
    _, factories = ds._topo_and_factories()
    assert all(isinstance(f, ReplayClientFactory) for f in factories)


def test_live_replay_bridge_topology_end_to_end(spark, tmp_path):
    """The full reference topology over the LIVE seam: conf -> opcua
    (replay) stream -> coercion (raw_to_opc_values) -> CurrentValuesStore
    upsert. Final keyed state must equal a batch last-value replay of the
    same sweeps through OPCSIM — proving the live source composes with the
    whole downstream bridge exactly like the simulator (the
    test_streaming.py bridge golden, minus its restart machinery, which
    test_live_stream_restart_resumes_from_checkpoint covers for this
    source)."""
    from opc2mongodb_spark.opcmodel import raw_to_opc_values
    from opc2mongodb_spark.operators.last_value import last_value_per_key
    from opc2mongodb_spark.sources import opc, opc_live
    from opc2mongodb_spark.streaming.sinks import CurrentValuesStore

    opc.register(spark)
    opc_live.register(spark)
    replay = _write_replay(str(tmp_path / "replay.jsonl"), 6)
    store = CurrentValuesStore(str(tmp_path / "state"), backend="parquet")

    raw = (
        spark.readStream.format("opcua")
        .option("config", CONF)
        .option("sweeps_per_batch", 2)
        .option("max_sweeps", 6)
        .option("replay", replay)
        .load()
    )
    q = (
        raw_to_opc_values(raw)
        .writeStream.outputMode("append")
        .foreachBatch(store.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.server, r.tag): r for r in store.read(spark).collect()
    }
    sim = (
        spark.read.format("opcsim")
        .option("config", CONF)
        .option("sweeps", 6)
        .load()
    )
    expected = {
        (r.server, r.tag): r
        for r in last_value_per_key(
            raw_to_opc_values(sim), ["server", "tag"], "serverTimestamp"
        ).collect()
    }
    assert set(got) == set(expected) and len(got) == 9  # FunkyType dropped
    for k, row in got.items():
        e = expected[k]
        assert (
            row.doubleValue,
            row.boolValue,
            row.stringValue,
            row.serverTimestamp,
        ) == (e.doubleValue, e.boolValue, e.stringValue, e.serverTimestamp), k


def test_subscription_cache_push_then_poll_fallback():
    """R1 push semantics (Program.cs:126-444) bridged into the sweep
    reader: a DataChange notification overwrites the tag's cache slot and
    subsequent sweeps read it WITHOUT an RPC; tags with no notification
    yet fall back to a poll read (the reference reads initial values on
    subscribe too)."""
    import datetime

    from opc2mongodb_spark.sources.opc_live import (
        SubscriptionCache,
        _AsyncuaReadClient,
    )

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)

    class _GoodStatus:
        def is_good(self):
            return True

    class _DV:
        def __init__(self, val):
            class _V:
                Value = val

            self.Value = _V()
            self.SourceTimestamp = ts
            self.ServerTimestamp = ts
            self.StatusCode = _GoodStatus()

    class _FakeNode:
        def __init__(self, path):
            self._path = path
            self.reads = 0

        def __str__(self):
            return self._path

        def read_data_value(self):
            self.reads += 1
            return _DV(7.5)

    class _FakeClient:
        def __init__(self):
            self.nodes = {}
            self.disconnected = False

        def get_node(self, path):
            return self.nodes.setdefault(path, _FakeNode(path))

        def disconnect(self):
            self.disconnected = True

    cache = SubscriptionCache()
    fake = _FakeClient()
    client = _AsyncuaReadClient(fake, 10, cache)

    # no notification yet -> poll fallback issues exactly one RPC
    raw, sts, _, q = client.read_value("ns=1;s=T", 0)
    assert (raw, sts, q) == ("7.5", ts, 192)
    assert fake.nodes["ns=1;s=T"].reads == 1

    # push a notification (asyncua handler protocol) -> served from cache,
    # no further RPCs
    class _Item:
        Value = _DV(9.25)

    class _Data:
        monitored_item = _Item()

    cache.datachange_notification(fake.get_node("ns=1;s=T"), 9.25, _Data())
    for sweep in (1, 2, 3):
        raw, _, _, q = client.read_value("ns=1;s=T", sweep)
        assert raw == "9.25" and q == 192
    assert fake.nodes["ns=1;s=T"].reads == 1  # still just the one poll

    client.close()
    assert fake.disconnected


def test_live_factories_carry_subscribe_paths(tmp_path):
    """The .conf's SUBSCRIBE=Y tags (R1) reach the client factory so the
    live session can attach monitored items; poll-only tags do not."""
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    conf = tmp_path / "ua_only.conf"
    conf.write_text(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://sim-a.local:48484, 10, ServerA\n"
        "ns=1;s=Plant.Line1.Temperature ,Double ,Y ,Plant.Line1.Temperature\n"
        "ns=1;s=Plant.Line1.Pressure ,Float ,N ,Plant.Line1.Pressure\n"
        "ns=1;s=Plant.Line1.Running ,Boolean ,Y ,Plant.Line1.Running\n"
    )
    ds = OpcUaLiveDataSource(options={"config": str(conf)})
    _, factories = ds._topo_and_factories()
    assert factories[0].subscribe_paths == (
        "ns=1;s=Plant.Line1.Temperature",
        "ns=1;s=Plant.Line1.Running",
    )


def test_subscription_cache_keys_by_nodeid_string():
    """asyncua's str(Node) wraps the id ("Node(ns=1;s=...)"); the cache
    must key by NodeId.to_string() — the bare conf path the reader looks
    up — when the node exposes it, falling back to str() for fakes."""
    from opc2mongodb_spark.sources.opc_live import SubscriptionCache

    class _NodeId:
        def to_string(self):
            return "ns=1;s=Plant.Line1.Temperature"

    class _AsyncuaStyleNode:
        nodeid = _NodeId()

        def __str__(self):
            return "Node(NodeId(ns=1;s=Plant.Line1.Temperature))"

    cache = SubscriptionCache()
    cache.datachange_notification(_AsyncuaStyleNode(), 3.25, None)
    hit = cache.get("ns=1;s=Plant.Line1.Temperature")
    assert hit is not None and hit[0] == "3.25"
    assert cache.get("Node(NodeId(ns=1;s=Plant.Line1.Temperature))") is None
