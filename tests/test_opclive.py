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


def _read_rows(reader, partition):
    """Flatten the reader's Arrow RecordBatch yields (r11 boundary) back to
    row tuples for per-field assertions."""
    out = []
    for batch in reader.read(partition):
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        out.extend(zip(*cols))
    return out


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


def test_live_reader_chunks_at_batch_target(tmp_path):
    """The live reader's in-loop Arrow flush (one RecordBatch per
    ~_BATCH_TARGET_ROWS) must fire when a partition's rows exceed the
    target — never hit by the small replay fixtures at the real 64k
    target, so shrink it: a 6-sweep run over a multi-tag server with
    target=4 must yield multiple batches whose concatenation equals the
    single-batch read, with no dropped or duplicated tail rows."""
    from opc2mongodb_spark.sources import opc_live as mod
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    replay = _write_replay(str(tmp_path / "replay.jsonl"), 6)
    ds = OpcUaLiveDataSource(
        options={"config": CONF, "replay": replay, "sweeps": 6}
    )
    reader = ds.reader(None)
    part = reader.partitions()[0]
    whole = _read_rows(reader, part)
    assert len(whole) >= 8  # multi-tag server x 6 sweeps

    old = mod._BATCH_TARGET_ROWS
    mod._BATCH_TARGET_ROWS = 4
    try:
        batches = list(ds.reader(None).read(part))
    finally:
        mod._BATCH_TARGET_ROWS = old
    assert len(batches) > 1  # in-loop flush fired
    assert all(b.num_rows <= 4 for b in batches[:-1])
    chunked = []
    for b in batches:
        cols = [b.column(i).to_pylist() for i in range(b.num_columns)]
        chunked.extend(zip(*cols))
    assert chunked == whole


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


# ---------------------------------------------------------------------------
# r9: AsyncuaClientFactory.connect() under an injected fake asyncua (the
# pymongo-adapter sys.modules pattern) — the connect body is the first code
# that runs in any real deployment, so its security/subscription wiring is
# asserted here without the package installed. Plus blank-TYPE inference
# (reference GetDataType, Program.cs:131-135, :451-453) and the omitted-
# timestamp fallback on push notifications.
# ---------------------------------------------------------------------------

import sys
import types


class _Recorder:
    """Shared call log for the fake asyncua client graph; type_by_path
    parameterizes read_data_type_as_variant_type answers per test."""

    def __init__(self):
        self.calls = []
        self.type_by_path = {}


@pytest.fixture
def fake_asyncua(monkeypatch):
    rec = _Recorder()

    class _FakeVariantType:
        def __init__(self, name):
            self.name = name

    class _GoodStatus:
        def is_good(self):
            return True

    class _FakeDV:
        def __init__(self, val):
            import datetime

            class _V:
                Value = val

            self.Value = _V()
            self.SourceTimestamp = datetime.datetime(2024, 1, 1, 12, 0, 0)
            self.ServerTimestamp = datetime.datetime(2024, 1, 1, 12, 0, 1)
            self.StatusCode = _GoodStatus()

    class _FakeNode:
        def __init__(self, path):
            self._path = path

        def read_data_value(self):
            rec.calls.append(("read", self._path))
            return _FakeDV(7.5)

        def read_data_type_as_variant_type(self):
            rec.calls.append(("resolve_type", self._path))
            return _FakeVariantType(rec.type_by_path.get(self._path, "Double"))

    class _FakeSubscription:
        def subscribe_data_change(self, nodes):
            rec.calls.append(
                ("subscribe_data_change", tuple(n._path for n in nodes))
            )

        def delete(self):
            rec.calls.append(("subscription_delete",))

    class _FakeClient:
        def __init__(self, url):
            rec.calls.append(("client", url))

        def set_security(
            self,
            policy,
            certificate=None,
            private_key=None,
            private_key_password=None,
        ):
            rec.calls.append(
                ("set_security", policy, certificate, private_key,
                 private_key_password)
            )

        def connect(self):
            rec.calls.append(("connect",))

        def create_subscription(self, period_ms, handler):
            rec.calls.append(
                ("create_subscription", period_ms, type(handler).__name__)
            )
            return _FakeSubscription()

        def get_node(self, path):
            return _FakeNode(path)

        def disconnect(self):
            rec.calls.append(("disconnect",))

    asyncua_mod = types.ModuleType("asyncua")
    sync_mod = types.ModuleType("asyncua.sync")
    sync_mod.Client = _FakeClient
    crypto_mod = types.ModuleType("asyncua.crypto")
    pol_mod = types.ModuleType("asyncua.crypto.security_policies")

    class SecurityPolicyBasic256Sha256:
        pass

    pol_mod.SecurityPolicyBasic256Sha256 = SecurityPolicyBasic256Sha256
    asyncua_mod.sync = sync_mod
    asyncua_mod.crypto = crypto_mod
    crypto_mod.security_policies = pol_mod
    monkeypatch.setitem(sys.modules, "asyncua", asyncua_mod)
    monkeypatch.setitem(sys.modules, "asyncua.sync", sync_mod)
    monkeypatch.setitem(sys.modules, "asyncua.crypto", crypto_mod)
    monkeypatch.setitem(
        sys.modules, "asyncua.crypto.security_policies", pol_mod
    )
    rec.policy = SecurityPolicyBasic256Sha256
    return rec


def _ua_server(read_period=10, cert="", password=""):
    from opc2mongodb_spark.sources.config import ServerConfig, TagEntry

    srv = ServerConfig(
        url="opc.tcp://sim-a.local:48484",
        name="ServerA",
        read_period=read_period,
        is_ua=True,
        certificate_file=cert,
        certificate_password=password,
    )
    srv.entries = [
        TagEntry("ns=1;s=Plant.Line1.Temperature", "Double", True,
                 "Plant.Line1.Temperature"),
        TagEntry("ns=1;s=Plant.Line1.Running", "Boolean", True,
                 "Plant.Line1.Running"),
        TagEntry("ns=1;s=Plant.Line1.Pressure", "Float", False,
                 "Plant.Line1.Pressure"),
    ]
    return srv


def test_connect_anonymous_subscribes_exactly_the_subscribe_tags(fake_asyncua):
    """Anonymous posture: no set_security call; the subscription is created
    at read_period x 1000 ms with the SubscriptionCache as handler and
    monitors exactly the SUBSCRIBE=Y nodes (Program.cs:126-444)."""
    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    srv = _ua_server(read_period=10)
    factory = AsyncuaClientFactory(
        srv, subscribe_paths=tuple(e.opc_path for e in srv.entries if e.subscribe)
    )
    client = factory.connect()
    names = [c[0] for c in fake_asyncua.calls]
    assert "set_security" not in names
    assert names.index("connect") < names.index("create_subscription")
    assert (
        "create_subscription",
        10 * 1000.0,
        "SubscriptionCache",
    ) in fake_asyncua.calls
    assert (
        "subscribe_data_change",
        ("ns=1;s=Plant.Line1.Temperature", "ns=1;s=Plant.Line1.Running"),
    ) in fake_asyncua.calls
    assert client._cache is not None and client._subscription is not None


def test_connect_without_subscribe_tags_skips_subscription(fake_asyncua):
    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    client = AsyncuaClientFactory(_ua_server()).connect()
    names = [c[0] for c in fake_asyncua.calls]
    assert "create_subscription" not in names
    client.close()
    assert ("subscription_delete",) not in fake_asyncua.calls
    assert names and fake_asyncua.calls[-1] == ("disconnect",)


def test_close_deletes_subscription_before_disconnect(fake_asyncua):
    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    srv = _ua_server()
    client = AsyncuaClientFactory(
        srv, subscribe_paths=(srv.entries[0].opc_path,)
    ).connect()
    client.close()
    names = [c[0] for c in fake_asyncua.calls]
    assert names.index("subscription_delete") < names.index("disconnect")


def _make_pfx(path, password):
    """Self-signed cert + RSA key sealed into a PKCS#12 bundle — the
    reference's native CERT format (Program.cs:104-121)."""
    import datetime as dt

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.hazmat.primitives.serialization import pkcs12
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "opc2mongodb-test")]
    )
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(dt.datetime(2024, 1, 1))
        .not_valid_after(dt.datetime(2034, 1, 1))
        .sign(key, hashes.SHA256())
    )
    enc = (
        serialization.BestAvailableEncryption(password.encode())
        if password
        else serialization.NoEncryption()
    )
    data = pkcs12.serialize_key_and_certificates(b"test", key, cert, None, enc)
    with open(path, "wb") as f:
        f.write(data)
    return cert


def test_connect_pfx_converted_to_pem_cert_key_pair(fake_asyncua, tmp_path):
    """r8 ADVICE: asyncua loads PEM/DER cert+key files and cannot parse a
    PKCS#12 bundle — the factory must convert the reference's single .pfx
    into a PEM pair at connect time, threading the password through as the
    key passphrase."""
    from cryptography import x509
    from cryptography.hazmat.primitives.serialization import (
        load_pem_private_key,
    )

    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    pfx = str(tmp_path / "servera.pfx")
    orig_cert = _make_pfx(pfx, "s3cret")
    AsyncuaClientFactory(_ua_server(cert=pfx, password="s3cret")).connect()

    sec = [c for c in fake_asyncua.calls if c[0] == "set_security"]
    assert len(sec) == 1
    _, policy, cert_path, key_path, key_pw = sec[0]
    assert policy is fake_asyncua.policy and key_pw == "s3cret"
    assert cert_path != pfx and key_path != pfx and cert_path != key_path
    with open(cert_path, "rb") as f:
        pem_cert = x509.load_pem_x509_certificate(f.read())
    assert pem_cert.serial_number == orig_cert.serial_number
    with open(key_path, "rb") as f:
        key = load_pem_private_key(f.read(), b"s3cret")  # re-encrypted
    assert key.public_key().public_numbers() == (
        pem_cert.public_key().public_numbers()
    )
    # security is configured BEFORE the session connects
    names = [c[0] for c in fake_asyncua.calls]
    assert names.index("set_security") < names.index("connect")


def test_connect_pem_path_passed_through_both_slots(fake_asyncua):
    """Non-pfx paths are assumed to be a combined PEM: same file fills both
    certificate and private_key (no conversion, no temp files)."""
    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    AsyncuaClientFactory(
        _ua_server(cert="/certs/combined.pem", password="")
    ).connect()
    sec = [c for c in fake_asyncua.calls if c[0] == "set_security"][0]
    assert sec[2] == sec[3] == "/certs/combined.pem" and sec[4] is None


def test_blank_type_inferred_once_per_session(fake_asyncua, tmp_path):
    """Blank TYPE in the conf (Program.cs:131-135): the live reader asks
    the connected session once per partition via
    read_data_type_as_variant_type and emits the answer as dataType;
    declared types never trigger inference."""
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    conf = tmp_path / "infer.conf"
    conf.write_text(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://sim-a.local:48484, 10, ServerA\n"
        "ns=1;s=Plant.Line1.Temperature ,, N, Plant.Line1.Temperature\n"
        "ns=1;s=Plant.Line1.Running , Boolean, N, Plant.Line1.Running\n"
    )
    fake_asyncua.type_by_path["ns=1;s=Plant.Line1.Temperature"] = "Double"
    ds = OpcUaLiveDataSource(options={"config": str(conf), "sweeps": 3})
    reader = ds.reader(None)
    rows = _read_rows(reader, reader.partitions()[0])
    assert [r[2] for r in rows] == ["Double", "Boolean"] * 3
    resolves = [c for c in fake_asyncua.calls if c[0] == "resolve_type"]
    assert resolves == [("resolve_type", "ns=1;s=Plant.Line1.Temperature")]


def test_blank_type_covered_by_types_option_skips_inference(
    fake_asyncua, tmp_path
):
    """The declared-lookup path: option 'types' fills blanks up front, so
    no inference RPC is issued at all."""
    import json as _json

    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    conf = tmp_path / "infer.conf"
    conf.write_text(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://sim-a.local:48484, 10, ServerA\n"
        "ns=1;s=Plant.Line1.Temperature ,, N, Plant.Line1.Temperature\n"
    )
    ds = OpcUaLiveDataSource(
        options={
            "config": str(conf),
            "sweeps": 2,
            "types": _json.dumps(
                {"ns=1;s=Plant.Line1.Temperature": "Double"}
            ),
        }
    )
    reader = ds.reader(None)
    rows = _read_rows(reader, reader.partitions()[0])
    assert [r[2] for r in rows] == ["Double", "Double"]
    assert not [c for c in fake_asyncua.calls if c[0] == "resolve_type"]


def test_replay_resolve_type_from_type_fields(tmp_path):
    """Replay twin of live inference: per-path "type" fields answer
    resolve_type; a blank-TYPE tag with no type field fails loudly."""
    topo = parse_config_file(CONF)
    srv = topo.servers[0]
    replay = str(tmp_path / "replay.jsonl")
    with open(replay, "w", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {
                    "server": srv.name,
                    "path": "ns=1;s=T",
                    "sweep": 0,
                    "raw": "1.5",
                    "type": "Double",
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {"server": srv.name, "path": "ns=1;s=U", "sweep": 0, "raw": "2"}
            )
            + "\n"
        )
    from opc2mongodb_spark.sources.opc_live import ReplayClientFactory

    client = ReplayClientFactory(srv, replay).connect()
    assert client.resolve_type("ns=1;s=T") == "Double"
    with pytest.raises(KeyError, match="type"):
        client.resolve_type("ns=1;s=U")


def test_notification_without_timestamps_falls_back_to_sweep_clock():
    """r8 ADVICE: servers may omit SourceTimestamp/ServerTimestamp on
    notifications; a null serverTimestamp would leave downstream last-value
    ordering undefined, so the read client stamps the sweep-derived clock
    exactly like the replay client does."""
    import datetime

    from opc2mongodb_spark.sources.opc import _EPOCH
    from opc2mongodb_spark.sources.opc_live import (
        SubscriptionCache,
        _AsyncuaReadClient,
    )

    class _Node:
        def __str__(self):
            return "ns=1;s=T"

    cache = SubscriptionCache()
    cache.datachange_notification(_Node(), 4.25, None)  # no DataValue at all
    client = _AsyncuaReadClient(None, 10, cache)
    raw, sts, ets, q = client.read_value("ns=1;s=T", 3)
    want = (_EPOCH + datetime.timedelta(seconds=30)).replace(tzinfo=None)
    assert (raw, q) == ("4.25", 192)
    assert sts == want and ets == want + datetime.timedelta(seconds=1)


def test_config_blank_type_marks_infer_and_lookup_fills():
    from opc2mongodb_spark.sources.config import (
        apply_type_lookup,
        parse_config,
    )

    topo = parse_config(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://a:1, 10, A\n"
        "ns=1;s=X ,, Y, X\n"
        "ns=1;s=Y , Double, N, Y\n"
        "ns=1;s=Z ,, N, Z\n"
    )
    entries = topo.servers[0].entries
    assert [e.infer_type for e in entries] == [True, False, True]
    missing = apply_type_lookup(topo, {"ns=1;s=X": "Boolean"})
    assert missing == ["ns=1;s=Z"]
    assert entries[0].opc_type == "Boolean" and not entries[0].infer_type
    # declared types are never overridden
    apply_type_lookup(topo, {"ns=1;s=Y": "Float", "ns=1;s=Z": "Int32"})
    assert entries[1].opc_type == "Double" and entries[2].opc_type == "Int32"


def test_opcsim_rejects_uncovered_blank_types(tmp_path):
    """The simulator has no server to ask — a blank TYPE not covered by
    option 'types' is a loud config error, never a silent float default."""
    from opc2mongodb_spark.sources.opc import OpcSimDataSource

    conf = tmp_path / "blank.conf"
    conf.write_text(
        "mongodb://127.0.0.1:27017/opc2mongodb\n"
        "opc.tcp://a:1, 10, A\n"
        "ns=1;s=X ,, Y, X\n"
    )
    with pytest.raises(ValueError, match="ns=1;s=X"):
        OpcSimDataSource(options={"config": str(conf)})._topo()
    topo = OpcSimDataSource(
        options={"config": str(conf), "types": '{"ns=1;s=X": "Double"}'}
    )._topo()
    assert topo.servers[0].entries[0].opc_type == "Double"


def test_pfx_conversion_without_password_writes_plaintext_key(tmp_path):
    """No PASS in the conf -> the PKCS#12 loads with password=None and the
    PEM key is written unencrypted (NoEncryption); set_security gets
    private_key_password=None."""
    from cryptography.hazmat.primitives.serialization import (
        load_pem_private_key,
    )

    from opc2mongodb_spark.sources.opc_live import _pfx_to_pem_pair

    pfx = str(tmp_path / "nopass.pfx")
    _make_pfx(pfx, "")
    cert_path, key_path, key_pw = _pfx_to_pem_pair(pfx, "")
    assert key_pw is None
    with open(key_path, "rb") as f:
        load_pem_private_key(f.read(), None)  # plaintext parses


def test_timestamp_fallback_never_sorts_behind_real_timestamps():
    """Mixing the fixed sweep epoch with real server clocks must not invert
    last-value ordering: after a poll read carrying a REAL (future-of-epoch)
    serverTimestamp, a later notification with omitted timestamps gets a
    derived stamp strictly NEWER than the real one."""
    import datetime

    from opc2mongodb_spark.sources.opc_live import (
        SubscriptionCache,
        _AsyncuaReadClient,
    )

    real = datetime.datetime(2026, 8, 15, 12, 0, 0)

    class _GoodStatus:
        def is_good(self):
            return True

    class _DV:
        def __init__(self, val):
            class _V:
                Value = val

            self.Value = _V()
            self.SourceTimestamp = real
            self.ServerTimestamp = real
            self.StatusCode = _GoodStatus()

    class _FakeNode:
        def read_data_value(self):
            return _DV(1.5)

    class _FakeClient:
        def get_node(self, path):
            return _FakeNode()

    class _Node:
        def __str__(self):
            return "ns=1;s=T"

    cache = SubscriptionCache()
    client = _AsyncuaReadClient(_FakeClient(), 10, cache)
    _, sts0, ets0, _ = client.read_value("ns=1;s=T", 0)  # real clock
    assert ets0 == real
    cache.datachange_notification(_Node(), 2.5, None)  # no timestamps
    raw, sts1, ets1, _ = client.read_value("ns=1;s=T", 1)
    assert raw == "2.5"
    assert sts1 > real and ets1 > ets0  # never behind the real stamp


def test_pfx_with_empty_export_password_opens_via_empty_bytes(monkeypatch):
    """A blank conf PASS must open both truly-unencrypted bundles
    (password=None) and Windows-style empty-password exports, which the
    PKCS#12 loader only accepts as b''."""
    from cryptography.hazmat.primitives.serialization import pkcs12 as _p

    from opc2mongodb_spark.sources import opc_live

    seen = []

    def fake_load(data, password):
        seen.append(password)
        if password is None:
            raise ValueError("Invalid password or PKCS12 data")
        return _KEY, _CERT, []

    # build one real key+cert to hand back from the fake loader
    import datetime as dt

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    _KEY = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "t")])
    _CERT = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(_KEY.public_key())
        .serial_number(1)
        .not_valid_before(dt.datetime(2024, 1, 1))
        .not_valid_after(dt.datetime(2034, 1, 1))
        .sign(_KEY, hashes.SHA256())
    )
    monkeypatch.setattr(_p, "load_key_and_certificates", fake_load)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pfx") as f:
        f.write(b"opaque")
        f.flush()
        cert_path, key_path, key_pw = opc_live._pfx_to_pem_pair(f.name, "")
    assert seen == [None, b""] and key_pw is None  # None tried, b'' fallback


def test_close_removes_converted_pem_dir(fake_asyncua, tmp_path):
    """The per-connect PEM conversion dir is removed on close() — repeated
    micro-batch connects must not accumulate key material on executor
    disk."""
    import os

    from opc2mongodb_spark.sources.opc_live import AsyncuaClientFactory

    pfx = str(tmp_path / "servera.pfx")
    _make_pfx(pfx, "pw")
    client = AsyncuaClientFactory(_ua_server(cert=pfx, password="pw")).connect()
    sec = [c for c in fake_asyncua.calls if c[0] == "set_security"][0]
    pem_dir = os.path.dirname(sec[2])
    assert os.path.exists(pem_dir)
    client.close()
    assert not os.path.exists(pem_dir)


def test_pfx_wrong_password_raises_instead_of_empty_fallback(tmp_path):
    """The b'' empty-password retry exists ONLY for blank conf PASS; a
    declared-but-wrong password must surface the loader's ValueError (a
    silent retry would mask a credential misconfiguration)."""
    from opc2mongodb_spark.sources.opc_live import _pfx_to_pem_pair

    pfx = str(tmp_path / "servera.pfx")
    _make_pfx(pfx, "right")
    with pytest.raises(ValueError):
        _pfx_to_pem_pair(pfx, "wrong")


def test_pfx_without_private_key_rejected(tmp_path):
    """A cert-only bundle (no private key) cannot authenticate a session —
    reject loudly rather than handing asyncua a half-pair."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.serialization import pkcs12

    from opc2mongodb_spark.sources.opc_live import _pfx_to_pem_pair

    cert = _make_pfx(str(tmp_path / "full.pfx"), "")
    data = pkcs12.serialize_key_and_certificates(
        b"certonly", None, cert, None, serialization.NoEncryption()
    )
    pfx = str(tmp_path / "certonly.pfx")
    with open(pfx, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="both a private key"):
        _pfx_to_pem_pair(pfx, "")


def test_fill_timestamps_derived_never_behind_a_real_source_stamp():
    """When a notification carries a REAL SourceTimestamp but no
    ServerTimestamp, the derived server stamp must land at-or-after that
    real stamp (sts <= ets ordering survives servers whose clock runs
    ahead of the sweep-derived epoch)."""
    from datetime import datetime, timedelta, timezone
    from types import SimpleNamespace

    from opc2mongodb_spark.sources.opc_live import _AsyncuaReadClient

    ns = SimpleNamespace(_read_period=10, _last_ets={})
    real_sts = datetime(2030, 1, 1, tzinfo=timezone.utc)
    raw, sts, ets, q = _AsyncuaReadClient._fill_timestamps(
        ns, ("1.5", real_sts, None, 192), 1, "ns=1;s=T"
    )
    assert sts == real_sts and ets.tzinfo is None
    assert ets == real_sts.replace(tzinfo=None) + timedelta(seconds=1)
    assert ns._last_ets["ns=1;s=T"] == ets


def test_replay_connect_skips_blank_lines_and_foreign_servers(tmp_path):
    """Replay files may interleave rows for several servers plus blank
    separator lines; a factory bound to one server loads only its rows."""
    import json as _json

    from opc2mongodb_spark.sources.opc_live import ReplayClientFactory

    replay = str(tmp_path / "replay.jsonl")
    with open(replay, "w", encoding="utf-8") as f:
        f.write(
            _json.dumps(
                {"server": "ServerA", "path": "ns=1;s=T", "sweep": 1, "raw": "1"}
            )
            + "\n\n"
            + _json.dumps(
                {"server": "OTHER", "path": "ns=1;s=X", "sweep": 1, "raw": "9"}
            )
            + "\n"
        )
    client = ReplayClientFactory(_ua_server(), replay).connect()
    assert client.read_value("ns=1;s=T", 1)[0] == "1"
    with pytest.raises(KeyError, match="no rows"):
        client.read_value("ns=1;s=X", 1)  # foreign-server row not loaded
    client.close()  # no-op contract: replay holds no session to tear down


def test_replay_read_before_first_recorded_sweep_fails_loudly(tmp_path):
    """Hold-last-value only looks BACKWARD; a read before the first
    recorded sweep has nothing to hold and must raise, not fabricate."""
    import json as _json

    from opc2mongodb_spark.sources.opc_live import ReplayClientFactory

    replay = str(tmp_path / "replay.jsonl")
    with open(replay, "w", encoding="utf-8") as f:
        f.write(
            _json.dumps(
                {"server": "ServerA", "path": "ns=1;s=T", "sweep": 2, "raw": "1"}
            )
            + "\n"
        )
    client = ReplayClientFactory(_ua_server(), replay).connect()
    with pytest.raises(KeyError, match="before sweep 0"):
        client.read_value("ns=1;s=T", 0)


def test_naive_strips_tzinfo_only_when_present():
    from datetime import datetime, timezone

    from opc2mongodb_spark.sources.opc_live import _naive

    aware = datetime(2030, 1, 1, tzinfo=timezone.utc)
    assert _naive(aware) == datetime(2030, 1, 1) and _naive(None) is None
    assert _naive(datetime(2030, 1, 1)) == datetime(2030, 1, 1)


def test_datasource_schema_and_required_config_option(tmp_path):
    """Driver-side option parsing: schema() is the fixed wire schema; a
    missing 'config' option fails at plan time with the option name."""
    from opc2mongodb_spark.sources.opc import RAW_SCHEMA
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    assert OpcUaLiveDataSource(options={}).schema() == RAW_SCHEMA
    with pytest.raises(ValueError, match="config"):
        OpcUaLiveDataSource(options={}).reader(RAW_SCHEMA)


def test_stream_reader_replay_default_bound_is_drainable(tmp_path):
    """streamReader() option parsing: with a replay file the default
    max_sweeps bound is finite (16) so processAllAvailable drains; explicit
    options override; sweeps_per_batch defaults to 1."""
    from opc2mongodb_spark.sources.opc import RAW_SCHEMA
    from opc2mongodb_spark.sources.opc_live import OpcUaLiveDataSource

    replay = _write_replay(str(tmp_path / "replay.jsonl"), 1)
    rd = OpcUaLiveDataSource(
        options={"config": CONF, "replay": replay}
    ).streamReader(RAW_SCHEMA)
    assert (rd.sweeps_per_batch, rd.max_sweeps) == (1, 16)
    rd2 = OpcUaLiveDataSource(
        options={"config": CONF, "replay": replay, "max_sweeps": 4}
    ).streamReader(RAW_SCHEMA)
    assert rd2.max_sweeps == 4
