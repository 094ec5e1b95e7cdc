"""``opcua`` — the LIVE OPC UA connector seam (SURVEY.md R1/R2, §4 item 1).

The reference's left edge is a real OPC session: connect (with optional
certificate auth), subscribe/poll tags, typed reads (reference:
OPC2MongoDB/Program.cs:96-736 for UA — :104-121 loads
``certificate_file``/``certificate_password`` into the session identity;
:739-1143 for DA). ``opcsim`` (sources/opc.py) reproduces the connector
*shape* with a deterministic simulator; this module is the live twin:
the exact same Python-data-source interface, offsets, wire schema, and
restart contract, with the per-sweep value fetch delegated to a pluggable
**read client** instead of ``_sweep_rows``.

Three client layers, outermost first:

- ``OpcUaLiveDataSource`` (format name ``opcua``) — identical options to
  ``opcsim`` plus ``replay`` (path to a replay .jsonl for environments
  without an OPC server). Stream offsets are the same monotonic sweep
  counter with the same checkpoint-recovery contract, inherited — not
  copied — from ``OpcSimStreamReader``.
- ``AsyncuaClientFactory`` — builds a connected ``asyncua.sync.Client``
  ON THE EXECUTOR (clients don't pickle; the factory carries only
  strings). Import-guarded via ``asyncua_available()`` exactly like the
  Delta backend (streaming/sinks.py ``delta_available``): constructing
  the factory is always safe, ``connect()`` raises ImportError without
  the lib. Certificate auth posture from the .conf (CERT, PASS fields —
  Program.cs:104-121) is threaded through verbatim.
- ``ReplayClientFactory`` — a deterministic file-backed client for
  integration tests: reads (server, path, sweep) → raw value rows from a
  .jsonl replay file, timestamps derived from sweep × read_period exactly
  as opcsim derives them, so wire-schema and offset-recovery parity with
  the opcsim goldens is assertable bit-for-bit.

Scale note: one input partition per configured server (the Spark twin of
the reference's thread-per-server loop, Program.cs:1300-1312); each
partition opens ONE client session per micro-batch, reads every tag per
sweep in the planned range, closes. No driver-side I/O, no state outside
the checkpointed offset.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StructType

from opc2mongodb_spark.sources.config import (
    OpcTopology,
    ServerConfig,
    apply_type_lookup,
    parse_config_file,
)
import pyarrow as pa

from opc2mongodb_spark.sources.opc import (
    ARROW_SCHEMA,
    RAW_SCHEMA,
    _BATCH_TARGET_ROWS,
    _EPOCH,
    OpcSimStreamReader,
    _ServerPartition,
    dt_to_us,
)


def asyncua_available() -> bool:
    """True when the asyncua package is importable (not installed in the
    test sandbox — the live code path is exercised wherever it is)."""
    try:
        import asyncua  # noqa: F401

        return True
    except ImportError:
        return False


def _pfx_to_pem_pair(
    pfx_path: str, password: str
) -> tuple[str, str, str | None]:
    """Convert the reference's single PKCS#12 bundle (Program.cs:104-121
    loads CERT/PASS into an X509Certificate2) into the PEM cert + key pair
    asyncua's ``set_security`` loads — asyncua parses PEM/DER files and
    cannot read a .pfx directly. Returns ``(cert_path, key_path,
    key_password)``; the key is re-encrypted with the original password
    when one is set, plaintext in a mkdtemp (0700) otherwise. The mkdtemp
    is removed by ``_AsyncuaReadClient.close()`` at the end of the
    partition read — one short-lived dir per (partition, micro-batch),
    never an accumulating leak. Uses the ``cryptography`` package, which
    asyncua itself depends on — so it is always present wherever the live
    path can run at all."""
    import tempfile

    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.serialization import pkcs12

    with open(pfx_path, "rb") as f:
        data = f.read()
    pw = password.encode() if password else None
    try:
        key, cert, _extra = pkcs12.load_key_and_certificates(data, pw)
    except ValueError:
        if pw is not None:
            raise
        # Windows/AD CS exports commonly seal with an EMPTY password, which
        # the PKCS#12 loader wants as b"" — a blank conf PASS must open both
        # truly-unencrypted and empty-password bundles.
        key, cert, _extra = pkcs12.load_key_and_certificates(data, b"")
    if key is None or cert is None:
        raise ValueError(
            f"PKCS#12 bundle {pfx_path!r} must contain both a private key "
            "and a certificate"
        )
    out_dir = tempfile.mkdtemp(prefix="opcua_pem_")
    cert_path = f"{out_dir}/cert.pem"
    key_path = f"{out_dir}/key.pem"
    enc = (
        serialization.BestAvailableEncryption(password.encode())
        if password
        else serialization.NoEncryption()
    )
    with open(cert_path, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                enc,
            )
        )
    return cert_path, key_path, password or None


class AsyncuaClientFactory:
    """Picklable factory: carries the per-server connection/auth posture as
    plain strings; ``connect()`` builds the real client executor-side.

    Auth (Program.cs:104-121): when the .conf carries CERT[, PASS] for a
    UA server, the session authenticates with that certificate; otherwise
    anonymous. asyncua expects a PEM/DER cert + private key pair, so a
    ``.pfx``/``.p12`` bundle (the reference's native format) is converted
    via ``_pfx_to_pem_pair`` at connect time; any other extension is
    assumed to be a combined PEM carrying both blocks and is passed as
    both ``certificate`` and ``private_key``.
    """

    def __init__(
        self, server: ServerConfig, subscribe_paths: tuple[str, ...] = ()
    ) -> None:
        self.url = server.url
        self.read_period = server.read_period
        self.certificate_file = server.certificate_file or ""
        self.certificate_password = server.certificate_password or ""
        # the .conf's SUBSCRIBE=Y tags (R1 push, Program.cs:126-444) —
        # carried as plain strings so the factory stays picklable
        self.subscribe_paths = tuple(subscribe_paths)

    def connect(self):
        if not asyncua_available():
            raise ImportError(
                "the live 'opcua' source requires the asyncua package; "
                "pass option 'replay' to run against a replay file instead"
            )
        from asyncua.crypto.security_policies import SecurityPolicyBasic256Sha256
        from asyncua.sync import Client

        client = Client(self.url)
        pem_dir = None
        if self.certificate_file:
            if self.certificate_file.lower().endswith((".pfx", ".p12")):
                cert, key, key_pw = _pfx_to_pem_pair(
                    self.certificate_file, self.certificate_password
                )
                pem_dir = os.path.dirname(cert)
            else:
                cert = key = self.certificate_file
                key_pw = self.certificate_password or None
            client.set_security(
                SecurityPolicyBasic256Sha256,
                certificate=cert,
                private_key=key,
                private_key_password=key_pw,
            )
        client.connect()
        cache = SubscriptionCache()
        subscription = None
        if self.subscribe_paths:
            # R1 push semantics: monitored items feed the latest-value
            # cache; sweeps DRAIN the cache instead of issuing a read RPC
            # per subscribed tag (publish interval = the poll period, the
            # same cadence the reference's monitor callbacks commit at).
            subscription = client.create_subscription(
                max(self.read_period, 1) * 1000.0, cache
            )
            subscription.subscribe_data_change(
                [client.get_node(p) for p in self.subscribe_paths]
            )
        return _AsyncuaReadClient(
            client, self.read_period, cache, subscription, pem_dir=pem_dir
        )


class SubscriptionCache:
    """Latest-value buffer bridging push notifications into the sweep-
    shaped reader: each DataChange overwrites the tag's slot; each sweep
    reads the slot without an RPC. The asyncua subscription handler
    protocol is one method, ``datachange_notification(node, val, data)``;
    the cache keys by the node's ID string so the reader's conf-path
    lookups match. Thread-safety: asyncua's sync wrapper delivers
    notifications on its own thread — slot swaps are atomic dict
    writes of immutable tuples, the reader only ever reads whole slots."""

    def __init__(self) -> None:
        self._latest: dict[str, tuple] = {}

    @staticmethod
    def _node_key(node) -> str:
        # asyncua's str(Node) WRAPS the id ("Node(ns=1;s=...)"); the
        # reader looks up by the conf's bare "ns=1;s=..." path, which is
        # exactly NodeId.to_string() — prefer it, fall back to str() for
        # injected fakes / other client libraries.
        nodeid = getattr(node, "nodeid", None)
        to_string = getattr(nodeid, "to_string", None)
        if callable(to_string):
            return to_string()
        return str(node)

    def datachange_notification(self, node, val, data) -> None:
        item = getattr(data, "monitored_item", None)
        dv = getattr(item, "Value", None) if item is not None else None
        raw = "" if val is None else str(val)
        sts = getattr(dv, "SourceTimestamp", None)
        ets = getattr(dv, "ServerTimestamp", None)
        good = True
        status = getattr(dv, "StatusCode", None)
        if status is not None and hasattr(status, "is_good"):
            good = status.is_good()
        self._latest[self._node_key(node)] = (
            raw,
            sts,
            ets,
            192 if good else 0,
        )

    def get(self, opc_path: str):
        return self._latest.get(opc_path)


class _AsyncuaReadClient:
    """Live read client. Poll tags: one read RPC per (tag, sweep) — the
    reference's ``Thread.Sleep(read_period)`` loop (R2, Program.cs:1157).
    Subscribed tags: served from the push-fed ``SubscriptionCache`` (R1),
    falling back to a poll read until the first notification arrives (the
    reference reads initial values on subscribe too). The sweep index only
    stamps which micro-batch cycle observed the value."""

    def __init__(
        self,
        client,
        read_period: int,
        cache: SubscriptionCache | None = None,
        subscription=None,
        pem_dir: str | None = None,
    ) -> None:
        self._client = client
        self._read_period = read_period
        self._cache = cache
        self._subscription = subscription
        self._pem_dir = pem_dir
        # newest REAL serverTimestamp seen per tag this session — the
        # omitted-timestamp fallback must never sort behind it (mixing the
        # fixed sweep epoch with real wall clocks would invert last-value
        # ordering for the tag)
        self._last_ets: dict[str, datetime] = {}

    def read_value(self, opc_path: str, sweep: int):
        if self._cache is not None:
            hit = self._cache.get(opc_path)
            if hit is not None:
                return self._fill_timestamps(hit, sweep, opc_path)
        node = self._client.get_node(opc_path)
        dv = node.read_data_value()
        raw = "" if dv.Value.Value is None else str(dv.Value.Value)
        sts = dv.SourceTimestamp
        ets = dv.ServerTimestamp
        # StatusCode → the reference's quality int (192 == Good, OPC DA
        # convention the reference writes for healthy UA reads too)
        quality = 192 if dv.StatusCode.is_good() else 0
        return self._fill_timestamps((raw, sts, ets, quality), sweep, opc_path)

    def _fill_timestamps(self, row: tuple, sweep: int, opc_path: str):
        """Servers may omit SourceTimestamp/ServerTimestamp on DataValues
        and notifications; a null serverTimestamp would make the keyed
        last-value ordering downstream undefined for that tag, so absent
        timestamps fall back to a derived clock: the sweep-derived epoch
        (how the replay client stamps every row) advanced past the newest
        REAL serverTimestamp this session saw for the tag, so a derived
        stamp never sorts behind a real one."""
        raw, sts, ets, quality = row
        if sts is None or ets is None:
            derived = (
                _EPOCH + timedelta(seconds=sweep * self._read_period)
            ).replace(tzinfo=None)
            last = self._last_ets.get(opc_path)
            if last is not None and last >= derived:
                derived = last + timedelta(microseconds=1)
            if sts is not None:
                real_sts = sts.replace(tzinfo=None) if sts.tzinfo else sts
                if real_sts > derived:
                    derived = real_sts
            if sts is None:
                sts = derived
            if ets is None:
                ets = derived + timedelta(seconds=1)
        if ets is not None:
            naive_ets = ets.replace(tzinfo=None) if ets.tzinfo else ets
            prev = self._last_ets.get(opc_path)
            if prev is None or naive_ets > prev:
                self._last_ets[opc_path] = naive_ets
        return raw, sts, ets, quality

    def resolve_type(self, opc_path: str) -> str:
        """Blank-TYPE inference (reference GetDataType, Program.cs:131-135,
        :451-453): ask the server for the tag's variant type once; the
        VariantType name ("Double", "Boolean", ...) feeds the same
        declared-type coercion table as conf-declared names."""
        node = self._client.get_node(opc_path)
        return node.read_data_type_as_variant_type().name

    def close(self) -> None:
        if self._subscription is not None:
            try:
                self._subscription.delete()
            except Exception:  # pragma: no cover - server already gone
                pass
        self._client.disconnect()
        if self._pem_dir is not None:
            # the converted PEM pair lives only for this partition read —
            # removing it here is what keeps per-micro-batch connect()
            # calls from accumulating key material on executor disk
            shutil.rmtree(self._pem_dir, ignore_errors=True)


class ReplayClientFactory:
    """Deterministic file-backed client for integration tests.

    The replay file is .jsonl, one object per line:
    ``{"server": ..., "path": ..., "sweep": N, "raw": "...", "quality": 192}``
    (quality optional, default 192). Lookup key is (path, sweep); a miss
    falls back to the latest recorded sweep ≤ N for that path (a held
    value — the poll-cadence behavior), else raises KeyError so schema
    drift in a replay file fails loudly instead of fabricating data.

    Timestamps are derived from sweep × read_period off the same epoch as
    opcsim so parity with the opcsim goldens is exact.
    """

    def __init__(self, server: ServerConfig, replay_path: str) -> None:
        self.server = server.name
        self.read_period = server.read_period
        self.replay_path = replay_path

    def connect(self):
        values: dict[str, dict[int, tuple[str, int]]] = {}
        types: dict[str, str] = {}
        with open(self.replay_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("server", self.server) != self.server:
                    continue
                values.setdefault(rec["path"], {})[int(rec["sweep"])] = (
                    str(rec["raw"]),
                    int(rec.get("quality", 192)),
                )
                if rec.get("type"):
                    # optional declared-type column: the replay twin of the
                    # live server's GetDataType answer for blank-TYPE entries
                    types[rec["path"]] = rec["type"]
        return _ReplayReadClient(values, self.read_period, types)


class _ReplayReadClient:
    def __init__(
        self,
        values: dict[str, dict[int, tuple[str, int]]],
        read_period: int,
        types: dict[str, str] | None = None,
    ) -> None:
        self._values = values
        self._read_period = read_period
        self._types = types or {}

    def resolve_type(self, opc_path: str) -> str:
        """Replay twin of live type inference: served from the replay
        file's optional per-path "type" fields; absent → loud KeyError
        (fabricating a type would mask schema drift in the replay)."""
        if opc_path not in self._types:
            raise KeyError(
                f"replay file declares no type for blank-TYPE tag "
                f"{opc_path!r} (add a \"type\" field to its records)"
            )
        return self._types[opc_path]

    def read_value(self, opc_path: str, sweep: int):
        by_sweep = self._values.get(opc_path)
        if not by_sweep:
            raise KeyError(f"replay file has no rows for tag {opc_path!r}")
        if sweep in by_sweep:
            raw, quality = by_sweep[sweep]
        else:
            held = [s for s in by_sweep if s <= sweep]
            if not held:
                raise KeyError(
                    f"replay file has no value for {opc_path!r} at or "
                    f"before sweep {sweep}"
                )
            raw, quality = by_sweep[max(held)]
        ts = (_EPOCH + timedelta(seconds=sweep * self._read_period)).replace(
            tzinfo=None
        )
        return raw, ts, ts + timedelta(seconds=1), quality

    def close(self) -> None:
        pass


def _client_factories(
    topo: OpcTopology, replay_path: str | None
) -> list[AsyncuaClientFactory | ReplayClientFactory]:
    if replay_path:
        return [ReplayClientFactory(s, replay_path) for s in topo.servers]
    # asyncua speaks OPC UA only. The reference's DA path
    # (Program.cs:739-1143) rides Windows COM — no maintained Python
    # client exists, so a live DA server is an explicit configuration
    # error here, not a silent wrong-protocol connection attempt.
    da = [s.name for s in topo.servers if not s.is_ua]
    if da:
        raise ValueError(
            f"live 'opcua' source cannot serve OPC DA servers {da}: OPC DA "
            "requires a COM client (Windows-only); use option 'replay' or "
            "the opcsim source for DA topologies"
        )
    return [
        AsyncuaClientFactory(
            s,
            subscribe_paths=tuple(
                e.opc_path for e in s.entries if e.subscribe
            ),
        )
        for s in topo.servers
    ]


class OpcUaLiveStreamReader(OpcSimStreamReader):
    """Live micro-batch reader. Offset semantics (monotonic sweep counter,
    checkpoint high-water recovery through ``partitions``/``commit``) are
    INHERITED from ``OpcSimStreamReader`` — parity by construction, and
    the restart golden (tests/test_opcsource.py) covers both through the
    same code path. Only the per-sweep value fetch differs."""

    def __init__(
        self,
        topo: OpcTopology,
        sweeps_per_batch: int,
        max_sweeps: int,
        factories: list[AsyncuaClientFactory | ReplayClientFactory],
    ) -> None:
        super().__init__(topo, sweeps_per_batch, max_sweeps)
        self.factories = factories

    def read(self, partition: _ServerPartition):
        """Read the planned sweep range, emitting Arrow RecordBatches (r11
        — same boundary as opcsim's ``_sweep_batches``: the per-row cost
        here is the client RPC, but the Python→JVM transfer no longer adds
        a per-row pickle on top). Rows accumulate column-major and flush
        per ~64k rows; a live unbounded deployment therefore ships one IPC
        frame per chunk per micro-batch, not one object per tag read."""
        srv = self.topo.servers[partition.server_idx]
        client = self.factories[partition.server_idx].connect()
        # blank-TYPE entries resolve from the connected session exactly once
        # (reference GetDataType, Program.cs:131-135) and hold for the
        # partition — one extra RPC per inferred tag per micro-batch.
        inferred: dict[str, str] = {}
        cols: list[list] = [[] for _ in range(7)]

        def _flush():
            ts_type = ARROW_SCHEMA.field("sourceTimestamp").type
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], type=ts_type),
                    pa.array(cols[5], type=ts_type),
                    pa.array(cols[6], pa.int32()),
                ],
                schema=ARROW_SCHEMA,
            )
            for c in cols:
                c.clear()
            return batch

        try:
            for sweep in range(partition.start_sweep, partition.end_sweep):
                for entry in srv.entries:
                    dtype = entry.opc_type
                    if not dtype:
                        dtype = inferred.get(entry.opc_path)
                        if dtype is None:
                            dtype = client.resolve_type(entry.opc_path)
                            inferred[entry.opc_path] = dtype
                    raw, sts, ets, quality = client.read_value(
                        entry.opc_path, sweep
                    )
                    cols[0].append(srv.name)
                    cols[1].append(entry.mongo_tag)
                    cols[2].append(dtype)
                    cols[3].append(raw)
                    cols[4].append(dt_to_us(_naive(sts)))
                    cols[5].append(dt_to_us(_naive(ets)))
                    cols[6].append(quality)
                    if len(cols[0]) >= _BATCH_TARGET_ROWS:
                        yield _flush()
            if cols[0]:
                yield _flush()
        finally:
            client.close()


def _naive(ts: datetime | None) -> datetime | None:
    """TimestampType rows cross py4j as naive datetimes (session-local);
    live servers return tz-aware UTC — normalize like opcsim's epoch
    arithmetic does."""
    if ts is not None and ts.tzinfo is not None:
        return ts.replace(tzinfo=None)
    return ts


class OpcUaLiveBatchReader(DataSourceReader):
    """Batch twin: same wire rows for a fixed number of sweeps (the live
    analog of ``OpcSimBatchReader``). Used for bounded backfills/tests;
    implemented as a thin shim over the stream reader's row generator."""

    def __init__(
        self,
        topo: OpcTopology,
        sweeps: int,
        factories: list[AsyncuaClientFactory | ReplayClientFactory],
    ) -> None:
        self._stream = OpcUaLiveStreamReader(topo, sweeps, sweeps, factories)
        self.sweeps = sweeps
        self.topo = topo

    def partitions(self):
        return [
            _ServerPartition(i, 0, self.sweeps)
            for i in range(len(self.topo.servers))
        ]

    def read(self, partition: _ServerPartition):
        yield from self._stream.read(partition)


class OpcUaLiveDataSource(DataSource):
    """Options (superset of ``opcsim`` — swap the format name and a stream
    keeps its checkpoint semantics):

    - ``config``: path to a reference-format .conf file (required)
    - ``sweeps``: batch mode — number of poll sweeps to read (default 8)
    - ``sweeps_per_batch``: stream mode — sweeps per micro-batch (default 1)
    - ``max_sweeps``: stream mode — stop advancing offsets after this many
      sweeps (default 16 when ``replay`` is set; a live deployment passes a
      large bound or 2**62 — the reader itself is unbounded)
    - ``replay``: path to a replay .jsonl — test/offline mode; without it
      the asyncua package is required at read time (never at plan time)
    - ``types``: JSON object ``{opc_path: type}`` filling blank-TYPE conf
      entries up front; blanks it doesn't cover are inferred per session
      from the connected client (live: ``read_data_type_as_variant_type``;
      replay: the records' optional "type" field)
    """

    @classmethod
    def name(cls) -> str:
        return "opcua"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def _topo_and_factories(self):
        path = self.options.get("config")
        if not path:
            raise ValueError("opcua requires option 'config' (.conf path)")
        topo = parse_config_file(path)
        apply_type_lookup(topo, json.loads(self.options.get("types", "{}")))
        return topo, _client_factories(topo, self.options.get("replay"))

    def reader(self, schema: StructType) -> OpcUaLiveBatchReader:
        topo, factories = self._topo_and_factories()
        return OpcUaLiveBatchReader(
            topo, int(self.options.get("sweeps", 8)), factories
        )

    def streamReader(self, schema: StructType) -> OpcUaLiveStreamReader:
        topo, factories = self._topo_and_factories()
        default_bound = 16 if self.options.get("replay") else 2**62
        return OpcUaLiveStreamReader(
            topo,
            int(self.options.get("sweeps_per_batch", 1)),
            int(self.options.get("max_sweeps", default_bound)),
            factories,
        )


def register(spark) -> None:
    spark.dataSource.register(OpcUaLiveDataSource)
