"""``opcsim`` — a PySpark Python data source standing in for the OPC UA/DA
connectors (SURVEY.md R1/R2, §4 item 1).

No live OPC server exists in this environment, so the connector is a
deterministic simulator with the real connector's *shape*:

- one input partition per configured server — the Spark twin of the
  reference's thread-per-server parallelism (reference: OPC2MongoDB/
  Program.cs:1300-1312);
- per-tag declared types from the config, emitted as RAW string values +
  a dataType column — normalization happens downstream through the same
  coercion expressions as batch (functions/coercion.py), exactly once;
- a micro-batch stream reader whose offset is a monotonically increasing
  sweep counter — each sweep is one poll cycle (R2's
  ``Thread.Sleep(read_period)`` loop becomes the trigger interval);
- ``subscribe`` tags change value every sweep, poll-only tags change every
  4th sweep (push-vs-poll duality, R1 vs R2, compressed into cadence).

A live implementation would replace the per-sweep value render with an OPC
client call; every other line stays (sources/opc_live.py does exactly that).

Both readers yield **pyarrow.RecordBatch** chunks (r11): the Python data
source API accepts Arrow batches from ``read()``, which moves the
Python→JVM boundary cost from per-row pickling to one Arrow IPC frame per
~64k rows. ``_sweep_rows`` (the original tuple generator) is kept as the
semantic spec: a parity test asserts the batched reader reproduces its
rows exactly.

Records: server, tag, dataType, raw, sourceTimestamp, serverTimestamp,
quality — the pre-normalization wire format.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opc2mongodb_spark.sources.config import (
    OpcTopology,
    apply_type_lookup,
    parse_config_file,
)

RAW_SCHEMA = StructType(
    [
        StructField("server", StringType()),
        StructField("tag", StringType()),
        StructField("dataType", StringType()),
        StructField("raw", StringType()),
        StructField("sourceTimestamp", TimestampType()),
        StructField("serverTimestamp", TimestampType()),
        StructField("quality", IntegerType()),
    ]
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Arrow wire schema — must mirror RAW_SCHEMA exactly (names, order, types) so
# RecordBatch yields from read() land bit-identical to the old tuple path.
# Spark's TimestampType maps to timestamp[us, tz=UTC] under the session's
# UTC timezone (pyspark.sql.pandas.types.to_arrow_schema).
ARROW_SCHEMA = pa.schema(
    [
        pa.field("server", pa.string()),
        pa.field("tag", pa.string()),
        pa.field("dataType", pa.string()),
        pa.field("raw", pa.string()),
        pa.field("sourceTimestamp", pa.timestamp("us", tz="UTC")),
        pa.field("serverTimestamp", pa.timestamp("us", tz="UTC")),
        pa.field("quality", pa.int32()),
    ]
)

# microseconds since the unix epoch at _EPOCH — integer arithmetic, never
# float .timestamp() (floats lose sub-ms precision at 2024-scale epochs)
_EPOCH_US = (
    _EPOCH - datetime(1970, 1, 1, tzinfo=timezone.utc)
) // timedelta(microseconds=1)

# rows per emitted Arrow batch: large enough to amortize the per-batch IPC
# cost, small enough that one batch of 7 narrow columns stays ~a few MB
_BATCH_TARGET_ROWS = 65536


def dt_to_us(ts: datetime | None) -> int | None:
    """datetime → µs since the unix epoch, NAIVE treated as UTC (the session
    timezone) — exact integer arithmetic, matching what the engine's tuple
    converter produced on a UTC host."""
    if ts is None:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return (ts - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
        microseconds=1
    )


def _stable_unit(key: str) -> float:
    """Deterministic pseudo-random in [0, 1) from md5 — no RNG state."""
    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[:12], 16) / float(16**12)


def _render_value(opc_type: str, tag: str, sweep: int, changes: bool) -> str:
    """Deterministic raw value per (tag, sweep); poll-only tags hold their
    value for 4 sweeps (subscribe tags update every sweep)."""
    eff_sweep = sweep if changes else (sweep // 4) * 4
    u = _stable_unit(f"{tag}|{eff_sweep}")
    t = opc_type.strip().lower()
    if t in ("bool", "boolean", "vt_bool", "state"):
        return "true" if u >= 0.5 else "false"
    if t in ("string", "localizedtext", "vt_bstr"):
        return f"s_{int(u * 1e6)}"
    if t in ("datetime", "date", "time", "vt_date"):
        return (_EPOCH + timedelta(seconds=int(u * 86400))).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
    if t in ("int16", "int32", "int64", "integer", "byte", "sbyte", "uint16",
             "uint32", "uint64", "vt_i1", "vt_i2", "vt_i4", "statuscode"):
        return str(int(u * 1000))
    return f"{u * 1000:.4f}"  # float/double/decimal families


class _ServerPartition(InputPartition):
    def __init__(self, server_idx: int, start_sweep: int, end_sweep: int):
        self.server_idx = server_idx
        self.start_sweep = start_sweep
        self.end_sweep = end_sweep


def _sweep_rows(topo: OpcTopology, part: _ServerPartition):
    """Row-tuple semantic spec for ``_sweep_batches`` — not on the hot path
    since r11 (kept for the arrow/tuple parity test and as documentation of
    the per-row contract)."""
    srv = topo.servers[part.server_idx]
    for sweep in range(part.start_sweep, part.end_sweep):
        ts = _EPOCH + timedelta(seconds=sweep * srv.read_period)
        ts = ts.replace(tzinfo=None)
        for entry in srv.entries:
            yield (
                srv.name,
                entry.mongo_tag,
                entry.opc_type,
                _render_value(entry.opc_type, entry.mongo_tag, sweep, entry.subscribe),
                ts,
                ts + timedelta(seconds=1),
                192,
            )


def _sweep_batches(topo: OpcTopology, part: _ServerPartition):
    """Arrow-batched twin of ``_sweep_rows``: one ``pyarrow.RecordBatch``
    per chunk of sweeps instead of one Python tuple per (tag, sweep).

    Row-at-a-time tuple yields paid a per-row pickle + per-cell type
    converter on every record — STREAMBENCH_r10 measured the flagship
    topology at 16.5k rows/s against 351k rows/s for the identical stateful
    core on a JVM source, pinning the Python source as the bridge
    bottleneck. Batching moves the boundary cost from per-row to per-64k
    rows; the remaining Python work (one md5 per changed cell — the
    simulator's value renderer) is the honest floor of the SIMULATOR, not
    of the connector shape.

    Layout per chunk: sweep-major rows (sweep, then conf entry order) —
    the exact multiset ``_sweep_rows`` yields, in the same order. Poll-only
    tags hold a value for 4 sweeps, so their renders are cached per tag for
    the duration of the hold window; subscribe tags change every sweep and
    are never cached. Cache memory is therefore O(n_tags), independent of
    the sweep count — a large batch read never accumulates per-row state.
    """
    srv = topo.servers[part.server_idx]
    n_tags = len(srv.entries)
    if n_tags == 0 or part.start_sweep >= part.end_sweep:
        return
    tags = [e.mongo_tag for e in srv.entries]
    dtypes = [e.opc_type for e in srv.entries]
    subs = [e.subscribe for e in srv.entries]
    sweeps_per_chunk = max(1, _BATCH_TARGET_ROWS // n_tags)
    # tag -> (effective sweep, rendered value); poll tags only. Sweeps are
    # visited in ascending order, so the effective sweep per tag is
    # nondecreasing and overwriting on change is exact eviction.
    poll_cache: dict[str, tuple[int, str]] = {}
    for lo in range(part.start_sweep, part.end_sweep, sweeps_per_chunk):
        hi = min(lo + sweeps_per_chunk, part.end_sweep)
        n_sweeps = hi - lo
        n_rows = n_sweeps * n_tags
        raw_vals: list[str] = []
        for sweep in range(lo, hi):
            for tag, dt, sub in zip(tags, dtypes, subs):
                if sub:
                    raw_vals.append(_render_value(dt, tag, sweep, True))
                    continue
                eff = (sweep // 4) * 4
                hit = poll_cache.get(tag)
                if hit is None or hit[0] != eff:
                    v = _render_value(dt, tag, sweep, False)
                    poll_cache[tag] = (eff, v)
                else:
                    v = hit[1]
                raw_vals.append(v)
        src_us = np.repeat(
            _EPOCH_US
            + np.arange(lo, hi, dtype=np.int64) * (srv.read_period * 1_000_000),
            n_tags,
        )
        ts_type = ARROW_SCHEMA.field("sourceTimestamp").type
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([srv.name] * n_rows, pa.string()),
                pa.array(tags * n_sweeps, pa.string()),
                pa.array(dtypes * n_sweeps, pa.string()),
                pa.array(raw_vals, pa.string()),
                pa.array(src_us, type=ts_type),
                pa.array(src_us + 1_000_000, type=ts_type),
                pa.array(np.full(n_rows, 192, dtype=np.int32)),
            ],
            schema=ARROW_SCHEMA,
        )


class OpcSimBatchReader(DataSourceReader):
    def __init__(self, topo: OpcTopology, sweeps: int):
        self.topo = topo
        self.sweeps = sweeps

    def partitions(self):
        return [
            _ServerPartition(i, 0, self.sweeps)
            for i in range(len(self.topo.servers))
        ]

    def read(self, partition: _ServerPartition):
        yield from _sweep_batches(self.topo, partition)


class OpcSimStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset == completed sweep count (global).

    ``max_sweeps`` bounds the simulation so ``processAllAvailable`` can
    drain it in tests; a live OPC connector would be unbounded.

    Restart contract (R10: retry/reconnect = checkpoint + restart): a fresh
    reader instance starts with ``_latest = 0``, below the checkpointed
    offset. Every engine callback that reveals a checkpointed offset
    (``partitions`` replaying the pending batch, ``commit``) raises the
    high-water mark, so ``latestOffset`` is monotonic across restarts and
    never plans an inverted/empty batch range behind the checkpoint."""

    def __init__(self, topo: OpcTopology, sweeps_per_batch: int, max_sweeps: int):
        self.topo = topo
        self.sweeps_per_batch = sweeps_per_batch
        self.max_sweeps = max_sweeps
        self._latest = 0

    def initialOffset(self):
        return {"sweep": 0}

    def latestOffset(self):
        self._latest = min(self._latest + self.sweeps_per_batch, self.max_sweeps)
        return {"sweep": self._latest}

    def partitions(self, start: dict, end: dict):
        # start/end come from the checkpoint on restart — recover the
        # high-water mark so the next latestOffset() continues from there.
        self._latest = max(self._latest, end["sweep"])
        return [
            _ServerPartition(i, start["sweep"], end["sweep"])
            for i in range(len(self.topo.servers))
        ]

    def read(self, partition: _ServerPartition):
        yield from _sweep_batches(self.topo, partition)

    def commit(self, end: dict) -> None:
        self._latest = max(self._latest, end["sweep"])


class OpcSimDataSource(DataSource):
    """Options:
    - ``config``: path to a reference-format .conf file (required)
    - ``sweeps``: batch mode — number of poll sweeps to materialize (default 8)
    - ``sweeps_per_batch``: stream mode — sweeps per micro-batch (default 1)
    - ``max_sweeps``: stream mode — stop advancing offsets after this many
      sweeps (default 16; simulation bound, not a connector concept)
    - ``types``: JSON object ``{opc_path: type}`` filling blank-TYPE conf
      entries (the reference infers those from the live server,
      Program.cs:131-135 — a simulator has no server to ask, so blanks not
      covered by the lookup are a loud config error)
    """

    @classmethod
    def name(cls) -> str:
        return "opcsim"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def _topo(self) -> OpcTopology:
        path = self.options.get("config")
        if not path:
            raise ValueError("opcsim requires option 'config' (.conf path)")
        topo = parse_config_file(path)
        lookup = json.loads(self.options.get("types", "{}"))
        missing = apply_type_lookup(topo, lookup)
        if missing:
            raise ValueError(
                f"opcsim cannot infer types for blank-TYPE entries {missing}: "
                "declare them in the conf or pass option 'types'"
            )
        return topo

    def reader(self, schema: StructType) -> OpcSimBatchReader:
        return OpcSimBatchReader(self._topo(), int(self.options.get("sweeps", 8)))

    def streamReader(self, schema: StructType) -> OpcSimStreamReader:
        return OpcSimStreamReader(
            self._topo(),
            int(self.options.get("sweeps_per_batch", 1)),
            int(self.options.get("max_sweeps", 16)),
        )


def register(spark) -> None:
    spark.dataSource.register(OpcSimDataSource)
