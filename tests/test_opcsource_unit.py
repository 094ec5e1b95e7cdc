"""Driver-side unit tests for the opcsim Python data source internals
(sources/opc.py).

The goldens run this source through Spark, where the DataSourceReader
callbacks execute inside the Python data-source worker process — invisible
to a driver tracer. The reader protocol is plain Python, so these tests
drive it directly: partition planning, sweep-row generation, the streaming
offset lifecycle (including the restart high-water-mark contract the
docstring promises), and the DataSource option wiring. No SparkSession.
"""

from __future__ import annotations

import os

import pytest

from opc2mongodb_spark.sources.opc import (
    RAW_SCHEMA,
    OpcSimBatchReader,
    OpcSimDataSource,
    OpcSimStreamReader,
    _ServerPartition,
    _sweep_rows,
)
from opc2mongodb_spark.sources.config import parse_config_file

CONF = os.path.join(os.path.dirname(__file__), "fixtures", "opcsim.conf")


def _topo():
    return parse_config_file(CONF)


def test_sweep_rows_shape_and_determinism():
    topo = _topo()
    part = _ServerPartition(0, 0, 3)
    rows = list(_sweep_rows(topo, part))
    n_tags = len(topo.servers[0].entries)
    assert len(rows) == 3 * n_tags
    # wire arity matches RAW_SCHEMA; quality always GOOD in the simulator
    assert all(len(r) == len(RAW_SCHEMA.fields) for r in rows)
    assert all(r[-1] == 192 for r in rows)
    # serverTimestamp = sourceTimestamp + 1s; timestamps naive (session UTC)
    assert all((r[5] - r[4]).total_seconds() == 1.0 for r in rows)
    assert rows == list(_sweep_rows(topo, _ServerPartition(0, 0, 3)))
    # a later window generates different sweeps for subscribe tags
    later = list(_sweep_rows(topo, _ServerPartition(0, 3, 6)))
    assert later != rows


def test_batch_reader_partitions_per_server():
    topo = _topo()
    r = OpcSimBatchReader(topo, sweeps=4)
    parts = r.partitions()
    assert [p.server_idx for p in parts] == list(range(len(topo.servers)))
    assert all((p.start_sweep, p.end_sweep) == (0, 4) for p in parts)
    got = list(r.read(parts[0]))
    assert len(got) == 4 * len(topo.servers[0].entries)


def test_stream_reader_offset_lifecycle_and_restart_contract():
    topo = _topo()
    r = OpcSimStreamReader(topo, sweeps_per_batch=4, max_sweeps=10)
    assert r.initialOffset() == {"sweep": 0}
    assert r.latestOffset() == {"sweep": 4}
    assert r.latestOffset() == {"sweep": 8}
    assert r.latestOffset() == {"sweep": 10}  # capped at max_sweeps
    assert r.latestOffset() == {"sweep": 10}

    # restart: a FRESH reader recovers the high-water mark from whichever
    # engine callback first reveals the checkpointed offset — latestOffset
    # must never plan an inverted/empty range behind the checkpoint
    r2 = OpcSimStreamReader(topo, sweeps_per_batch=4, max_sweeps=20)
    parts = r2.partitions({"sweep": 4}, {"sweep": 8})
    assert [p.server_idx for p in parts] == list(range(len(topo.servers)))
    assert all((p.start_sweep, p.end_sweep) == (4, 8) for p in parts)
    assert r2.latestOffset() == {"sweep": 12}

    r3 = OpcSimStreamReader(topo, sweeps_per_batch=4, max_sweeps=20)
    r3.commit({"sweep": 8})
    assert r3.latestOffset() == {"sweep": 12}

    rows = list(r2.read(parts[0]))
    assert len(rows) == 4 * len(topo.servers[0].entries)


def test_datasource_option_wiring():
    assert OpcSimDataSource.name() == "opcsim"
    ds = OpcSimDataSource(options={"config": CONF, "sweeps": "3"})
    assert ds.schema() == RAW_SCHEMA
    batch = ds.reader(RAW_SCHEMA)
    assert batch.sweeps == 3

    ds2 = OpcSimDataSource(
        options={"config": CONF, "sweeps_per_batch": "7", "max_sweeps": "21"}
    )
    stream = ds2.streamReader(RAW_SCHEMA)
    assert (stream.sweeps_per_batch, stream.max_sweeps) == (7, 21)


def test_datasource_requires_config_option():
    with pytest.raises(ValueError, match="requires option 'config'"):
        OpcSimDataSource(options={}).reader(RAW_SCHEMA)
