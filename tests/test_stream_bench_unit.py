"""Driver-side unit tests for tools/stream_bench.py's pure pieces:
percentiles, progress reduction (warm-up exclusion, state-row pickup),
and the synthetic topology generator (must round-trip through the real
conf parser). No SparkSession."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import stream_bench  # noqa: E402

from opc2mongodb_spark.sources.config import parse_config_file


def test_pct_nearest_rank():
    assert stream_bench._pct([1.0, 2.0, 3.0, 4.0], 0.50) == 2.0
    assert stream_bench._pct([1.0, 2.0, 3.0, 4.0], 0.95) == 4.0
    assert stream_bench._pct([5.0], 0.95) == 5.0
    assert math.isnan(stream_bench._pct([], 0.5))


def _prog(rows, ms, state=None):
    p = {"numInputRows": rows, "durationMs": {"triggerExecution": ms}}
    if state is not None:
        p["stateOperators"] = [{"numRowsTotal": state}]
    else:
        p["stateOperators"] = []
    return p


def test_lane_metrics_excludes_warmup_and_empty_batches():
    progress = [
        _prog(0, 5),          # empty: never counted
        _prog(100, 1000, 10),  # warm-up 1
        _prog(100, 900, 20),   # warm-up 2
        _prog(100, 500, 30),
        _prog(100, 700, 40),
    ]
    m = stream_bench._lane_metrics(progress, wall_s=3.21)
    assert m["rows"] == 200  # only the two measured batches
    assert m["batches"] == 2
    assert m["wall_s"] == 3.21
    # busy time = 1.2 s over 200 rows
    assert m["rows_per_s"] == round(200 / 1.2, 1)
    assert m["batch_ms_p50"] == 500.0 and m["batch_ms_p95"] == 700.0
    assert m["state_rows"] == 40  # last busy entry with state operators


def test_lane_metrics_short_runs_fall_back_to_all_busy_batches():
    m = stream_bench._lane_metrics([_prog(50, 250, 7)], wall_s=1.0)
    assert m["rows"] == 50 and m["batches"] == 1 and m["state_rows"] == 7


def test_synth_conf_round_trips_through_the_real_parser(tmp_path):
    p = str(tmp_path / "bench.conf")
    total = stream_bench._synth_conf(p, n_servers=3, tags_per_server=5)
    assert total == 15
    topo = parse_config_file(p)
    assert topo.mongo_url.startswith("mongodb://")
    assert [s.name for s in topo.servers] == [
        "BenchServer0", "BenchServer1", "BenchServer2"
    ]
    for s in topo.servers:
        assert s.is_ua and s.read_period == 1
        assert len(s.entries) == 5
        assert all(e.opc_type == "Double" for e in s.entries)
        # alternating subscribe/poll mix, like the reference's conf
        assert [e.subscribe for e in s.entries] == [
            True, False, True, False, True
        ]
        assert all(not e.infer_type for e in s.entries)
