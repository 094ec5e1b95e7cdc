"""Every registered query vs its DuckDB oracle — the driver's t2 check, local.

Runs at BOTH gate SFs (sf0.001 and sf0.01) in a single pytest invocation via
the ``oracle_sf_dir`` fixture: the driver's gate samples at sf0.01, and a
sweep that only covers sf0.001 under-predicts it (round 1 shipped 9 hash
failures that way)."""

from __future__ import annotations

import glob
import hashlib
import os
import re

import pytest

from opc2mongodb_spark.oracle import compare_query
from opc2mongodb_spark.queries import REGISTRY


def _round_rotated(names: list[str], k: int = 50) -> list[str]:
    """r6 VERDICT #8: the driver's 50-query sample has been static since
    r5, so most of the registry is only ever exercised by this local
    sweep. Rotate a deterministic, ROUND-KEYED 50-query subset into the
    sweep's FIRST positions (md5(round || name) order — no seed state, no
    RNG), so each round a different slice fails fastest if a cross-engine
    edge slips in; the remainder follows alphabetically and the full set
    is still swept every run. The round key is the next round number
    derived from the CORRECTNESS_r*.json files the driver leaves in the
    repo root (0 when absent — e.g. CI on a bare checkout)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    key = (max(rounds) + 1) if rounds else 0
    ranked = sorted(
        names,
        key=lambda n: hashlib.md5(f"r{key}:{n}".encode()).hexdigest(),
    )
    first = ranked[:k]
    rest = sorted(set(names) - set(first))
    return first + rest


@pytest.mark.parametrize("name", _round_rotated(sorted(REGISTRY)))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    problems = compare_query(spark, oracle_sf_dir, name)
    assert not problems, "\n".join(problems)


# ---------------------------------------------------------------------------
# r6 flap-stress: fresh-JVM repetition of the rendering-edge queries
# ---------------------------------------------------------------------------

# The five queries whose determinism hangs on a cross-engine rendering edge
# (r5 VERDICT #4): raw-double emission, NULL z on degenerate cohorts, sketch
# estimate arithmetic, skyline ties, NTILE boundaries. The sweep above runs
# them once per SF per session; AQE flakiness only shows across FRESH JVMs,
# so the stress lives in tools/stress_oracle.py (N fresh subprocesses x both
# SFs). It is too slow for every pytest run — opt in with
# SPARK_GRAFT_STRESS=1. Last full run: 10 fresh-session iterations, 0 flaps
# (see README "Determinism stress").
STRESS_QUERIES = [
    "q_pagerank2",
    "q_abtest_lift",
    "q_kmv_set_ops",
    "q_skyline2d",
    "q_rfm_segments",
    # r6/r7 additions (r6 VERDICT #4): none were ever driver-sampled and
    # several carry transcendental / rendering edges — psi's ln-of-ratio
    # terms, chi2's expected-count divisions, KS's at_value tie, histogram
    # median's bucket-boundary floats, hard-negatives' cosine margins,
    # CUSUM's cumulative deviations, Gini's rank arithmetic.
    "q_psi_drift",
    "q_chi2_independence",
    "q_ks_drift",
    "q_histogram_median",
    "q_hard_negatives",
    "q_cusum_changepoint",
    "q_key_skew_gini",
    "q_mad_outliers",
    "q_join_asof_tol",
    "q_kanonymity",
    "q_ldiversity",
    "q_bpe_pair_counts",
    "q_session_pattern",
    # r7 additions: quantile/decile rank selections (bucket-boundary
    # floats), benford's pinned log10 terms, trend slope's %.9e rendering,
    # overlap/stickiness divisions.
    "q_quantiles_histogram",
    "q_latency_sla",
    "q_winsorize",
    "q_benford",
    "q_trend_slope",
    "q_seq_length_buckets",
    "q_user_overlap",
    "q_dau_wau",
    "q_activity_streaks",
    "q_canonical_choice",
    # r8 batch-4 additions: rrf's cosine-ordered ranks + IEEE fusion
    # sums, interval-union's coverage division, weighted-median's carried
    # doubles at weight-crossing boundaries, bitmap jaccard division.
    "q_rrf_fusion",
    "q_interval_union",
    "q_weighted_median",
    "q_bitmap_distinct",
    "q_score_calibration",
]


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_STRESS"),
    reason="fresh-JVM stress is opt-in: SPARK_GRAFT_STRESS=1",
)
def test_rendering_edge_queries_survive_fresh_sessions():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/stress_oracle.py", "3"],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
