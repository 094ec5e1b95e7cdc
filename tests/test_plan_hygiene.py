"""Registry-wide physical-plan hygiene (r8).

The per-batch plan-shape tests in test_operators.py assert specific
shapes for specific queries; this module asserts the three GLOBAL
invariants over EVERY registered query — so a future addition cannot
ship a scale-killer silently (the way r6's q_psi_drift did):

1. no ``CartesianProduct`` anywhere (an un-broadcast cross join is a
   |A| x |B| shuffle explosion; intended tiny cross joins compile to
   ``BroadcastNestedLoopJoin``);
2. no Python row evaluation (``BatchEvalPython``) — the repo rule is
   built-in Columns, with Arrow-batched pandas UDFs
   (``ArrowEvalPython``) only where Columns can't express the op;
3. every ``Exchange SinglePartition`` sits directly above an aggregate
   (a <= |groups|/|cells|-row frame), never above raw rows — the
   global-sort-window anti-pattern.

Each invariant carries an explicit, justified exception list; an
addition that needs an exception has to come HERE and say why.
"""

from __future__ import annotations

import pytest

# Queries whose semantics genuinely need a pandas UDF (Arrow-batched):
# the I1/I2 pandas-UDF surface itself.
ARROW_EVAL_OK = {
    "q_udf_textnorm",  # I1: the scalar pandas-UDF demonstration surface
    "q_robust_stats",  # I2: grouped-map median/MAD (applyInPandas)
    # greedy MMR is sequential with cross-candidate interaction (not
    # Column-expressible); per-group frame bounded by the upstream top-8
    "q_mmr_rerank",
}

# Queries where an Exchange SinglePartition above a non-aggregate is
# accepted, with the reason. The common accepted shape is the two-phase
# top-k/frontier decomposition: a partitioned window + rank filter
# bounds the candidate frame BEFORE the global collapse, but the
# bounding shows up as Filter-over-Window (not an Aggregate), which the
# detector cannot prove bounded from plan text alone.
SINGLE_PARTITION_OK = {
    # phase-2 global window runs over the union of per-bucket k-minima:
    # <= 32 buckets x k=16 rows = 512 rows by construction.
    "q_kmv_set_ops",
    # phase-2 global window runs over the union of 32 per-bucket partial
    # skylines — frontier-sized, the operator's own output bound
    # (skyline distributivity; see the query docstring).
    "q_skyline2d",
    # three global ntile(5) windows over the per-user purchase rollup —
    # an aggregate-bounded (|users|) frame, but Catalyst puts the 1-row
    # max-date BroadcastNestedLoopJoin between the Exchange and the
    # bounding HashAggregate so the walk stops at the join. Bound is
    # documented in the query docstring.
    "q_rfm_segments",
}


def _iter_plans(spark, sf_dir):
    from opc2mongodb_spark.plans.checks import explain_str
    from opc2mongodb_spark.queries import REGISTRY

    for name, spec in sorted(REGISTRY.items()):
        df = spec.build(spark, sf_dir)
        yield name, explain_str(df, mode="simple")


def test_registry_plan_hygiene(spark, sf_dir):
    from tests.test_operators import (
        _single_partition_exchanges_feed_aggregates,
    )

    offenders: dict[str, list[str]] = {
        "cartesian": [],
        "python_eval": [],
        "single_partition_raw": [],
    }
    for name, plan in _iter_plans(spark, sf_dir):
        if "CartesianProduct" in plan:
            offenders["cartesian"].append(name)
        if "BatchEvalPython" in plan:
            offenders["python_eval"].append(name)
        if "ArrowEvalPython" in plan and name not in ARROW_EVAL_OK:
            offenders["python_eval"].append(name)
        if name not in SINGLE_PARTITION_OK:
            bad = _single_partition_exchanges_feed_aggregates(plan)
            if bad:
                offenders["single_partition_raw"].append(f"{name}: {bad[0]}")

    assert not offenders["cartesian"], offenders["cartesian"]
    assert not offenders["python_eval"], offenders["python_eval"]
    assert not offenders["single_partition_raw"], offenders[
        "single_partition_raw"
    ]
