"""Every registered query vs its DuckDB oracle — the driver's t2 check, local.

Runs at BOTH gate SFs (sf0.001 and sf0.01) in a single pytest invocation via
the ``oracle_sf_dir`` fixture: the driver's gate samples at sf0.01, and a
sweep that only covers sf0.001 under-predicts it (round 1 shipped 9 hash
failures that way)."""

from __future__ import annotations

import pytest

from opc2mongodb_spark.oracle import compare_query
from opc2mongodb_spark.queries import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    problems = compare_query(spark, oracle_sf_dir, name)
    assert not problems, "\n".join(problems)
