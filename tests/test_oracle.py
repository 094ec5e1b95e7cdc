"""Every registered query vs its DuckDB oracle — the driver's t2 check, local."""

from __future__ import annotations

import pytest

from opc2mongodb_spark.oracle import compare_query
from opc2mongodb_spark.queries import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = compare_query(spark, sf_dir, name)
    assert not problems, "\n".join(problems)
