"""Driver-side unit tests for opc2mongodb_spark/oracle.py itself.

The both-SF sweep (tests/test_oracle.py) runs compare_query 782 times but
only ever sees PASSES — the mismatch-detection branches (decimal gate,
column/row-count/value diffs, rows-only fallback) had zero executions
anywhere before r10. An oracle that cannot detect mismatches is untested
tooling; these tests feed it deliberately-broken query specs and assert
each failure mode fires with its diagnostic.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from opc2mongodb_spark.oracle import (
    _canon,
    canonical_rows,
    compare_query,
    duckdb_connect,
)
from opc2mongodb_spark.queries import REGISTRY
from opc2mongodb_spark.queries._core import QuerySpec
from opc2mongodb_spark.sources.tables import TABLE_NAMES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# _canon: the type-strict cell canonicalizer (round-1 lesson: 123 != 123.0)
# ---------------------------------------------------------------------------


def test_canon_type_strictness():
    import numpy as np

    assert _canon(123) == ("i", 123)
    assert _canon(np.int64(123)) == ("i", 123)
    assert _canon(123.0) == ("f", 123.0)
    assert _canon(np.float64(123.0)) == ("f", 123.0)
    # the three splits the driver's hasher renders differently MUST differ
    assert _canon(123) != _canon(123.0)
    assert _canon(decimal.Decimal("123")) != _canon(123)
    assert _canon(True) == ("b", True)
    assert _canon(True) != _canon(1)  # bool is not int here, unlike Python
    assert _canon(None) is None


def test_canon_decimal_preserves_scale():
    assert _canon(decimal.Decimal("153578.00")) == ("d", "153578.00")
    assert _canon(decimal.Decimal("153578.0")) != _canon(
        decimal.Decimal("153578.00")
    )


def test_canon_nan_and_containers():
    import math

    assert _canon(float("nan")) == ("f", "NaN")
    assert _canon(math.nan) == _canon(float("nan"))  # NaN != NaN, tag equal
    assert _canon([1, 2.0]) == ("a", ("i", 1), ("f", 2.0))
    assert _canon((1,)) == ("a", ("i", 1))
    assert _canon(b"\x01\xff") == ("x", "01ff")
    assert _canon("x") == ("s", "x")
    # unknown types fall through unchanged (no silent stringification —
    # a type neither engine should emit must fail the compare loudly)
    assert _canon(complex(1, 2)) == complex(1, 2)


def test_canon_datetimes_strip_zone():
    aware = datetime.datetime(
        2024, 1, 1, 12, 0, 0, 5, tzinfo=datetime.timezone.utc
    )
    naive = datetime.datetime(2024, 1, 1, 12, 0, 0, 5)
    assert _canon(aware) == _canon(naive) == ("t", "2024-01-01 12:00:00.000005")
    assert _canon(datetime.date(2024, 1, 2)) == ("t", "2024-01-02")


def test_canonical_rows_column_order_and_row_sort():
    # columns sorted by NAME before hashing — (b, a) reorders to (a, b)
    rows = [(2, "y"), (1, "x"), (None, "z")]
    got = canonical_rows(["b", "a"], rows)
    # each row becomes (a_val, b_val); rows sorted with None-first key logic
    assert got == sorted(
        [(("s", "y"), ("i", 2)), (("s", "x"), ("i", 1)), (("s", "z"), None)],
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


def test_duckdb_connect_registers_all_views():
    con = duckdb_connect(SF)
    for t in TABLE_NAMES:
        n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert n >= 0  # view resolves; empty is legal


# ---------------------------------------------------------------------------
# compare_query failure modes, via deliberately-broken specs
# ---------------------------------------------------------------------------


@pytest.fixture
def fake_registry(monkeypatch):
    """Install a throwaway spec under a reserved name; yields a setter."""

    def _install(name: str, build, oracle):
        monkeypatch.setitem(REGISTRY, name, QuerySpec(build=build, oracle=oracle))
        return name

    return _install


def test_compare_query_pass_on_real_registered_query(spark):
    assert compare_query(spark, SF, "q_project") == []


def test_compare_query_decimal_gate(spark, fake_registry):
    from pyspark.sql import functions as F

    name = fake_registry(
        "q__test_decimal",
        lambda s, d: s.range(1).select(
            F.lit(1.5).cast("decimal(18,2)").alias("v")
        ),
        "SELECT CAST(1.5 AS DOUBLE) AS v",
    )
    probs = compare_query(spark, SF, name)
    # the gate reports AND the value compare still runs (decimal-vs-float
    # canonicalization is itself a mismatch) — both diagnostics surface
    assert "DECIMAL in final Spark schema" in probs[0]
    assert any("value mismatch" in p for p in probs[1:])


def test_compare_query_decimal_gate_sees_array_elements(spark, fake_registry):
    from pyspark.sql import functions as F

    name = fake_registry(
        "q__test_decimal_arr",
        lambda s, d: s.range(1).select(
            F.array(F.lit(1.5).cast("decimal(18,2)")).alias("v")
        ),
        "SELECT [CAST(1.5 AS DOUBLE)] AS v",
    )
    probs = compare_query(spark, SF, name)
    assert probs and "DECIMAL" in probs[0]


def test_compare_query_rows_only_contract(spark, fake_registry):
    empty = fake_registry(
        "q__test_rows_only_empty",
        lambda s, d: s.range(1).filter("id < 0"),
        None,
    )
    probs = compare_query(spark, SF, empty)
    assert probs == [f"{empty}: rows-only check, got 0 rows"]

    nonempty = fake_registry(
        "q__test_rows_only_ok", lambda s, d: s.range(3), None
    )
    assert compare_query(spark, SF, nonempty) == []


def test_compare_query_column_mismatch_short_circuits(spark, fake_registry):
    from pyspark.sql import functions as F

    name = fake_registry(
        "q__test_cols",
        lambda s, d: s.range(1).select(F.col("id").alias("a")),
        "SELECT 0 AS b",
    )
    probs = compare_query(spark, SF, name)
    assert len(probs) == 1 and "column mismatch" in probs[0]


def test_compare_query_row_count_and_value_mismatch(spark, fake_registry):
    name = fake_registry(
        "q__test_rows",
        lambda s, d: s.range(3).selectExpr("id AS a"),
        "SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (1)) t(a)",
    )
    probs = compare_query(spark, SF, name)
    assert any("row count mismatch spark=3 duck=2" in p for p in probs)
    assert any("value mismatch" in p for p in probs)


def test_compare_query_value_mismatch_same_count(spark, fake_registry):
    name = fake_registry(
        "q__test_vals",
        lambda s, d: s.range(2).selectExpr("id AS a"),
        "SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (99)) t(a)",
    )
    probs = compare_query(spark, SF, name)
    assert len(probs) == 1 and "value mismatch" in probs[0]
    assert "99" in probs[0]  # the diff sample names the offending value


def test_compare_query_int_float_split_is_a_mismatch(spark, fake_registry):
    """The round-1 regression class: identical-looking values of different
    type classes must FAIL (the driver's hasher renders them differently)."""
    name = fake_registry(
        "q__test_intfloat",
        lambda s, d: s.range(1).selectExpr("CAST(1 AS DOUBLE) AS a"),
        "SELECT CAST(1 AS BIGINT) AS a",
    )
    probs = compare_query(spark, SF, name)
    assert len(probs) == 1 and "value mismatch" in probs[0]
