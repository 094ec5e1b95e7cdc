"""Local twin of the driver's DuckDB-oracle correctness check.

Runs a registered query through Spark AND its oracle SQL through DuckDB on
the same parquet directory, then compares row count, column names and an
order-insensitive canonicalized value multiset. Used by tests/test_oracle.py
so every query is verified the same way the driver verifies it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from opc2mongodb_spark.sources.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize one cell for cross-engine comparison.

    TYPE-STRICT: each cell is tagged with a type class so int-vs-float and
    Decimal-vs-float splits FAIL, mirroring the driver's hasher (round 1
    shipped 9 hash failures because the old `==`-based compare treated
    123 == 123.0 and Decimal('153578.00') == 153578.0 as equal while the
    driver renders them differently). See VERDICT.md round 1, item 2.
    """
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", f)
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        # str() preserves scale: Decimal('153578.00') != Decimal('153578.0')
        return ("d", str(v))
    if isinstance(v, datetime.datetime):
        return (
            "t",
            v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"),
        )
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a",) + tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return ("x", v.hex())
    if isinstance(v, str):
        return ("s", v)
    return v


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_query(spark, sf_dir: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    from opc2mongodb_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.build(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    problems: list[str] = []
    # Policy gate: DECIMAL must never reach the final output schema. The
    # driver's harness converts one engine's decimals to double and not the
    # other's, so any trailing-zero value (certain with integer-valued
    # l_quantity) breaks its hash even when both sides are exactly equal
    # locally (round-1 failures: q_project, q_group_agg, q_rollup, ...).
    # Keep DECIMAL inside aggregations; cast finals to DOUBLE on both sides.
    from pyspark.sql.types import ArrayType, DecimalType

    def _has_decimal(dt) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return _has_decimal(dt.elementType)
        return False

    dec_cols = [f.name for f in sdf.schema.fields if _has_decimal(f.dataType)]
    if dec_cols:
        problems.append(
            f"{name}: DECIMAL in final Spark schema {dec_cols} — cast to "
            "DOUBLE on both sides (driver hash gate renders decimals "
            "asymmetrically)"
        )
    if spec.oracle is None:
        if len(spark_rows) == 0:
            problems.append(f"{name}: rows-only check, got 0 rows")
        return problems

    con = duckdb_connect(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
        )
    s = canonical_rows(spark_cols, spark_rows)
    d = canonical_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        extra = abs(len(s) - len(d))
        problems.append(
            f"{name}: value mismatch; first diffs={diffs!r} (+{extra} length delta)"
        )
    return problems
