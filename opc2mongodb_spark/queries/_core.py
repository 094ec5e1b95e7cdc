"""Registry core: QuerySpec/REGISTRY/register and the shared
cross-engine rendering helpers (dec / sci9 / _flip_sql / _t).
The determinism rulebook lives in the package docstring
(queries/__init__.py)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opc2mongodb_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(build=fn, oracle=oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: F.Column, scale: int = 2) -> F.Column:
    """Decimal-pin a double for cross-engine exact aggregation."""
    return col.cast(f"decimal(18,{scale})")


def sci9(col: F.Column) -> F.Column:
    """Render a GENERICALLY-IRRATIONAL double (post-sqrt/ln/exp/trig, or a
    decimal→double cast beyond 2^53) as ``%.9e`` — the shared cross-engine
    string render whose oracle twin is DuckDB ``printf('%.9e', ...)``.
    NOT for rationals that can land dyadic-exact (see the module
    docstring's half-UP vs half-EVEN tie rule); those render as scaled
    integers instead."""
    return F.format_string("%.9e", col)


def _flip_sql(b: str, pos: int, n: int) -> str:
    """1-bit flip of a '0'/'1' LSH bucket string at ``pos`` — the SQL twin of
    similarity._flip_bit, so oracles replay multi-probe sets exactly."""
    flipped = f"(CASE WHEN substring({b}, {pos}, 1) = '1' THEN '0' ELSE '1' END)"
    parts = []
    if pos > 1:
        parts.append(f"substring({b}, 1, {pos - 1})")
    parts.append(flipped)
    if pos < n:
        parts.append(f"substring({b}, {pos + 1}, {n - pos})")
    return " || ".join(parts)
