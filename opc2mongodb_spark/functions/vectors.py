"""Vector math over array<float/double> columns — pure Column expressions.

Everything stays JVM-side (F.zip_with / F.aggregate fold), no Python UDFs:
at 100 TB a row-at-a-time Python cosine would be the bottleneck; these
expressions run inside whole-stage codegen.

Determinism note: the fold accumulates in index order with double precision,
which is bit-identical to DuckDB's list_dot_product (verified empirically in
tests/test_oracle.py via q_cosine_topk) — so oracle checks compare raw
doubles, no rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product, sequential fold in index order, double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
