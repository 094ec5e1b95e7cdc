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

import pandas as pd
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


def cosine_pandas():
    """Arrow-vectorized cosine — the throughput path for bulk scoring.

    Higher-order-function folds (``dot``/``cosine`` above) are interpreted
    expressions (no whole-stage codegen), so at millions of pairs they cost
    real time; this pandas UDF computes batches with numpy SIMD instead.
    Trade-off: numpy's pairwise/BLAS accumulation is NOT bit-identical to
    the sequential fold (≈1e-16 relative), so oracle-checked queries keep
    the fold and bulk pipelines use this. Factory: pandas_udf registration
    needs an active session.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: worker
        am = np.stack(a.to_numpy()).astype(np.float64)
        bm = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", am, bm)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(num / den)

    return _cos
