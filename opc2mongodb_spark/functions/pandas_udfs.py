"""Pandas-UDF surface (SURVEY.md I1/I2) — the sanctioned Python escape hatch.

Rules of engagement (enforced by example here):
- scalar work that built-ins can express stays as Column expressions;
- when Python is genuinely needed, it's ``pandas_udf`` / ``applyInPandas``
  (Arrow-batched, 10-100x over row-at-a-time UDFs) — never ``udf()``.

Each function below has a pure-Column twin used by tests to pin semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def winsorize_p05_p95():
    """I1 scalar pandas UDF: clamp to the batch's [p5, p95] — a pandas-side
    op with no single-expression SQL equivalent (quantile of the batch).
    Factory (not module-level decorator) because pandas_udf registration
    needs an active session."""

    @pandas_udf("double")
    def _winsorize(v: pd.Series) -> pd.Series:  # pragma: worker
        lo, hi = v.quantile(0.05), v.quantile(0.95)
        return v.clip(lower=lo, upper=hi)

    return _winsorize


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """I2 grouped-map applyInPandas: per-group z-score. The Column twin
    (zscore_per_group_expr) computes the same thing with window functions —
    tests assert they agree, demonstrating when NOT to use Python too."""
    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_fields}, zscore double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: worker
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if (std == 0 or pd.isna(std)) else (
            (pdf[value_col] - mean) / std
        )
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=out_schema)


def zscore_per_group_expr(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The JVM-side twin: same math, window functions, no Python."""
    w = Window.partitionBy(group_col)
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn(
        "zscore",
        F.when(std == 0, F.lit(0.0)).otherwise((F.col(value_col) - mean) / std),
    )


def normalized_len_udf():
    """I1 scalar pandas UDF with DETERMINISTIC, SQL-replayable semantics
    (whitespace-normalized length) — used by q_udf_textnorm so the scalar
    Arrow path itself goes through the driver's oracle gate, not just
    pytest. Factory for the same session-registration reason as above."""

    @pandas_udf("integer")
    def _norm_len(s: pd.Series) -> pd.Series:  # pragma: worker
        return (
            s.str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
            .str.len()
            .astype("int32")
        )

    return _norm_len


def robust_stats_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """I2 grouped-map with an exact SQL twin: per-group median and MAD
    (median absolute deviation) — the robust-statistics pass a quality
    pipeline runs before z-scoring. Median interpolation ((a+b)/2 on the
    two middle order statistics) is bit-identical between numpy and
    DuckDB's median(), so the driver's hash gate passes on raw doubles.
    """
    import numpy as np

    out_schema = f"{group_col} bigint, med double, mad double, n bigint"

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: worker
        v = pdf[value_col].dropna()
        if len(v):
            med = float(np.median(v))
            mad = float(np.median((v - med).abs()))
        else:
            med = mad = None
        return pd.DataFrame(
            [[pdf[group_col].iloc[0], med, mad, len(v)]],
            columns=[group_col, "med", "mad", "n"],
        )

    return df.groupBy(group_col).applyInPandas(_stats, schema=out_schema)


def trimmed_mean_agg(trim: float = 0.1):
    """GROUPED_AGG pandas UDF (the third pandas-UDF flavor, r5): per-group
    trimmed mean — drop the top/bottom ``trim`` fraction of values, then
    average. A robust-location aggregate with no built-in equivalent (the
    trim boundary is a group-level quantile, so no single expression can
    compute it), usable directly in ``groupBy().agg(...)`` and as a window
    aggregate.

    Scale note: a GROUPED_AGG UDF materializes each group's column in one
    Arrow batch — state is O(group size). Fine for keyed telemetry/quality
    groups; for mega-groups prefer approx-quantile clamps + avg in pure
    Columns. Factory: registration needs an active session."""

    @pandas_udf("double")
    def _trimmed_mean(v: pd.Series) -> float:  # pragma: worker
        v = v.dropna().sort_values(kind="stable")
        k = int(len(v) * trim)
        kept = v.iloc[k: len(v) - k] if len(v) > 2 * k else v
        return float(kept.mean()) if len(kept) else None

    return _trimmed_mean
