"""I1/I2: pandas-UDF surface agrees with its Column-expression twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opc2mongodb_spark.functions.pandas_udfs import (
    winsorize_p05_p95,
    zscore_per_group,
    zscore_per_group_expr,
)
from opc2mongodb_spark.sources.tables import load_table


def test_grouped_zscore_matches_window_twin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    py = {
        r.event_id: r.zscore
        for r in zscore_per_group(ev, "user_id", "value").collect()
    }
    jvm = {
        r.event_id: r.zscore
        for r in zscore_per_group_expr(ev, "user_id", "value").collect()
    }
    assert set(py) == set(jvm)
    for k in py:
        assert py[k] == pytest.approx(jvm[k], rel=1e-9, abs=1e-9)


def test_winsorize_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("value").coalesce(1)
    out = ev.select(
        F.col("value"), winsorize_p05_p95()(F.col("value")).alias("w")
    ).collect()
    raw = sorted(r.value for r in out)
    lo_region = raw[: max(1, len(raw) // 20)]
    clamped = [r for r in out if r.w != r.value]
    assert clamped, "expected some values clamped"
    # winsorized values never extend beyond raw extremes, and order-preserving
    assert min(r.w for r in out) >= raw[0]
    assert max(r.w for r in out) <= raw[-1]
    assert min(r.w for r in out) >= min(lo_region)


def test_cosine_pandas_matches_fold(spark, sf_dir):
    """The vectorized cosine agrees with the bit-exact fold to float noise."""
    import pytest
    from pyspark.sql import functions as F

    from opc2mongodb_spark.functions.vectors import cosine, cosine_pandas

    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    both = (
        e.crossJoin(q)
        .select(
            "vec_id",
            cosine(F.col("embedding"), F.col("qv")).alias("fold"),
            cosine_pandas()(F.col("embedding"), F.col("qv")).alias("np"),
        )
        .collect()
    )
    assert len(both) == e.count()
    for r in both:
        assert r.np == pytest.approx(r.fold, rel=1e-9, abs=1e-12)


def test_trimmed_mean_grouped_agg(spark):
    """GROUPED_AGG flavor: trimmed mean drops the outliers an untrimmed avg
    absorbs, agrees with a pandas reference per group, and composes in a
    plain groupBy().agg call."""
    import pandas as pd

    from opc2mongodb_spark.functions.pandas_udfs import trimmed_mean_agg

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]] + [
        ("b", float(v)) for v in [10, 20, 30]
    ]
    df = spark.createDataFrame(rows, "key string, value double")
    got = {
        r.key: r.tmean
        for r in df.groupBy("key")
        .agg(trimmed_mean_agg(0.1)(F.col("value")).alias("tmean"))
        .collect()
    }

    def ref(vals, trim=0.1):
        s = pd.Series(vals).sort_values(kind="stable")
        k = int(len(s) * trim)
        kept = s.iloc[k: len(s) - k] if len(s) > 2 * k else s
        return float(kept.mean())

    assert got["a"] == ref([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])
    assert got["a"] < 100  # the 1000 outlier was trimmed
    assert got["b"] == ref([10, 20, 30])
