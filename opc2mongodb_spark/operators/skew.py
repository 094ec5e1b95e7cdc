"""Skew mitigation (SURVEY.md §4 posture: "salt hot tag keys if needed").

At 100 TB a handful of hot tags (or hot join keys) can pin a whole stage on
one task. Two standard remedies, provided as reusable operators:

- ``salted_aggregate``: two-phase agg — partial by (key, salt), final by
  key. Correct for any algebraic aggregate expressed as (partial, merge).
- ``salted_broadcast_left``: for joins, prefer AQE skew-join (on by
  default in session.py) or broadcasting the small side; explicit salting
  of a shuffle join is a last resort and needs the dim replicated per salt.

These complement (not replace) AQE: AQE splits skewed *shuffle blocks*;
salting fixes skew *inside a single key*, which AQE cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the partials
    per key. Example (count + decimal sum):

        partial:  [F.count(F.lit(1)).alias("c"), F.sum(x).alias("s")]
        final:    [F.sum("c").alias("cnt"), F.sum("s").alias("total")]

    The salt is a uniform hash of random-ish row identity (spark_partition_id
    + monotonically_increasing_id), so a single hot key spreads over
    ``n_salts`` reducers in phase 1.
    """
    salted = df.withColumn(
        salt_col,
        (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts).cast("int"),
    )
    phase1 = salted.groupBy(*key_cols, salt_col).agg(*partial_aggs)
    return phase1.groupBy(*key_cols).agg(*final_aggs)
