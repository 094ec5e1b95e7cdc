"""Skew mitigation (SURVEY.md §4 posture: "salt hot tag keys if needed").

At 100 TB a handful of hot tags (or hot join keys) can pin a whole stage on
one task. Two standard remedies, provided as reusable operators:

- ``salted_aggregate``: two-phase agg — partial by (key, salt), final by
  key. Correct for any algebraic aggregate expressed as (partial, merge).
- ``salted_join``: for joins, prefer AQE skew-join (on by default in
  session.py) or broadcasting the small side; explicit salting of a
  shuffle join is the last resort — the fact side gets a uniform salt, the
  dim side is replicated once per salt value, and the join key becomes
  (key, salt), spreading a single hot key over ``n_salts`` reducers.

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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Shuffle join with an exploded-salt key for single-hot-key skew.

    ``fact`` rows get a uniform salt in [0, n_salts); ``dim`` is replicated
    once per salt value (n_salts x |dim| rows — only viable for dim tables,
    which is exactly the skew-join case); the equi-key becomes
    ``on + [salt]`` so one hot key's rows land on ``n_salts`` reducers
    instead of one.

    Only fact-preserving ``how`` values are accepted (inner / left / left
    semi / left anti): for those the result equals ``fact.join(dim, on,
    how)`` exactly. Right/full-outer joins would emit each UNMATCHED dim row
    once per salt replica (n_salts null-padded rows instead of one), so they
    raise ``ValueError`` — salt the other side or dedup unmatched rows
    explicitly if you need them.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only {sorted(allowed)}; "
            f"got how={how!r} (unmatched dim rows would be replicated "
            "n_salts times)"
        )
    salted_fact = fact.withColumn(
        salt_col,
        (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts).cast("int"),
    )
    replicated_dim = dim.withColumn(
        salt_col,
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])),
    )
    return salted_fact.join(replicated_dim, on + [salt_col], how).drop(salt_col)
