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


GINI_SAMPLE_BOUND = 10_000_000


def key_skew_gini(
    counts: DataFrame,
    key_col: str,
    count_col: str = "c",
    max_keys: int | None = GINI_SAMPLE_BOUND,
) -> DataFrame:
    """Gini coefficient + top-1 share of a per-key count frame — the
    salting-decision diagnostic (q_key_skew_gini's engine, factored here
    r7 so the extreme-cardinality guard its docstring prescribed is DONE,
    not advised).

    Exact path (key cardinality <= ``max_keys``): the all-integer
    rank-weighted identity ``G = (2*sum(i*c_i) - (n+1)*T) / (n*T)`` over
    counts sorted ascending (key tiebreak), with exactly two final double
    divisions — bit-identical cross-engine, which is why the oracle-gated
    query only ever exercises this branch. The global rank window runs
    over KEY CARDINALITY — already aggregated, fine up to ~1e7 keys in
    one sort task.

    Guard (cardinality > ``max_keys``, detected by one 1-row COUNT job on
    the aggregated frame — the measured-broadcast discipline): a
    STRATIFIED estimate. Plain uniform key-sampling is useless exactly
    when this diagnostic matters most — a single hot key carrying half
    the table is missed with probability (1 - rate) and the sampled Gini
    collapses to ~0 — so the heavy stratum (top ``max_keys // 10`` keys
    by count, a TakeOrdered, never a global sort) enters EXACTLY with
    weight 1, and the tail is md5-hash-sampled (deterministic, no seed
    state, stable across engines and retries) with inverse-rate weights.
    The Gini is then the weighted Lorenz form
    ``G = 2*sum(w*c*(cw - w/2)) / (W * sum(w*c)) - 1`` over ascending
    counts with cumulative weight ``cw``. ESTIMATOR CONTRACT: exact on
    everything the heavy stratum covers (point masses included);
    tail-stratum error is the iid sampling error of its Lorenz moments,
    O(1/sqrt(tail sample)) with small-sample downward bias — property-
    tested against a skew ladder in tests/test_operators.py.
    ``top1_share`` is ALWAYS exact (the full frame's max/total — no
    sampling needed for either number). n_keys/n_rows likewise report
    the full frame. ``max_keys=None`` forces the exact path.
    """
    from pyspark.sql import Window

    full = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(count_col).alias("t"),
        F.max(count_col).alias("mx"),
    )
    n_keys = None
    if max_keys is not None:
        n_keys = counts.count()
    if n_keys is not None and n_keys > max_keys:
        k_top = max(max_keys // 10, 1)
        top = counts.orderBy(
            F.col(count_col).desc(), F.col(key_col)
        ).limit(k_top)
        rest = counts.join(
            F.broadcast(top.select(key_col)), key_col, "left_anti"
        )
        rate = (max_keys - k_top) / (n_keys - k_top)
        frac = F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
            16,
            10,
        ).cast("double") / F.lit(float(1 << 60))
        sampled = top.select(
            key_col, count_col, F.lit(1.0).alias("_w")
        ).unionByName(
            rest.filter(frac < F.lit(rate)).select(
                key_col, count_col, F.lit(1.0 / rate).alias("_w")
            )
        )
        w = Window.orderBy(F.col(count_col), F.col(key_col)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        r = sampled.select(
            F.col(count_col).alias("c"),
            F.col("_w"),
            F.sum("_w").over(w).alias("cw"),
        )
        g = r.agg(
            (
                2
                * F.sum(
                    F.col("_w")
                    * F.col("c")
                    * (F.col("cw") - F.col("_w") / 2)
                )
                / (F.sum("_w") * F.sum(F.col("_w") * F.col("c")))
                - 1
            ).alias("gini")
        )
    else:
        r = counts.select(
            F.col(count_col).alias("c"),
            F.row_number()
            .over(Window.orderBy(F.col(count_col), F.col(key_col)))
            .alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("sn"),
            F.sum(count_col).over(Window.partitionBy()).alias("st"),
        )
        g = r.agg(
            (
                (
                    2 * F.sum(F.col("i") * F.col("c"))
                    - (F.max("sn") + 1) * F.max("st")
                ).cast("double")
                / (F.max("sn") * F.max("st")).cast("double")
            ).alias("gini")
        )
    return full.crossJoin(g).select(
        F.col("n").cast("long").alias("n_keys"),
        F.col("t").cast("long").alias("n_rows"),
        F.col("gini"),
        (F.col("mx").cast("double") / F.col("t").cast("double")).alias(
            "top1_share"
        ),
    )
