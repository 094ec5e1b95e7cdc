"""Incremental aggregate maintenance (materialized-view merge).

The 100 TB pattern: a grouped aggregate over an append-only fact table is
never recomputed from history. The running result is stored as MERGEABLE
PARTIAL STATE — per key, the algebraic components (count, sum, min, max)
rather than the finished averages — and each new batch folds in with

    new_state = re_aggregate(old_state UNION ALL partial_state(batch))

whose cost is |keys| + |batch|, independent of history size. This is the
same contract Spark's own map-side partial aggregation relies on (merge
must be associative + commutative), lifted to cross-batch persistence; the
finished view (avg = sum/count, …) is derived from state at read time.

Non-mergeable aggregates (exact median, distinct count) don't fit this
shape — they need sketches (KMV / CMS, see operators/bloom.py and
q_kmv_distinct) or a re-scan; `merge_agg_state` deliberately supports only
the algebraic set so misuse is impossible.

No reference counterpart (the reference keeps only last-value state,
Program.cs:1179-1182); this generalizes that keyed-state idea to grouped
analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# State columns appended to the grouping keys. ``sum_dec`` is the
# decimal-pinned measure sum: exact, order-independent, safe to merge any
# number of times without float drift (the repo-wide determinism rule).
STATE_COLS = ("n_rows", "sum_dec", "min_v", "max_v")


def partial_agg_state(
    df: DataFrame, keys: list[str], measure: str, scale: int = 2
) -> DataFrame:
    """Algebraic partial state for ``measure`` grouped by ``keys``."""
    m = F.col(measure).cast(f"decimal(18,{scale})")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(m).cast(f"decimal(28,{scale})").alias("sum_dec"),
        F.min(measure).alias("min_v"),
        F.max(measure).alias("max_v"),
    )


def merge_agg_state(*states: DataFrame) -> DataFrame:
    """Fold any number of partial-state frames into one.

    One union + one keyed re-aggregation — each input contributes |its keys|
    rows, so merging a day's delta into a years-deep view shuffles only key
    cardinality, never history. Associative: merge(merge(a, b), c) ==
    merge(a, b, c) row-for-row.

    Grouping keys are inferred as "columns not in STATE_COLS", so a frame
    whose key is literally named ``n_rows``/``sum_dec``/``min_v``/``max_v``
    cannot be expressed — rejected loudly below rather than silently
    aggregated away (r5 ADVICE)."""
    if not states:
        raise ValueError("merge_agg_state needs at least one state frame")
    first = states[0]
    keys = [c for c in first.columns if c not in STATE_COLS]
    missing = [c for c in STATE_COLS if c not in first.columns]
    if missing:
        raise ValueError(
            f"state frame lacks state columns {missing}; keys named like "
            f"STATE_COLS {STATE_COLS} are unsupported by construction"
        )
    for i, s in enumerate(states[1:], start=1):
        s_keys = [c for c in s.columns if c not in STATE_COLS]
        if sorted(s_keys) != sorted(keys):
            raise ValueError(
                f"state frame {i} has grouping keys {sorted(s_keys)}, "
                f"expected {sorted(keys)} (from frame 0)"
            )
    u = first
    for s in states[1:]:
        u = u.unionByName(s)
    sum_type = dict(first.dtypes)["sum_dec"]
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_dec").cast(sum_type).alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finish_view(state: DataFrame) -> DataFrame:
    """Derive the user-facing view from state: count, exact sum and mean
    (double in the final schema per the oracle-rendering rule), min/max."""
    keys = [c for c in state.columns if c not in STATE_COLS]
    return state.select(
        *keys,
        F.col("n_rows"),
        F.col("sum_dec").cast("double").alias("sum_v"),
        # double-divide AFTER the exact decimal sum: decimal division picks
        # engine-specific intermediate scales, double division of identical
        # operands is bit-deterministic.
        (F.col("sum_dec").cast("double") / F.col("n_rows").cast("double")).alias(
            "avg_v"
        ),
        "min_v",
        "max_v",
    )
