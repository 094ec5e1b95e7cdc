"""Time-series resampling with last-value gap fill (hypertable-style
rollup: regular grid per key, forward-filled from irregular observations).

Built on the merge-union as-of join (operators/asof.py): grid points and
observations are unioned, shuffled ONCE on the key, and forward-filled with
a per-partition sorted window — linear in |grid| + |events|, no
grid x events inequality join. At 100 TB the grid is generated per key from
aggregated bounds (a ~|keys|-row frame), so nothing materializes beyond the
output itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opc2mongodb_spark.operators.asof import asof_join

# Units date_trunc understands AND sequence() can step by; singular form.
VALID_STEP_UNITS = ("second", "minute", "hour", "day", "week", "month", "year")


def _parse_step(step: str) -> tuple[int, str]:
    """Normalize ``"15 minutes"``-style steps to (15, "minute"); raise on
    anything date_trunc would silently NULL."""
    parts = step.strip().split()
    if len(parts) == 1:
        parts = ["1", parts[0]]
    if len(parts) != 2:
        raise ValueError(f"step must be '<n> <unit>', got {step!r}")
    try:
        n = int(parts[0])
    except ValueError:
        raise ValueError(f"step count must be an integer, got {step!r}") from None
    unit = parts[1].lower().rstrip("s")
    if n <= 0 or unit not in VALID_STEP_UNITS:
        raise ValueError(
            f"unsupported step {step!r}: need positive n and unit in "
            f"{VALID_STEP_UNITS} (plural accepted)"
        )
    return n, unit


def resample_last_value(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (key, bucket) on a regular ``step`` grid spanning each
    key's [trunc(min ts), trunc(max ts)]; ``last_value`` is the latest
    observation at or before the bucket's END (ties broken by the greatest
    ``tiebreak_col``). Returns key_cols + (bucket, last_value).

    ``step`` is ``"<n> <unit>"`` with a positive integer ``n`` and a unit in
    :data:`VALID_STEP_UNITS` (plural accepted). Multi-unit steps ("15
    minutes") produce a grid anchored at each key's ``trunc(min ts, unit)``
    and stepping by the full interval. Unsupported steps raise ``ValueError``
    — silently feeding an unknown unit to ``date_trunc`` would NULL the
    bounds and return an empty result.
    """
    n, unit = _parse_step(step)
    step = f"{n} {unit}"
    bounds = events.groupBy(*key_cols).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_t0"),
        F.date_trunc(unit, F.max(ts_col)).alias("_t1"),
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    # bucket END, exclusive of the next bucket's first microsecond
    grid = grid.withColumn(
        "_bucket_end",
        F.col("bucket") + F.expr(f"INTERVAL {step}") - F.expr("INTERVAL 1 MICROSECOND"),
    )
    right_cols = [ts_col, value_col] + ([tiebreak_col] if tiebreak_col else [])
    filled = asof_join(
        grid,
        events.select(*key_cols, *right_cols),
        on=key_cols,
        left_ts="_bucket_end",
        right_ts=ts_col,
        right_cols=[value_col],
        right_tiebreak=tiebreak_col,
    )
    return filled.select(
        *key_cols, "bucket", F.col(f"{value_col}_asof").alias("last_value")
    )
