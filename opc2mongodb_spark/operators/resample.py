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


def resample_interpolate(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Linear interpolation AT each grid point (the OPC HDA "interpolated"
    aggregate, vs :func:`resample_last_value`'s stepped hold): for grid
    time g, value = lerp between the latest sample at-or-before g and the
    earliest sample at-or-after g. Before the first sample the result is
    NULL (no data); after the last it holds the final value; a sample
    exactly at g (or a zero-width bracket) returns that sample. NULL-valued
    samples are skipped in both directions. Ties at one timestamp resolve
    to the greatest ``tiebreak_col`` on the prev side and the smallest on
    the next side (each direction's "closest writer").

    Plan: ONE union of grid + samples, ONE key shuffle, then two
    per-partition sorted windows (ascending for prev, descending for
    next) share that exchange — linear in |grid| + |events|, no
    grid x events inequality join, same merge discipline as the as-of
    join. The lerp fraction divides exact integer microsecond deltas cast
    to double, so results replay bit-identically cross-engine
    (q_resample_lerp is the DuckDB-twinned form).
    """
    from pyspark.sql import Window

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
    eid = (
        F.col(tiebreak_col) if tiebreak_col else F.lit(None)
    ).cast("long")
    obs = events.select(
        *key_cols,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_is_grid"),
        eid.alias("_eid"),
        F.col(value_col).cast("double").alias("_v"),
    )
    g = grid.select(
        *key_cols,
        F.col("bucket").alias("_t"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("long").alias("_eid"),
        F.lit(None).cast("double").alias("_v"),
    )
    m = obs.unionAll(g)
    v_obs = F.when((F.col("_is_grid") == 0) & F.col("_v").isNotNull(), F.col("_v"))
    t_obs = F.when(
        (F.col("_is_grid") == 0) & F.col("_v").isNotNull(), F.col("_t")
    )
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("_t").asc(),
            F.col("_is_grid").asc(),
            F.col("_eid").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("_t").desc(),
            F.col("_is_grid").asc(),
            F.col("_eid").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = m.select(
        *key_cols,
        "_t",
        "_is_grid",
        F.last(v_obs, ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(t_obs, ignorenulls=True).over(w_prev).alias("_pt"),
        F.last(v_obs, ignorenulls=True).over(w_next).alias("_nv"),
        F.last(t_obs, ignorenulls=True).over(w_next).alias("_nt"),
    ).filter(F.col("_is_grid") == 1)
    dg = F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_pt"))
    dn = F.unix_micros(F.col("_nt")) - F.unix_micros(F.col("_pt"))
    interp = (
        F.when(F.col("_pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("_nv").isNull() | (dn == 0), F.col("_pv"))
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (dg.cast("double") / dn.cast("double"))
        )
    )
    return cur.select(
        *key_cols, F.col("_t").alias("bucket"), interp.alias("interp")
    )
