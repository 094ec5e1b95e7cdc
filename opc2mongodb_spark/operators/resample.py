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


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_col: str | None = None,
    spread: int | None = None,
) -> DataFrame:
    """OPC HDA 'timeaverage' aggregate (stepped interpolation): per key and
    per ``step`` bucket, the time-weighted mean of a piecewise-constant
    signal — each observation holds its value until the next one, and a
    bucket's average weights every held segment by the microseconds it
    overlaps the bucket. The reference forwards raw reads and leaves
    aggregation to the historian (Program.cs:463 ReadAsync polling); this is
    that historian-side aggregate, the one 'interpolated'/'resample' do not
    cover. Returns key_cols + (bucket, twa, covered_us); buckets a key's
    signal never overlaps (including everything past its last sample, which
    bounds no segment) are absent, and ``covered_us`` exposes partial
    coverage at the signal's edges instead of silently extrapolating.

    Scale shape: ONE window shuffle per key builds [ts, next_ts) segments
    (lead), each segment explodes into only the buckets it overlaps — total
    rows are bounded by |events| + the output grid itself, the same bound
    the resample grid has — then one map-side-combinable groupBy on
    (key, bucket). Weights are integer microseconds and values are
    decimal-pinned, so numerator and denominator are EXACT in any
    summation order; the single IEEE division at the end is deterministic
    cross-engine. Duplicate timestamps (tiebroken by ``tiebreak_col``)
    form zero-length segments that contribute nothing to either sum.

    Only single-unit fixed-length steps are supported (``"1 second"`` ..
    ``"1 day"``): multi-unit steps would anchor each segment's grid at its
    own truncation point and misalign buckets within a key.

    ``spread`` replaces the window's AQE-coalescible exchange with an
    explicit ``repartition(spread, key_cols)`` — same single shuffle,
    fixed width. Without it, AQE sizes the exchange from the PRE-explode
    bytes (events are narrow), coalesces to ~1-2 partitions, and the whole
    segment-explode + grid aggregation runs on as many cores (measured
    4.8 s -> ~1 s at sf0.1, local[32]). On a cluster whose scan is already
    wide this is unnecessary — it is the local/compact-input escape hatch,
    the same pattern simhash/winnow use for their CPU-bound maps.
    """
    n, unit = _parse_step(step)
    if n != 1 or unit not in ("second", "minute", "hour", "day"):
        raise ValueError(
            f"time_weighted_avg needs a single fixed-length unit step "
            f"(second/minute/hour/day), got {step!r}"
        )
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    from pyspark.sql import Window

    if spread:
        df = df.repartition(spread, *key_cols)
    w = Window.partitionBy(*key_cols).orderBy(*order)
    seg = df.withColumn("_nxt", F.lead(ts_col).over(w)).filter(
        F.col("_nxt").isNotNull()
    )
    step_iv = F.expr(f"INTERVAL 1 {unit.upper()}")
    segb = seg.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col("_nxt"),
        F.col(value_col).alias("_v"),
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(ts_col)),
                F.date_trunc(unit, F.col("_nxt")),
                step_iv,
            )
        ).alias("bucket"),
    )
    # load_table yields TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
    # session TZ is pinned UTC, so the cast is a pure relabel, not a shift.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(_us(F.col("_nxt")), _us(F.col("bucket") + step_iv))
        - F.greatest(_us(F.col("_ts")), _us(F.col("bucket"))),
    )
    vw = F.col("_v").cast("decimal(18,4)") * ov
    return (
        segb.select(*key_cols, "bucket", ov.alias("_ov"), vw.alias("_vw"))
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("_vw").alias("_sv"), F.sum("_ov").alias("_sw"))
        .filter(F.col("_sw") > 0)
        .select(
            *key_cols,
            "bucket",
            (F.col("_sv").cast("double") / F.col("_sw").cast("double")).alias("twa"),
            F.col("_sw").cast("long").alias("covered_us"),
        )
    )
