"""As-of join (SURVEY.md E7) — latest right-side value at or before each left
event time, per key.

The reference's last-value-wins upsert (reference: OPC2MongoDB/
Program.cs:1179-1182) generalized to event time. Implemented with the
merge-union strategy, not a range join:

    union(left, right) → one shuffle on key → per-key sort by (ts, side)
    → last(right_cols, ignorenulls) window → keep left rows

At 100 TB this is strictly better than join-then-filter: a single hash
shuffle + per-partition sort, linear in |L|+|R|, versus an inequality join
whose candidate set is |L|×|R| per key before pruning. No skew amplification
beyond what the key distribution already has (salt upstream if a key is hot).

Tie semantics: a right row at exactly left_ts IS visible (<=). Among right
rows sharing (key, ts), the one with the greatest ``right_tiebreak`` wins,
making the result fully deterministic.

``direction="forward"`` flips the match to the EARLIEST right row at or
after each left time (pandas ``merge_asof(direction="forward")`` parity;
the OPC gap-recovery read "next good value after the outage"). Same
merge-union plan — only the per-key sort order reverses — so the 100 TB
cost argument is unchanged. Forward ties take the SMALLEST
``right_tiebreak`` (the mirror of backward's greatest), keeping both
directions fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row: ``right_cols`` of the latest right row with
    ``right_ts <= left_ts`` and equal key; NULL when none precedes.
    ``direction="forward"`` instead takes the earliest right row with
    ``right_ts >= left_ts`` (NULL when none follows).

    ``tolerance`` (optional SQL interval literal body, e.g. ``"30 MINUTE"``)
    bounds staleness: a match older than ``left_ts - tolerance`` (backward;
    newer than ``left_ts + tolerance`` forward) is masked to NULL — the
    sensor-alignment semantics where a reading staler than the bound is
    "no current value", same join shape and cost (the mask is a post-fill
    column expression, not a different join).

    Output: all left columns + ``<right_col><suffix>`` for each right col
    + ``<right_ts><suffix>``.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    payload = list(dict.fromkeys(right_cols + [right_ts]))
    non_key_left = [c for c in left.columns if c not in on]

    # All payload columns travel in ONE struct: last(ignorenulls) over the
    # struct picks the whole latest right row atomically. Filling each column
    # independently would back-fill a NULL member from an OLDER right row,
    # mixing columns across rows (diverges from row_number()=1 semantics).
    struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )

    lt = left.select(
        *on,
        *non_key_left,
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast("bigint").alias("_rtb"),
        F.lit(None).cast(struct_t).alias("_r"),
    )
    rt = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in non_key_left],
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_ts"),
        (
            F.col(right_tiebreak).cast("bigint") if right_tiebreak else F.lit(0)
        ).alias("_rtb"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_r"),
    )

    merged = lt.unionByName(rt)
    # rights sort before lefts at equal ts (<=, resp. >=, visibility); the
    # winning tiebreak is whichever sorts LAST under the direction's order:
    # backward scans time ascending (max _rtb wins), forward scans time
    # DESCENDING so the nearest-following right is the running last() and
    # the min _rtb wins among equal-ts rights.
    if fwd:
        order = [
            F.col("_ts").desc(),
            F.col("_is_left").asc(),
            F.col("_rtb").desc_nulls_last(),
        ]
    else:
        order = [
            F.col("_ts").asc(),
            F.col("_is_left").asc(),
            F.col("_rtb").asc_nulls_last(),
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *on,
        *non_key_left,
        F.col("_is_left"),
        F.col("_ts"),
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_rf"),
    )
    rf = F.col("_rf")
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        if fwd:
            fresh = rf.getField(right_ts) <= F.col("_ts") + bound
        else:
            fresh = rf.getField(right_ts) >= F.col("_ts") - bound
        rf = F.when(fresh, rf)  # stale match -> whole payload NULL, atomically
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(
            *on,
            *non_key_left,
            *[rf.getField(c).alias(f"{c}{suffix}") for c in payload],
        )
    )
