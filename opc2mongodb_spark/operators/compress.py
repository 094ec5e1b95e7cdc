"""Swinging-door trending (SDT) compression — the archive-side companion of
the reference's deadband filter (Program.cs polls raw values and leaves
history compression to the historian; deadband is `q_deadband_filter`).

SDT keeps the minimal set of points such that linear interpolation between
kept points stays within ``comp_dev`` of every dropped raw point — the
algorithm industrial historians (OSIsoft PI's comptest, OPC HDA archives)
run on ingest. It is inherently SEQUENTIAL per signal: each point updates a
pair of door slopes anchored at the last archived point, so no window or
aggregate expression can express it — this is the textbook case for an
Arrow-batched grouped-map pandas function (CLAUDE.md: pandas only where
built-ins can't express the op).

Scale shape: groups (signals) are independent, so parallelism is |keys|;
within a group the pass is O(n) with O(1) state. Per-task memory is bounded
by the largest single group — at 100 TB you'd pre-split each signal into
(key, epoch) chunks with one overlap point so groups stay executor-sized
(the same contract applyInPandasWithState would give a streaming twin).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SdtKernel:
    """Incremental swinging-door state machine — ONE implementation shared
    by the batch operator (:func:`swinging_door`) and the streaming gate
    (``streaming.stateful.sdt_stream``), so the two can never drift.

    ``push(t, v, tag)`` feeds one point (any monotonic numeric timestamp;
    ``tag`` is an opaque caller label returned with archived points) and
    returns the list of points ARCHIVED by that push: the first point of a
    signal, the previous point when the doors close, or the point itself on
    an out-of-band duplicate timestamp. ``flush()`` archives the held live
    end (batch end-of-signal; a stream never flushes). State is six
    numbers — (anchor t/v, door slopes, previous t/v) — serializable for
    checkpoint-recoverable streaming state.
    """

    __slots__ = ("dev", "a_t", "a_v", "s_up", "s_low", "p_t", "p_v", "p_tag",
                 "started", "p_is_archived")

    def __init__(self, comp_dev: float):
        self.dev = comp_dev
        self.started = False
        self.a_t = self.a_v = self.p_t = self.p_v = self.p_tag = None
        self.s_up, self.s_low = -math.inf, math.inf
        self.p_is_archived = False

    def _anchor(self, t, v) -> None:
        self.a_t, self.a_v = t, v
        self.s_up, self.s_low = -math.inf, math.inf

    def push(self, t, v, tag=None):
        out = []
        if not self.started:
            self.started = True
            self._anchor(t, v)
            out.append((t, v, tag))
            self.p_is_archived = True
        else:
            dt = t - self.a_t
            if dt <= 0:
                # Duplicate timestamp: representable iff within the band of
                # the archived value; outside it, archive the newer point.
                if abs(v - self.a_v) > self.dev:
                    self._anchor(t, v)
                    out.append((t, v, tag))
                    self.p_is_archived = True
                else:
                    self.p_is_archived = False
            else:
                self.s_up = max(self.s_up, (v - (self.a_v + self.dev)) / dt)
                self.s_low = min(self.s_low, (v - (self.a_v - self.dev)) / dt)
                if self.s_up > self.s_low:
                    # Doors closed: the segment anchor -> here can no longer
                    # cover every intermediate point. Archive the PREVIOUS
                    # point and re-anchor the doors there for this one.
                    out.append((self.p_t, self.p_v, self.p_tag))
                    self._anchor(self.p_t, self.p_v)
                    dt = t - self.a_t
                    if dt > 0:
                        self.s_up = (v - (self.a_v + self.dev)) / dt
                        self.s_low = (v - (self.a_v - self.dev)) / dt
                self.p_is_archived = False
        self.p_t, self.p_v, self.p_tag = t, v, tag
        return out

    def flush(self):
        """The live end of a FINISHED signal is always kept — unless that
        exact point was already archived by its own push (first point of a
        1-point signal, or an out-of-band duplicate-ts final point)."""
        if self.started and not self.p_is_archived:
            return [(self.p_t, self.p_v, self.p_tag)]
        return []

    # -- checkpointable state (streaming) ---------------------------------
    def state_tuple(self):
        return (
            float(self.a_t), float(self.a_v), self.s_up, self.s_low,
            float(self.p_t), float(self.p_v),
        )

    @classmethod
    def from_state(cls, comp_dev: float, st):
        k = cls(comp_dev)
        k.started = True
        k.a_t, k.a_v, k.s_up, k.s_low, k.p_t, k.p_v = st
        # Recovery note: p_is_archived is not persisted — it only matters
        # for flush(), which a stream never calls.
        return k


def _sdt_compress(ts_us, vals, comp_dev: float):
    """Yield indices of archived points. O(n) single pass over one signal's
    integer-µs timestamps and float values; thin wrapper over SdtKernel."""
    k = SdtKernel(comp_dev)
    for i in range(len(vals)):
        for _, _, tag in k.push(ts_us[i], vals[i], i):
            yield tag
    for _, _, tag in k.flush():
        yield tag


def swinging_door(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    comp_dev: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Compress each key's (ts, value) signal with swinging-door trending.

    Returns ``key_cols + (ts_col, value_col)`` — the archived subset, with
    the first and last point of every signal always present. Points are
    processed in ``(ts, tiebreak)`` order; ``comp_dev`` is the absolute
    deviation the reconstructed (linearly interpolated) signal is allowed.
    """
    if comp_dev < 0:
        raise ValueError(f"comp_dev must be >= 0, got {comp_dev}")
    import pandas as pd

    out_fields = [df.schema[c] for c in key_cols] + [
        df.schema[ts_col],
        df.schema[value_col],
    ]
    schema = T.StructType(out_fields)
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def compress(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: worker
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts_us = pdf[ts_col].astype("int64").to_numpy()  # ns -> ordering-safe
        vals = pdf[value_col].to_numpy(dtype="float64")
        keep = list(_sdt_compress(ts_us, vals, comp_dev))
        return pdf.iloc[keep][[*key_cols, ts_col, value_col]]

    narrow = df.select(*key_cols, *sort_cols[1:], ts_col, value_col)
    return narrow.groupBy(*key_cols).applyInPandas(compress, schema)


def reconstruct_error(
    raw: DataFrame,
    archived: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key max |raw - linear-interpolation(archived)| — the audit that
    proves a compressed archive honors its ``comp_dev`` contract.

    Columnar: an as-of pair of window passes positions each raw point
    between its surrounding archived points (no UDF) — union the archived
    points in, forward/backward fill, interpolate, aggregate the abs error.
    One shuffle on the key."""
    from pyspark.sql import Window

    a = archived.select(
        *key_cols,
        F.col(ts_col).alias("_t"),
        F.col(value_col).alias("_av"),
        F.lit(1).alias("_is_arch"),
    )
    r = raw.select(
        *key_cols,
        F.col(ts_col).alias("_t"),
        F.col(value_col).alias("_rv"),
        F.lit(0).alias("_is_arch"),
    )
    u = a.select(*key_cols, "_t", F.col("_av"), F.lit(None).cast("double").alias("_rv"), "_is_arch").unionByName(
        r.select(*key_cols, "_t", F.lit(None).cast("double").alias("_av"), F.col("_rv"), "_is_arch")
    )
    # Archived rows sort BEFORE raw rows at the same ts (desc on _is_arch)
    # so a raw point exactly on an archived point interpolates to it.
    w = Window.partitionBy(*key_cols).orderBy(F.col("_t").asc(), F.col("_is_arch").desc())
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    wb = w.rowsBetween(0, Window.unboundedFollowing)
    arch_t = F.when(F.col("_is_arch") == 1, F.col("_t"))
    filled = (
        u.withColumn("_pt", F.last(arch_t, ignorenulls=True).over(wf))
        .withColumn("_pv", F.last("_av", ignorenulls=True).over(wf))
        .withColumn("_nt", F.first(arch_t, ignorenulls=True).over(wb))
        .withColumn("_nv", F.first("_av", ignorenulls=True).over(wb))
        .filter(F.col("_is_arch") == 0)
    )
    def _usd(c):  # ntz -> µs double (session TZ is pinned UTC)
        return F.unix_micros(c.cast("timestamp")).cast("double")

    span = _usd(F.col("_nt")) - _usd(F.col("_pt"))
    frac = F.when(span == 0, F.lit(0.0)).otherwise(
        (_usd(F.col("_t")) - _usd(F.col("_pt"))) / span
    )
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    err = F.abs(F.col("_rv") - interp)
    return filled.groupBy(*key_cols).agg(F.max(err).alias("max_err"))
