"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping file layouts.

The 100 TB problem this solves: a table queried by TWO selective dimensions
(e.g. ``o_custkey`` point lookups AND ``o_totalprice`` range scans) can be
sorted by only one of them — min/max file statistics then prune perfectly on
the sort key and not at all on the other. Interleaving the bits of both
dimensions' cell codes (the Morton / Z-order curve) and range-partitioning
on the interleaved value gives every file a TIGHT min/max envelope on BOTH
dimensions simultaneously, so a scan with a predicate on either column
skips most files. This is the layout strategy behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` — here expressed as plain declarative Spark so any
parquet writer can use it.

Scale shape (deliberately shuffle-minimal):
- cell codes are EQUI-WIDTH integer bins off a one-row global min/max
  aggregate joined back by broadcast — a map-side integer expression, NOT
  an ``ntile`` global-sort window (which funnels the whole table through
  one partition — the exact trap plan assertions elsewhere guard against).
  Equi-DEPTH cells for skewed dimensions would swap in ``approxQuantile``
  cut points; the layout contract downstream is identical.
- coding is pure integer arithmetic (subtract, multiply, integer divide,
  shift, mask) — exact on any engine, rides whole-stage codegen;
- bucket assignment is a contiguous range split of the Z space — the write
  path is then a single ``repartitionByRange(bucket)`` + write, one
  shuffle total for the whole re-layout.

No reference-repo counterpart (the reference streams tag updates and has no
file-layout concern); this is part of the large-scale curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_code(x: F.Column, y: F.Column, bits: int = 8) -> F.Column:
    """Interleave the low ``bits`` bits of two integer cell codes into a
    Morton value: bit i of ``y`` lands at position 2i, bit i of ``x`` at
    2i+1. Pure shift/mask integer arithmetic — exact on any engine."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        yb = F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + xb + yb
    return z


def zorder_layout(
    df: DataFrame,
    dim_x: str,
    dim_y: str,
    bits: int = 8,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each row a Z-order file bucket over two INTEGRAL dimensions.

    Returns ``df`` + ``zval`` (the Morton code) + ``bucket`` (the target
    file/partition id, contiguous Z-ranges of equal code width). Callers
    with decimal-valued dimensions scale them to integer units first
    (e.g. price → cents) so the binning stays exact. The caller writes
    with ``df.repartitionByRange(n_buckets, "bucket")`` (or partitions
    the sink by ``bucket``) to realize the layout on disk.
    """
    cells = 1 << bits
    ext = df.agg(
        F.min(dim_x).cast("long").alias("_xmin"),
        F.max(dim_x).cast("long").alias("_xmax"),
        F.min(dim_y).cast("long").alias("_ymin"),
        F.max(dim_y).cast("long").alias("_ymax"),
    )
    coded = df.crossJoin(F.broadcast(ext))
    cx = F.expr(
        f"(CAST({dim_x} AS BIGINT) - _xmin) * {cells} DIV (_xmax - _xmin + 1)"
    )
    cy = F.expr(
        f"(CAST({dim_y} AS BIGINT) - _ymin) * {cells} DIV (_ymax - _ymin + 1)"
    )
    zval = zorder_code(cx, cy, bits)
    # 2*bits-wide z space split into n_buckets contiguous ranges.
    width = (1 << (2 * bits)) // n_buckets
    return (
        coded.withColumn("zval", zval)
        .withColumn(
            "bucket",
            F.least(
                F.expr(f"zval DIV {width}"),
                F.lit(n_buckets - 1).cast("long"),
            ).cast("int"),
        )
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def layout_skipping_stats(
    laid_out: DataFrame, dim_x: str, dim_y: str
) -> DataFrame:
    """Per-bucket min/max envelope of both dimensions plus row count — the
    file-statistics view a reader's pruner would consult. The whole point
    of the Z layout is that BOTH envelopes are tight; the companion query
    asserts that via the oracle."""
    return laid_out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(dim_x).alias("x_min"),
        F.max(dim_x).alias("x_max"),
        F.min(dim_y).alias("y_min"),
        F.max(dim_y).alias("y_max"),
    )
