"""Deterministic training-shard writer.

The final step of a training-data pipeline: split the curated corpus into N
balanced shard files whose within-shard order is "random" but exactly
replayable (re-running the job byte-for-byte reproduces every shard). The
reference has no analog — its sink is one-record-at-a-time upserts
(OPC2MongoDB/Program.cs:1179); this is the batch-corpus counterpart a user
training on the curated output needs.

Scale shape: shard = md5-derived hash of the id (uniform, seed-tweakable),
order = md5 rank. The whole write is ONE shuffle:
``repartition(n_shards, shard)`` co-locates each shard, and
``sortWithinPartitions`` streams rows to the parquet writer in final order —
no global sort, no driver involvement, no skew (md5 is uniform regardless of
id distribution). At 100 TB with 1000 executors each shard lands as one
partitioned-directory write; executors never exchange more than 1/N of the
data. ``q_shard_assign`` (queries.py) is the oracle-checkable twin of the
assignment logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_assignment(
    df: DataFrame, id_col: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Add ``shard`` (int in [0, n_shards)) and ``ord`` (hex rank key).

    shard is the first 8 md5 nibbles of the (optionally seeded) id mod
    n_shards — uniform for any id distribution, changeable wholesale via
    ``seed``. A non-empty seed is prefixed as ``seed || ':' || id``; the
    delimiter keeps (seed='a', id='bc') and (seed='ab', id='c') distinct,
    and an empty seed hashes the bare id — the exact formula
    ``q_shard_assign`` oracle-checks cross-engine. NULL ids hash a
    NUL-framed sentinel no real id string can equal, so every row —
    including null-id rows — lands in exactly one shard in [0, n_shards)
    (all nulls share one deterministic shard; they are NOT dropped to a
    default partition). ``ord`` is the full digest: sorting by it within a
    shard is the reproducible "random" interleave (ties broken by id for
    bit-stability).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = (
        F.when(F.col(id_col).isNull(), F.lit("\x00NULL\x00"))
        .otherwise(F.col(id_col).cast("string"))
    )
    if seed:
        key = F.concat(F.lit(seed), F.lit(":"), key)
    h = F.md5(key)
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), n_shards)
    return df.withColumn("ord", h).withColumn("shard", shard.cast("int"))


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int = 16,
    seed: str = "",
) -> None:
    """Write ``df`` as ``out_dir/shard=K/*.parquet`` — balanced shards,
    deterministic within-shard order.

    One shuffle total: repartition ON the shard value, then a partition-local
    sort feeds the writer, so row order inside each shard file is the md5
    order (replayable across runs and cluster sizes). The sort leads with
    ``shard``: the parquet writer requires its partition column sorted and
    would otherwise inject its own (unstable) sort, clobbering the md5 order.
    """
    assigned = shard_assignment(df, id_col, n_shards, seed)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "ord", id_col)
        .drop("ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
