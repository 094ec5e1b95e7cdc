"""Bloom-filter sketch as a combinable aggregate — the corpus-side
prefilter ``incremental_keep_list`` promises at 100 TB.

A continuous-ingestion gate probes the corpus with every batch; at corpus
scale even the band-bucket equi-join costs a scan of the corpus band index.
A Bloom sketch of the corpus keys collapses that to a broadcastable
``n_words``-row bitmap: batch rows whose key cannot be in the corpus are
dropped BEFORE any corpus-sized join, and Bloom guarantees no false
negatives, so recall is untouched (false positives just fall through to the
exact join).

Scale shape: building the sketch is one explode (k positions per key) + one
map-side-combinable ``bit_or`` groupBy into at most ``n_words`` rows —
associative, commutative, and tiny regardless of corpus size. Probing
BROADCASTS the sketch; the batch side is a map-only pass. Sizing follows
the standard fp-rate math (m bits, k hashes): defaults (4096 bits, k=3)
give ~3% false positives at ~500 keys; at 100 TB you raise ``n_words``
with the key count — the shape is unchanged.

Determinism: positions are md5-derived (``pmod(conv(md5(key || '|' || i)
[:8], 16, 10), m)``), so the sketch and every probe verdict replay exactly
in DuckDB (hex parse via CAST('0x'||… AS BIGINT), bit ops on BIGINT).
Bits pack 32 per long so ``1 << bit`` stays positive in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_WORDS = 128
BITS_PER_WORD = 32  # keep 1 << bit positive in a long, both engines
K_HASHES = 3


def _positions(key, k: int, m: int) -> list:
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f"|{i}"))), 1, 8), 16, 10
            ).cast("long"),
            m,
        )
        for i in range(k)
    ]


def bloom_sketch(
    df: DataFrame,
    key_col: str,
    n_words: int = N_WORDS,
    bits_per_word: int = BITS_PER_WORD,
    k: int = K_HASHES,
) -> DataFrame:
    """(word, mask) rows — at most ``n_words`` of them, bit_or-combined."""
    m = n_words * bits_per_word
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key_col), k, m))).alias("p")
    )
    return (
        pos.select(
            F.floor(F.col("p") / bits_per_word).cast("long").alias("word"),
            F.pmod(F.col("p"), bits_per_word).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("mask")
        )
    )


def bloom_probe(
    sketch: DataFrame,
    df: DataFrame,
    key_col: str,
    n_words: int = N_WORDS,
    bits_per_word: int = BITS_PER_WORD,
    k: int = K_HASHES,
) -> DataFrame:
    """``df`` + boolean ``in_bloom`` (true = key POSSIBLY in the sketched
    set; false = definitely not). The sketch is broadcast; the probe is a
    map-side pass plus one groupBy on a per-row tag.

    Rows are tagged with ``monotonically_increasing_id`` BEFORE the k-way
    position explode and re-assembled by grouping on the tag (r5, was
    ``groupBy(*df.columns)`` — which silently collapsed duplicate input
    rows and failed outright on non-groupable column types like maps).
    Duplicate rows now come back with their multiplicity intact."""
    m = n_words * bits_per_word
    cols = df.columns
    # internal columns are underscore-prefixed so they cannot collide with
    # caller columns named p/word/bit; the sketch side is aliased to match.
    pr = df.withColumn("_row", F.monotonically_increasing_id()).select(
        "_row",
        *cols,
        F.explode(F.array(*_positions(F.col(key_col), k, m))).alias("_p"),
    ).select(
        "_row",
        *cols,
        F.floor(F.col("_p") / bits_per_word).cast("long").alias("_word"),
        F.pmod(F.col("_p"), bits_per_word).cast("int").alias("_bit"),
    )
    sk = sketch.select(F.col("word").alias("_word"), F.col("mask").alias("_mask"))
    hit = (
        F.col("_mask").isNotNull()
        & (
            F.col("_mask").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")
            )
            != 0
        )
    )
    return (
        pr.join(F.broadcast(sk), "_word", "left")
        .select("_row", *cols, hit.alias("_hit"))
        .groupBy("_row")
        .agg(
            *[F.first(F.col(c)).alias(c) for c in cols],
            F.bool_and(F.col("_hit")).alias("in_bloom"),
        )
        .drop("_row")
    )
