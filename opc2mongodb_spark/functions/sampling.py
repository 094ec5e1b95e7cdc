"""Deterministic sampling primitives.

Every sampler here derives its randomness from a hash of a STABLE row id,
never ``rand()`` — the repo-wide rule that makes sampling replayable on any
engine, any run, any partitioning (q_stratified_sample documents the trap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^52 — the md5 13-nibble prefix is a uniform 52-bit integer.
_U52 = 4503599627370496.0


def hash_uniform(id_col: Column, salt: str) -> Column:
    """Deterministic uniform draw in (0, 1] keyed by (id, salt): the first
    13 md5 hex nibbles as an integer, +1 so ln() never sees zero."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 13),
        16,
        10,
    ).cast("bigint")
    return (h + 1) / F.lit(_U52)


def weighted_sample_key(id_col: Column, weight: Column, salt: str = "|ws") -> Column:
    """Efraimidis-Spirakis A-ES exponential key ``-ln(u)/w``: taking the k
    SMALLEST keys draws k items without replacement with probability
    proportional to ``weight``. Decimal-pinned to 12 places so cross-engine
    ulp drift in ln() cannot flip ranks (callers add the id as the order
    tiebreaker), then cast back to double for the final schema."""
    w = F.greatest(weight.cast("bigint"), F.lit(1))
    return (
        (-F.log(hash_uniform(id_col, salt)) / w)
        .cast("decimal(18,12)")
        .cast("double")
    )
