"""Edge-case hardening for the text-analysis Column builders: empty text,
single tokens, runs of whitespace — no NaNs, no crashes, stable types."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_text_functions_survive_edge_strings(spark):
    from opc2mongodb_spark.functions.text import (
        avg_token_len,
        distinct_tokens,
        fingerprint,
        quality_band,
        simhash16,
        token_count,
    )

    d = spark.createDataFrame(
        [(0, ""), (1, "x"), (2, "  "), (3, "a a a"), (4, "word " * 100)],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in d.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            avg_token_len(F.col("text")).alias("avg_len"),
            quality_band(F.col("text")).alias("band"),
            fingerprint(F.col("text")).alias("fp"),
            F.size(distinct_tokens(F.col("text"))).alias("n_distinct"),
        ).collect()
    }
    for r in rows.values():
        assert r.n >= 0 and r.band in (0, 1, 2, 3)
        assert r.fp is not None and len(r.fp) == 32
        assert r.avg_len is None or r.avg_len == r.avg_len  # no NaN
    assert rows[3].n_distinct == 1  # "a a a" → {a}
    # identical normalized content → identical fingerprint
    e = spark.createDataFrame(
        [(10, "hello  world"), (11, "HELLO WORLD ")], ["doc_id", "text"]
    )
    fps = [r.fp for r in e.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]

    sh = {r.doc_id: r.simhash for r in simhash16(d, "doc_id", F.col("text")).collect()}
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in sh.values())
