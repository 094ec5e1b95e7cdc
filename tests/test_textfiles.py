"""JSONL/CSV ingestion: schema discipline, quarantine, parquet parity."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opc2mongodb_spark.sources.tables import load_table
from opc2mongodb_spark.sources.textfiles import (
    read_documents_csv,
    read_documents_jsonl,
    split_quarantine,
)


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """Documents exported as JSONL and re-read through the text reader are
    row-identical to the parquet catalog scan."""
    docs = load_table(spark, sf_dir, "documents")
    out = tmp_path / "docs_jsonl"
    docs.coalesce(2).write.json(str(out))
    back, bad = split_quarantine(read_documents_jsonl(spark, str(out)))
    assert not bad.select("doc_id", "_corrupt").collect()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(*docs.columns).collect()}
    assert a == b


def test_jsonl_quarantines_broken_lines(spark, tmp_path):
    """A malformed line lands in quarantine with the raw text; well-formed
    rows pass through untouched. The pipeline never dies."""
    p = tmp_path / "mixed.jsonl"
    rows = [
        json.dumps({"doc_id": 1, "text": "alpha beta", "lang": "en",
                    "source": "s1", "n_chars": 10}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "gamma", "lang": "de",
                    "source": "s2", "n_chars": 5}),
    ]
    p.write_text("\n".join(rows) + "\n")
    clean, bad = split_quarantine(read_documents_jsonl(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    quarantined = bad.select("doc_id", "_corrupt").collect()
    assert len(quarantined) == 1
    assert quarantined[0]._corrupt.startswith("{this is not json")


def test_csv_roundtrip_with_embedded_delimiters(spark, tmp_path):
    """CSV round-trip survives embedded commas, quotes, and newlines in the
    text column (RFC-4180 quoting both directions)."""
    data = [
        (1, 'has, a comma', "en", "s1", 12),
        (2, 'has "quotes" inside', "en", "s1", 19),
        (3, "has a\nnewline", "de", "s2", 13),
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / "docs_csv"
    df.coalesce(1).write.option("header", True).option("escape", '"').csv(
        str(out)
    )
    back, bad = split_quarantine(read_documents_csv(spark, str(out)))
    assert not bad.select("doc_id", "_corrupt").collect()
    assert {tuple(r) for r in back.select(*df.columns).collect()} == set(data)


def test_text_readers_push_filters(spark, sf_dir, tmp_path):
    """The text scans stay lazy Catalyst sources: a doc_id filter reaches
    the FileScan as a pushed filter instead of a post-scan Filter-only
    plan (scale contract: the reader is not an opaque RDD)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = tmp_path / "docs_jsonl"
    docs.write.json(str(out))
    clean, _ = split_quarantine(read_documents_jsonl(spark, str(out)))
    plan = (
        clean.filter(F.col("doc_id") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "IsNotNull(doc_id)" in plan
