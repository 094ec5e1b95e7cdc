"""Python UDTF: document chunking for training pipelines."""

from __future__ import annotations

from opc2mongodb_spark.functions.udtfs import register_udtfs
from opc2mongodb_spark.sources.tables import register_views


def test_chunker_covers_and_overlaps(spark, sf_dir):
    register_udtfs(spark)
    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.chunk, c.n_tokens
        FROM documents d, LATERAL chunk_document(d.text, 16, 4) c
        """
    ).collect()
    assert out

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_no)
        toks = docs[doc_id].split(" ")
        # chunk contract: size cap, contiguous numbering, 4-token overlap
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        assert all(c.n_tokens <= 16 for c in chunks)
        reconstructed = chunks[0].chunk.split(" ")
        for c in chunks[1:]:
            ctoks = c.chunk.split(" ")
            assert reconstructed[-4:] == ctoks[:4]  # overlap carried
            reconstructed.extend(ctoks[4:])
        assert reconstructed == toks  # lossless coverage


def test_chunker_rejects_bad_params(spark):
    register_udtfs(spark)
    import pytest

    df = spark.sql("SELECT * FROM chunk_document('a b c', 4, 4)")
    with pytest.raises(Exception, match="overlap"):
        df.collect()
