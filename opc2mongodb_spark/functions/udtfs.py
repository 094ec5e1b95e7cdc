"""Python UDTF surface (SURVEY.md I3 escalation path).

Built-in generators (explode/posexplode — q_explode) cover UDTF needs first;
this module is the genuine-Python case: training-data document chunking with
token budgets and overlap, where the row-expansion logic is imperative.

Arrow-optimized UDTF (``useArrow=True``) keeps the transfer batched. At
scale, chunking is a narrow map — no shuffle — and composes with the dedup
and quality operators downstream (chunk → fingerprint → dedup → score).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no int, chunk string, n_tokens int", useArrow=True)
class ChunkDocument:
    """Split a document into whitespace-token chunks of ``max_tokens`` with
    ``overlap`` tokens carried between consecutive chunks.

    LATERAL-join usage:
        spark.sql("SELECT d.doc_id, c.* FROM documents d,
                   LATERAL chunk_document(d.text, 64, 8) c")
    """

    def eval(self, text: str, max_tokens: int = 64, overlap: int = 8):  # pragma: worker
        if text is None:
            return
        if max_tokens <= 0 or overlap >= max_tokens:
            raise ValueError("need 0 <= overlap < max_tokens")
        toks = text.split(" ")
        step = max_tokens - overlap
        chunk_no = 0
        for start in range(0, len(toks), step):
            window = toks[start : start + max_tokens]
            yield chunk_no, " ".join(window), len(window)
            chunk_no += 1
            if start + max_tokens >= len(toks):
                break


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_document", ChunkDocument)
