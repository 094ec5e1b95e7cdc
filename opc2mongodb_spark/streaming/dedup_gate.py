"""Continuous corpus-ingestion dedup gate — the streaming composition of
``operators/dedup.py::incremental_keep_list``.

A training corpus is not built in one batch job: documents arrive
continuously, and each arrival must be admitted or rejected against the
corpus AS OF that moment. This gate is the ``foreachBatch`` form of that
loop: per micro-batch, (1) exact-dedup WITHIN the batch (min-id per
normalized-text fingerprint), (2) probe the corpus-so-far with the
incremental gate (exact fingerprint semi-join, then MinHash-LSH band probe
— zero corpus x corpus work, cost proportional to the batch), and
(3) append only the keepers as a new ``ingest_batch=<id>`` partition.

Scale contract: the corpus side is only ever SCANNED for its fingerprints /
band rows (at 100 TB those are persisted index tables built once per ingest
epoch — see incremental_keep_list's docstring); the batch side is small, so
its band rows broadcast. The append is partition-granular and idempotent:
each micro-batch owns exactly one ``ingest_batch`` directory, staged and
atomically renamed, so a Structured Streaming retry of batch N overwrites
batch N's own output and nothing else (the same recovery contract as the
reference's restart loop, OPC2MongoDB/Program.cs retry/reconnect).

POSIX-only rename caveat matches streaming/sinks.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CorpusIngestGate:
    """foreachBatch target: admit new documents against the corpus-so-far.

    ``corpus_dir`` holds one parquet partition per processed micro-batch
    (``ingest_batch=<id>``). ``threshold`` is the MinHash signature-agreement
    bar for near-duplicate rejection (see incremental_keep_list).
    """

    def __init__(
        self,
        corpus_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
    ):
        self.corpus_dir = corpus_dir
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold

    def read_corpus(
        self, spark: SparkSession, exclude_batch: int | None = None
    ) -> DataFrame | None:
        """The admitted corpus so far (data columns only), or None if empty.

        ``exclude_batch`` drops that ingest partition from the view — the
        retry path probes the corpus WITHOUT the batch's own previous
        output, otherwise a re-processed batch's documents would
        self-reject as exact duplicates and the retry would rewrite the
        partition empty (losing them)."""
        if not os.path.isdir(self.corpus_dir) or not any(
            e.startswith("ingest_batch=") for e in os.listdir(self.corpus_dir)
        ):
            return None
        df = spark.read.parquet(self.corpus_dir)
        if exclude_batch is not None:
            df = df.filter(F.col("ingest_batch") != F.lit(exclude_batch))
        return df.drop("ingest_batch")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from opc2mongodb_spark.operators.dedup import (
            exact_dedup_groups,
            incremental_keep_list,
        )

        spark = batch.sparkSession
        # (1) within-batch exact dedup: keep the min id per fingerprint —
        # a map-side-combinable groupBy, no corpus involvement.
        keep_ids = exact_dedup_groups(batch, self.id_col, self.text_col).select(
            F.col("keep_id").alias(self.id_col)
        )
        kept = batch.join(keep_ids, self.id_col, "left_semi")
        # (2) probe the corpus-so-far (minus this batch's own prior output,
        # for retry idempotence); only 'keep' verdicts survive.
        corpus = self.read_corpus(spark, exclude_batch=batch_id)
        if corpus is not None:
            verdicts = incremental_keep_list(
                corpus,
                kept,
                self.id_col,
                self.text_col,
                threshold=self.threshold,
            )
            kept = kept.join(
                verdicts.filter(F.col("verdict") == "keep").select(self.id_col),
                self.id_col,
                "left_semi",
            )
        # (3) idempotent partition-granular append: stage, then atomic swap
        # of THIS batch's directory only.
        out = os.path.join(self.corpus_dir, f"ingest_batch={batch_id}")
        tmp = out + "._staging"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        kept.write.mode("overwrite").parquet(tmp)
        os.makedirs(self.corpus_dir, exist_ok=True)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        self.process_batch(batch, batch_id)
