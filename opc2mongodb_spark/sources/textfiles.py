"""Text-format ingestion (JSONL / CSV) for the documents pipeline.

The reference ingests from live OPC sessions only; a corpus pipeline also
has to swallow the interchange formats crawlers and labeling tools emit —
JSON-lines and CSV — without giving up the engine's schema discipline.
Both readers here:

- take an EXPLICIT schema (never inference: at 100 TB schema inference is
  a full extra pass over the data, and a drifting inferred type silently
  changes downstream semantics);
- run PERMISSIVE with a quarantine column (``_corrupt``): a malformed line
  becomes a quarantined row, not a dead pipeline — the ingest twin of the
  reference's drop-with-log unsupported-type policy
  (OPC2MongoDB/Program.cs:718 "READ UNSUPPORTED TYPE") with the log
  replaced by a filterable column;
- stay lazy scans, so Catalyst pushes filters/pruning into the read the
  same as the parquet catalog (sources/tables.py).

``read_documents_jsonl`` / ``read_documents_csv`` return frames with the
catalog ``documents`` schema plus ``_corrupt``; ``split_quarantine``
separates clean rows (catalog-shaped, ready for every registered query)
from quarantined raw lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """JSON-lines scan with the catalog documents schema + quarantine.

    PERMISSIVE mode: a syntactically-broken line yields NULL data columns
    and the raw line in ``_corrupt``; a well-formed line with a
    wrong-typed field nulls just that field. One scan, no inference pass,
    splittable by line — at 100 TB this parallelizes like any text source.
    """
    return spark.read.schema(_with_corrupt(schema)).json(
        path,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV scan with the catalog documents schema + quarantine.

    Quoting/escaping follow RFC-4180 defaults (quote='"', escape by
    doubled quote) so embedded commas and newlines in ``text`` survive
    round-trips with standard writers. multiLine is ON for quoted
    newlines — that makes a single gzip'd file non-splittable, so shard
    the files (the writer side already does) rather than relying on
    within-file splits at scale.
    """
    return spark.read.schema(_with_corrupt(schema)).csv(
        path,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        multiLine=True,
        escape='"',
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows drop the corrupt column and match
    the catalog shape; quarantined rows keep the raw line for triage.

    Spark restriction (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN):
    a query over a raw text scan may not reference ONLY the corrupt
    column — so ``quarantined.count()`` is rejected by Spark. Reference a
    data column alongside it (``select('doc_id', '_corrupt')``) or persist
    the parsed frame first; the triage queries in tests/test_textfiles.py
    show the pattern."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
