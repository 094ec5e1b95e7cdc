from opc2mongodb_spark.sources.tables import TABLE_NAMES, load_table, register_views
from opc2mongodb_spark.sources.textfiles import (
    read_documents_csv,
    read_documents_jsonl,
    split_quarantine,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "read_documents_csv",
    "read_documents_jsonl",
    "register_views",
    "split_quarantine",
]
