"""opc2mongodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference OPC→MongoDB streaming ETL bridge
(riclolsen/OPC2MongoDB, surveyed in /root/repo/SURVEY.md), generalized into a
full batch + streaming analytics surface and extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §1.4/§4): everything is declared through the
DataFrame / Spark SQL API so Catalyst + Tungsten choose the physical plan;
Python UDFs only where built-ins genuinely cannot express the semantics
(and then Arrow-batched pandas UDFs, never row-at-a-time).
"""

from opc2mongodb_spark.engine import Engine
from opc2mongodb_spark.pipelines import (
    CurationResult,
    curate_corpus,
    experiment_readout,
    monitor_readout,
    user_features,
)
from opc2mongodb_spark.session import get_spark

__all__ = [
    "CurationResult",
    "Engine",
    "curate_corpus",
    "experiment_readout",
    "monitor_readout",
    "get_spark",
    "user_features",
]
__version__ = "0.1.0"
