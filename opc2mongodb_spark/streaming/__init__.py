from opc2mongodb_spark.streaming.dedup_gate import CorpusIngestGate
from opc2mongodb_spark.streaming.pipeline import (
    normalize_stream,
    session_activity,
    sliding_avg,
    streaming_last_value,
    tumbling_counts,
    tumbling_ohlc,
    with_late_data_policy,
)
from opc2mongodb_spark.streaming.sinks import CurrentValuesStore, upsert_query
from opc2mongodb_spark.streaming.ledger import BatchLedger
from opc2mongodb_spark.streaming.stateful import (
    cusum_stream,
    deadband_stream,
    ewma_stream,
    heavy_hitters_stream,
    psi_drift_stream,
    hysteresis_stream,
    schema_drift_stream,
    psi_reference,
    quota_gate,
    sdt_stream,
    srm_stream,
    value_changes,
    watchdog_stream,
)

__all__ = [
    "BatchLedger",
    "CorpusIngestGate",
    "CurrentValuesStore",
    "cusum_stream",
    "deadband_stream",
    "ewma_stream",
    "heavy_hitters_stream",
    "psi_drift_stream",
    "hysteresis_stream",
    "schema_drift_stream",
    "psi_reference",
    "quota_gate",
    "srm_stream",
    "sdt_stream",
    "normalize_stream",
    "session_activity",
    "sliding_avg",
    "streaming_last_value",
    "tumbling_counts",
    "tumbling_ohlc",
    "upsert_query",
    "value_changes",
    "watchdog_stream",
    "with_late_data_policy",
]
