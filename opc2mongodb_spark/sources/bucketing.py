"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4 posture:
"partition sinks by server/date; bucketing for co-located joins").

At 100 TB the lineitem⋈orders edge is the expensive shuffle: both sides
repartition on orderkey every query. Bucketing both tables by the join key
at WRITE time moves that shuffle out of the query path entirely — every
subsequent join on the key is Exchange-free (verified by
tests/test_scale_patterns.py::test_bucketed_join_has_no_exchange on the
physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorted buckets additionally let sort-merge joins skip the per-task sort."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
