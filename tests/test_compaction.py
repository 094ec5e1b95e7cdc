"""Small-file compaction (operators/compaction.py) — filesystem-effect
golden tests, per SURVEY §5 (same mechanism as the sink swap tests)."""

import os

import pytest
from pyspark.sql import functions as F

from opc2mongodb_spark.operators.compaction import compact_parquet, dir_stats


def _write_fragmented(spark, path, n_files=40, rows=4000):
    spark.range(rows).withColumn("v", F.col("id") * 2).repartition(
        n_files
    ).write.mode("overwrite").parquet(path)


def test_compacts_fragmented_directory(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_fragmented(spark, p, n_files=40)
    _, files0 = dir_stats(p)
    assert files0 == 40
    before = {(r.id, r.v) for r in spark.read.parquet(p).collect()}

    stats = compact_parquet(spark, p, target_bytes=1 << 30)  # everything fits
    assert stats["compacted"] is True
    assert stats["files_after"] == 1
    # data survives byte-for-byte, staging/backup are gone
    assert {(r.id, r.v) for r in spark.read.parquet(p).collect()} == before
    assert not os.path.exists(p + "._compact_staging")
    assert not os.path.exists(p + "._pre_compact")


def test_target_bytes_controls_file_count(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_fragmented(spark, p, n_files=40, rows=20000)
    total, _ = dir_stats(p)
    target = total // 4
    stats = compact_parquet(spark, p, target_bytes=target)
    assert stats["compacted"] is True
    # ceil division: 4 or 5 output files depending on overhead
    assert 2 <= stats["files_after"] <= 8
    assert stats["files_after"] == stats["n_out"]


def test_healthy_table_is_left_alone(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_fragmented(spark, p, n_files=1)
    mtimes = {
        f: os.path.getmtime(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    }
    stats = compact_parquet(spark, p, target_bytes=1 << 30)
    assert stats["compacted"] is False
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(p, f)) == m  # untouched


def test_partitioned_layout_preserved(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).withColumn("part", (F.col("id") % 3).cast("int")).repartition(
        20
    ).write.mode("overwrite").partitionBy("part").parquet(p)
    before = {
        (r.id, r.part) for r in spark.read.parquet(p).collect()
    }
    stats = compact_parquet(
        spark, p, target_bytes=1 << 30, partition_cols=["part"]
    )
    assert stats["compacted"] is True
    assert sorted(
        d for d in os.listdir(p) if d.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]
    assert {(r.id, r.part) for r in spark.read.parquet(p).collect()} == before


def test_rejects_bad_target(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path), target_bytes=0)
