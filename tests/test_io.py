"""I/O seam: parquet stand-in branch with the shared (base, table,
run_id) contract (the Iceberg branch needs a catalog jar — selected by
SPARK_GRAFT_CATALOG in production; it appends a run_id column and
retains via DELETE on it)."""

import os

from pyspark.sql import functions as F

from fruits_spark.engine import io as IO


def _cells(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("bucket"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") * 2).alias("v"),
    )


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    base = str(tmp_path)
    IO.write_tier(_cells(spark), base, "t1k", "r1")
    path = os.path.join(base, "t1k", "run=r1")
    back = IO.read_table(spark, path)
    assert back.count() == 20
    # partitioned layout on disk -> partition pruning is available
    assert any(d.startswith("source=") for d in os.listdir(path))
    pruned = back.where(F.col("source") == "1")
    assert pruned.count() == _cells(spark).where(F.col("source") == "1").count()


def test_rewrite_same_run_is_idempotent(spark, tmp_path):
    base = str(tmp_path)
    IO.write_tier(_cells(spark, 20), base, "t1k", "r1")
    IO.write_tier(_cells(spark, 5), base, "t1k", "r1")  # re-run replaces
    assert IO.read_table(spark, os.path.join(base, "t1k", "run=r1")).count() == 5


def test_retention_drops_run_partitions(spark, tmp_path):
    base = str(tmp_path)
    for run in ("r1", "r2"):
        IO.write_tier(_cells(spark, 5), base, "codec_t1k", run)
    IO.drop_retired_partitions(spark, base, "codec_t1k", ["r1"])
    assert not os.path.exists(os.path.join(base, "codec_t1k", "run=r1"))
    assert os.path.exists(os.path.join(base, "codec_t1k", "run=r2"))


def test_table_ident_sanitizes_pathish_names():
    assert IO._table_ident("out/codec_t1k/run=x") == "out_codec_t1k_run_x"
    assert IO._table_ident("codec_t1k") == "codec_t1k"
