"""I/O seam: parquet stand-in branch (the Iceberg branch needs a
catalog jar — selected by SPARK_GRAFT_CATALOG in production)."""

import os

from pyspark.sql import functions as F

from fruits_spark.engine import io as IO


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    df = spark.range(20).select(
        F.col("id").alias("bucket"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "tier")
    IO.write_tier(df, path, mode="overwrite")
    back = IO.read_table(spark, path)
    assert back.count() == 20
    # partitioned layout on disk -> partition pruning is available
    assert any(d.startswith("source=") for d in os.listdir(path))
    pruned = back.where(F.col("source") == "1")
    assert pruned.count() == df.where(F.col("source") == "1").count()


def test_retention_drops_run_partitions(spark, tmp_path):
    base = str(tmp_path / "codec_t1k")
    for run in ("r1", "r2"):
        df = spark.range(5).select(
            F.lit("srcA").alias("source"), F.col("id").alias("v")
        )
        IO.write_tier(df, os.path.join(base, f"run={run}"), mode="overwrite")
    IO.drop_retired_partitions(spark, base, ["r1"])
    assert not os.path.exists(os.path.join(base, "run=r1"))
    assert os.path.exists(os.path.join(base, "run=r2"))
