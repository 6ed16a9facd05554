import os

import pytest

from fruits_spark.engine import compact as CP
from fruits_spark.engine import lineage as LI


def _fragmented(spark, tmp_path, n_files=12):
    path = str(tmp_path / "frag")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df.repartition(n_files).write.parquet(path)
    return path, sorted((r.id, r.v) for r in df.collect())


def test_compact_dir_packs_and_preserves_rows(spark, tmp_path):
    path, expect = _fragmented(spark, tmp_path)
    assert CP.count_data_files(path) == 12
    stats = CP.compact_dir(spark, path)
    assert not stats["skipped"]
    assert stats["files_before"] == 12
    # 1000 tiny rows << 128 MB -> bin-packs to a single file
    assert stats["files_after"] == 1
    got = sorted(
        (r.id, r.v) for r in spark.read.parquet(path).collect()
    )
    assert got == expect


def test_compact_dir_idempotent_skip(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path)
    CP.compact_dir(spark, path)
    again = CP.compact_dir(spark, path)
    assert again["skipped"] and again["files_after"] == 1


def test_compact_dir_missing_dir_is_noop(spark, tmp_path):
    stats = CP.compact_dir(spark, str(tmp_path / "nope"))
    assert stats == {"files_before": 0, "files_after": 0, "bytes": 0,
                     "skipped": True}


def test_compact_dir_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(300)],
        "doc_id long, source string, v double",
    )
    df.repartition(10).write.partitionBy("source").parquet(path)
    before = CP.count_data_files(path)
    assert before > 3
    stats = CP.compact_dir(spark, path, partition_cols=("source",))
    # floor is one file per hive partition value
    assert stats["files_after"] == 3
    back = spark.read.parquet(path)
    assert sorted(
        r.source for r in back.select("source").distinct().collect()
    ) == ["s0", "s1", "s2"]
    assert back.where("source = 's1'").count() == 100
    got = sorted((r.doc_id, r.source, r.v) for r in back.collect())
    assert got == sorted((i, f"s{i % 3}", float(i)) for i in range(300))


def test_recover_dir_promotes_staged_else_rolls_back(spark, tmp_path):
    path, expect = _fragmented(spark, tmp_path)
    staged, old = path + "__compacting", path + "__old"
    # crash AFTER live -> old (staged copy complete): promote staged
    spark.read.parquet(path).coalesce(1).write.parquet(staged)
    os.rename(path, old)
    CP.recover_dir(path)
    assert os.path.isdir(path) and not os.path.exists(staged)
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == expect
    # old is debris after a promote (cleared by the next writer under
    # its lock, never by readers)
    import shutil

    shutil.rmtree(old)
    # crash with only old present (before staging finished): roll back
    os.rename(path, old)
    CP.recover_dir(path)
    assert os.path.isdir(path) and not os.path.exists(old)


def test_compact_manifest_packs_without_losing_rows(spark, tmp_path):
    base = str(tmp_path / "store")
    cells = spark.createDataFrame(
        [("s0", b, 10, 100) for b in range(4)],
        "source string, bucket int, n_docs long, sum_tok long",
    )
    # four append batches -> >= 4 manifest files
    for i in range(4):
        LI.commit_cells(
            cells.where(cells.bucket == i), spark, base, "r1", "t1k",
            n_points_per_doc=3,
        )
    mpath = LI.manifest_path(base)
    files_before = CP.count_data_files(mpath)
    assert files_before >= 4
    rows_before = sorted(
        map(tuple, spark.read.parquet(mpath).collect())
    )
    stats = LI.compact_manifest(spark, base)
    assert stats["files_before"] == files_before
    assert stats["files_after"] == 1
    assert sorted(map(tuple, spark.read.parquet(mpath).collect())) \
        == rows_before
    # resume semantics intact: all 4 cells still read as committed
    done = LI.completed_cells(spark, base, "r1", "t1k")
    assert done.count() == 4


def test_compact_manifest_empty_base(spark, tmp_path):
    stats = LI.compact_manifest(spark, str(tmp_path / "empty"))
    assert stats["files_before"] == stats["files_after"] == 0
