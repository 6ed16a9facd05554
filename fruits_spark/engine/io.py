"""Table I/O seam: Iceberg catalog tables in production, parquet paths
as the sandbox stand-in.

The north-rule deployment stores the token table and the tier outputs as
Iceberg tables partitioned by ``(source, bucket(doc_id))`` — partition
pruning, snapshot isolation, and ``writeTo(...).append()`` commits come
from the format.  This container has no Iceberg runtime jar (no network
installs), so the engine routes all I/O through this module:

  * if ``SPARK_GRAFT_CATALOG`` names a configured Iceberg catalog
    (e.g. ``spark.sql.catalog.lake = org.apache.iceberg...``), names are
    treated as catalog tables and writes use ``writeTo`` appends;
  * otherwise names are parquet directory paths with an identical
    layout (the partitioned write keeps (source, bucket) files prunable).

Everything else in the engine (rollups, gap-fill, lineage commits) is
format-agnostic — it only ever sees DataFrames from/for this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _catalog() -> str | None:
    return os.environ.get("SPARK_GRAFT_CATALOG") or None


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a token/tier table by catalog name or parquet path."""
    cat = _catalog()
    if cat:
        return spark.read.table(f"{cat}.{name}")
    return spark.read.parquet(name)


def write_tier(
    df: DataFrame,
    name: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = ("source",),
) -> None:
    """Write tier cells: Iceberg ``writeTo`` append (atomic snapshot
    commit) or a partitioned parquet write with the same layout."""
    cat = _catalog()
    if cat:
        w = df.writeTo(f"{cat}.{name}")
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(name)
    )


def drop_retired_partitions(
    spark: SparkSession, name: str, run_ids: list[str]
) -> None:
    """Retention: drop tier partitions for retired runs.  On Iceberg
    this is a metadata-only ``DELETE WHERE run_id IN (...)`` (or
    ``expire_snapshots``); on parquet it removes ``run=<id>``
    subdirectories."""
    cat = _catalog()
    if cat:
        ids = ", ".join(f"'{r}'" for r in run_ids)
        spark.sql(f"DELETE FROM {cat}.{name} WHERE run_id IN ({ids})")
        return
    import shutil

    for r in run_ids:
        p = os.path.join(name, f"run={r}")
        if os.path.exists(p):
            shutil.rmtree(p)
