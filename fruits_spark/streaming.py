"""Structured Streaming ingest: continuous aggregates, incrementally.

The reference is batch-only; the engine's tiers, however, are *algebraic*
aggregates (count/sum/max), so they can be maintained incrementally:
each micro-batch of newly arrived sequences is feature-extracted and
pre-aggregated into per-(source, bucket) partial cells, appended to a
partials table, and compacted into the tier by re-aggregating partials —
no raw token data is ever revisited.

``foreachBatch`` (not a stateful streaming agg) is the right construct
here: the per-sequence math lives in the same ``extract_features``
mapInPandas used by batch jobs, the sink is an ordinary table, and
exactly-once comes from the (checkpoint, batch_id) pair — each batch id
writes to its own subdirectory, making replays idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import rollup as RU
from .engine.executor import extract_features, feature_columns
from .engine.rollup import _sql_agg

TOKEN_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)


def partial_cells(
    feats: DataFrame, n_buckets: int, fcols: list[str], bucket_expr=None
) -> DataFrame:
    """Per-batch partial aggregate cells (same layout as tier cells)."""
    return RU.rollup_tier(
        feats, RU.Tier("stream", 1), n_buckets, fcols,
        bucket_expr=bucket_expr,
    )


def start_stream_rollup(
    spark: SparkSession,
    input_path: str,
    output_base: str,
    fplan,
    n_buckets: int = 64,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
    bucket_expr=None,
    schema: str = TOKEN_SCHEMA,
):
    """Start (and return) the streaming query: new parquet files under
    ``input_path`` are rolled into ``{output_base}/partials``."""
    fcols = feature_columns(fplan)
    partials_path = os.path.join(output_base, "partials")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        feats = extract_features(batch_df, fplan)
        cells = partial_cells(feats, n_buckets, fcols, bucket_expr)
        # idempotent on replay: one directory per batch id, overwritten
        cells.withColumn("_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(partials_path, f"batch={batch_id}"))

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    writer = reader.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation",
        checkpoint or os.path.join(output_base, "_checkpoint"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_tier(
    spark: SparkSession, output_base: str, fcols: list[str]
) -> DataFrame:
    """Fold all partial cells into the current tier view (algebraic
    re-aggregation: sums of sums, max of maxes)."""
    partials = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(output_base, "partials")
    )
    return _sql_agg(partials, ["source", "bucket"], RU.reagg_exprs(fcols))
