"""Spark bindings for the Gorilla / delta-of-delta codecs.

Rolled-up signature streams (one double per tier cell, ordered by bucket)
are packed per source into ``binary`` columns:  collect_list over a
bucket-ordered window -> pandas UDF encode -> one (source, codec blob,
count) row per source & feature.  Decode is the inverse UDF; roundtrip is
exact (tests/test_codec.py, tests/test_spark_engine.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType

from ..kernels.codec import dod_encode, gorilla_decode, gorilla_encode


@F.pandas_udf(BinaryType())
def gorilla_pack(vals: pd.Series) -> pd.Series:
    import numpy as np

    return vals.map(
        lambda v: gorilla_encode(np.asarray(v, dtype=np.float64))
    )


@F.pandas_udf(BinaryType())
def dod_pack(vals: pd.Series) -> pd.Series:
    import numpy as np

    return vals.map(lambda v: dod_encode(np.asarray(v, dtype=np.int64)))


def encode_streams(
    rolled: DataFrame, value_col: str, key: str = "source",
    order: str = "bucket", chunk: int = 4096,
) -> DataFrame:
    """Per (key, chunk of ``chunk`` cells): sort cells by ``order`` and
    compress the value stream (Gorilla) plus the bucket-id stream
    (delta-of-delta) into one blob row.

    Chunking bounds the skew-prone part: the sum/max tier rollup is
    skew-immune (map-side partial aggregation collapses every task's
    output to one row per cell — measured, BENCH.md), but packing a
    WHOLE source's stream into one ``collect_list`` row puts ~half the
    cells on one reducer under Zipf sources and needs O(stream) memory
    (8 GB/source at 10^12 scale).  ``floor(bucket/chunk)`` shards the
    stream into fixed-size independent blocks — standard time-series
    block layout (readers seek by chunk id), reducer memory O(chunk)."""
    chunk_id = F.floor(F.col(order) / chunk).cast("long").alias("chunk_id")
    per_key = (
        rolled.select(key, order, value_col)
        .groupBy(key, chunk_id)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(order, value_col))
            ).alias("cells")
        )
        .select(
            key,
            "chunk_id",
            F.col(f"cells.{order}").alias("buckets"),
            F.col(f"cells.{value_col}").alias("vals"),
        )
    )
    return per_key.select(
        key,
        "chunk_id",
        F.size("vals").alias("n"),
        gorilla_pack(F.col("vals")).alias("gorilla_blob"),
        dod_pack(F.col("buckets").cast("array<long>")).alias("dod_blob"),
    )


def decode_stream(blob: bytes, n: int):
    """Driver-side decode helper (verification / reads)."""
    return gorilla_decode(blob, n)
