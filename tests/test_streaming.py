"""Streaming ingest test: two file drops -> incremental partials ->
compacted tier equals the batch rollup over all data."""

import os

import pandas as pd
import pytest

from fruits_spark import datagen
from fruits_spark.engine import rollup as RU
from fruits_spark.engine.executor import extract_features, feature_columns
from fruits_spark.plan import ISSSpec, Sieve, Slice, FruitPlan
from fruits_spark.streaming import compact_tier, start_stream_rollup
from fruits_spark.words import W

PLAN = FruitPlan(
    (Slice(iss=ISSSpec((W("[11]"),)), sieves=(Sieve("end"),)),)
)


def test_incremental_stream_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "tiers")
    os.makedirs(inp)

    pdf = datagen.generate_pandas(400, seed=3, max_len=48)
    # drop files in two waves
    spark.createDataFrame(pdf.iloc[:250]).write.mode("append").parquet(inp)

    q = start_stream_rollup(spark, inp, out, PLAN, n_buckets=16)
    q.awaitTermination(120)

    spark.createDataFrame(pdf.iloc[250:]).write.mode("append").parquet(inp)
    q2 = start_stream_rollup(spark, inp, out, PLAN, n_buckets=16)
    q2.awaitTermination(120)

    fcols = feature_columns(PLAN)
    tier = compact_tier(spark, out, fcols).toPandas()

    # batch equivalent over all 400 docs
    full = spark.createDataFrame(pdf)
    feats = extract_features(full, PLAN)
    expect = RU.rollup_tier(
        feats, RU.Tier("t", 1), 16, fcols
    ).toPandas()

    key = ["source", "bucket"]
    tier = tier.sort_values(key).reset_index(drop=True)
    expect = expect.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        tier[expect.columns], expect, check_exact=False, rtol=1e-9,
        check_dtype=False,
    )
