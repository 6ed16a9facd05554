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


def test_streaming_plus_realtime_view_is_always_current(spark, tmp_path):
    """Composition: a tier maintained by the streaming job + the
    real-time view answer queries over data the stream has NOT yet
    processed.  Buckets are arrival-monotone (the continuous-aggregate
    invariant realtime_tier documents), the stream materializes the
    first wave only, and realtime_tier over (materialized cells, all
    raw features) must equal the batch rollup over everything."""
    from pyspark.sql import functions as F

    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "tiers")
    os.makedirs(inp)
    rows = [
        (
            d,
            [(d * 7 + i) % 50 for i in range(d % 13 + 4)],
            d % 13 + 4,
            f"s{d % 3}",
        )
        for d in range(400)
    ]
    schema = "doc_id long, tokens array<int>, n_tok int, source string"
    all_df = spark.createDataFrame(rows, schema)
    bexpr = F.floor(F.col("doc_id") / 50).cast("int")

    # wave 1 = docs 0..199 -> buckets 0..3 COMPLETE (arrival-monotone)
    spark.createDataFrame(rows[:200], schema).write.mode("append").parquet(inp)
    q = start_stream_rollup(
        spark, inp, out, PLAN, n_buckets=8, bucket_expr=bexpr,
        schema=schema,
    )
    q.awaitTermination(120)

    fcols = feature_columns(PLAN)
    materialized = compact_tier(spark, out, fcols)
    assert materialized.agg(F.max("bucket")).collect()[0][0] == 3

    feats_all = extract_features(all_df, PLAN)
    rt = RU.realtime_tier(
        materialized, feats_all, RU.Tier("t", 1), 8, fcols,
        bucket_expr=bexpr,
    ).toPandas()
    expect = RU.rollup_tier(
        feats_all, RU.Tier("t", 1), 8, fcols, bucket_expr=bexpr
    ).toPandas()
    key = ["source", "bucket"]
    rt = rt.sort_values(key).reset_index(drop=True)
    expect = expect.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        rt[expect.columns], expect, check_exact=False, rtol=1e-9,
        check_dtype=False,
    )


def test_stateful_tier_updates_equal_batch(spark, tmp_path):
    """applyInPandasWithState tier maintainer: the final state per
    (source, bucket) must equal the batch rollup (integer plan keeps
    every aggregate exact regardless of micro-batch split)."""
    from pyspark.sql import functions as F

    from fruits_spark import streaming as ST

    fplan = FruitPlan(
        (Slice(iss=ISSSpec((W("[1]"), W("[11]"))), sieves=(Sieve("end"),)),)
    )
    fc = feature_columns(fplan)
    toks = spark.createDataFrame(
        datagen.generate_pandas(300, seed=11, max_len=48)
    )
    inp = str(tmp_path / "in")
    # several files so availableNow takes multiple triggers
    toks.repartition(6).write.parquet(inp)

    updates = ST.stateful_tier_updates(
        spark, inp, fplan, n_buckets=8,
        bucket_expr=(F.xxhash64("doc_id") % 8 + 8) % 8,
        max_files_per_trigger=2,
        schema="doc_id string, tokens array<int>, n_tok int, source string",
    )
    q = (
        updates.writeStream.format("memory").queryName("stateful_cells")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    mem = spark.sql("select * from stateful_cells")
    # latest update per key = the row with max n_docs (monotone per key)
    from pyspark.sql import Window

    w = Window.partitionBy("source", "bucket").orderBy(F.desc("n_docs"))
    final = (
        mem.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    feats = extract_features(toks, fplan)
    batch = RU.rollup_tier(
        feats, RU.Tier("t", 1), 8, fc,
        bucket_expr=((F.xxhash64("doc_id") % 8 + 8) % 8).cast("int"),
    )
    key = lambda r: (r["source"], int(r["bucket"]))
    got = {key(r): (r["n_docs"], r["sum_tok"],
                    r[f"sum_{fc[0]}"], r[f"max_{fc[0]}"],
                    r[f"sum_{fc[1]}"], r[f"max_{fc[1]}"])
           for r in final.collect()}
    want = {key(r): (r["n_docs"], r["sum_tok"],
                     r[f"sum_{fc[0]}"], r[f"max_{fc[0]}"],
                     r[f"sum_{fc[1]}"], r[f"max_{fc[1]}"])
            for r in batch.collect()}
    assert got == want
