"""Round-5 additions: the routed-read job surface as a library function
(route_query_cells) and its failure modes."""

import pytest
from pyspark.sql import functions as F

import fruits_spark.engine.rollup as RU


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "run string, source string, bucket int, n_docs long, "
              "sum_tok long, sum_f0 double, max_f0 double",
    )


def test_route_query_cells_dedupes_and_merges_runs(spark):
    # two runs partition the docs; rA's data rows appended twice
    fine_rows = [
        ("rA", "s", b, 1, 10, 1.0, 1.0) for b in range(16)
    ] + [
        ("rB", "s", b, 2, 20, 2.0, 2.0) for b in range(16)
    ]
    fine = _cells(spark, fine_rows + fine_rows[:16])  # rA duplicated
    coarse_rows = [
        ("rA", "s", c, 4, 40, 4.0, 1.0) for c in range(4)
    ] + [
        ("rB", "s", c, 8, 80, 8.0, 2.0) for c in range(4)
    ]
    coarse = _cells(spark, coarse_rows + coarse_rows[4:])  # rB duplicated
    out = RU.route_query_cells(fine, coarse, 4, 2, 14, ["f0"]).collect()
    assert len(out) == 1
    r = out[0]
    # 12 fine buckets x (1 + 2) docs; dedupe must kill the re-appends
    assert r["n_docs"] == 36
    assert r["sum_tok"] == 360
    assert r["sum_f0"] == 36.0
    assert r["max_f0"] == 2.0


def test_route_query_cells_refuses_mismatched_run_sets(spark):
    fine = _cells(spark, [("rA", "s", 0, 1, 10, 1.0, 1.0)])
    coarse = _cells(spark, [("rB", "s", 0, 1, 10, 1.0, 1.0)])
    with pytest.raises(ValueError, match="run sets differ"):
        RU.route_query_cells(fine, coarse, 4, 0, 1, ["f0"])


def test_route_query_cells_matches_direct(spark):
    # routed (coarse interior + fine edges) == direct fine-only recompute
    fine_rows = [
        ("r1", f"s{i % 2}", b, 1 + b % 3, 10 * (1 + b % 3),
         float(b), float(b))
        for i in range(2) for b in range(32)
    ]
    fine = _cells(spark, fine_rows)
    coarse = RU.reagg_tier(
        fine, ["f0"], bucket_expr=F.floor(F.col("bucket") / 8).cast("int")
    ).withColumn("run", F.lit("r1"))
    lo, hi = 3, 29
    routed = {
        r["source"]: (r["n_docs"], r["sum_tok"], r["sum_f0"], r["max_f0"])
        for r in RU.route_query_cells(
            fine, coarse, 8, lo, hi, ["f0"]
        ).collect()
    }
    direct = {
        r["source"]: (r["n_docs"], r["sum_tok"], r["sum_f0"], r["max_f0"])
        for r in RU._sql_agg(
            RU._cell_payload(
                fine.where((F.col("bucket") >= lo) & (F.col("bucket") < hi)),
                ["f0"],
            ),
            ["source"], RU.reagg_exprs(["f0"]),
        ).collect()
    }
    assert routed == direct


def test_multisine_known_spectrum_through_extract(spark):
    """multisine parity sweep (reference corbeille/data.py:25-123):
    with zero noise every row IS its class model, so the END feature of
    word [1] equals the model's cumulative sum — checked against the
    numpy model directly; labels follow the reference's contiguous
    block layout with the remainder loop."""
    import numpy as np

    from fruits_spark import datagen as DG
    from fruits_spark.engine.executor import extract_features, feature_columns
    from fruits_spark.plan import ISSSpec, Sieve, Slice, FruitPlan
    from fruits_spark.words import W

    coeff = np.array([
        [[1.0, 1.0, 0.0], [0.5, 3.0, 0.7]],
        [[2.0, 2.0, 1.0], [0.25, 5.0, 0.1]],
        [[1.5, 0.5, 0.4], [1.0, 4.0, 2.0]],
    ])
    df = DG.multisine_spark(
        spark, n_rows=10, length=64, n_classes=3, coefficients=coeff,
        noise_std=0.0,
    )
    rows = df.orderBy("doc_id").collect()
    # 10 over 3 classes: remainder lands on class remain % n_classes = 1
    # (reference data.py:70-75 loop) -> sizes [3, 4, 3]
    assert [r["label"] for r in rows] == [0]*3 + [1]*4 + [2]*3
    models = DG.multisine_models(64, 3, coefficients=coeff)
    np.testing.assert_allclose(rows[0]["tokens"], models[0], rtol=1e-12)
    np.testing.assert_allclose(rows[9]["tokens"], models[2], rtol=1e-12)

    fplan = FruitPlan(
        (Slice(iss=ISSSpec((W("[1]"),)), sieves=(Sieve("end"),)),)
    )
    fc = feature_columns(fplan)
    out = extract_features(
        df.withColumn("source", F.lit("s")), fplan,
        keep=("doc_id", "label", "source", "n_tok"),
    ).orderBy("doc_id").collect()
    for r in out:
        np.testing.assert_allclose(
            r[fc[0]], models[r["label"]].sum(), rtol=1e-9
        )


def test_multisine_noise_deterministic_and_seeded(spark):
    from fruits_spark import datagen as DG

    a = DG.multisine_spark(spark, n_rows=6, length=16, seed=3)
    b = DG.multisine_spark(spark, n_rows=6, length=16, seed=3)
    c = DG.multisine_spark(spark, n_rows=6, length=16, seed=4)
    ra = [r["tokens"] for r in a.orderBy("doc_id").collect()]
    rb = [r["tokens"] for r in b.orderBy("doc_id").collect()]
    rc = [r["tokens"] for r in c.orderBy("doc_id").collect()]
    assert ra == rb            # bit-identical across runs
    assert ra != rc            # seed moves both coefficients and noise
    # noise is per-position independent: values differ inside a row
    assert len(set(ra[0])) > 10
