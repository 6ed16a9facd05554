"""Round-1 widening: INC/INT sieve wrappers (reference
sieving/wrapper.py:9-104), Bayesian semiring END parity, CTS/QTC prep
chain, and embedding near-dup LSH blocking.

Flat-vs-bucketed parity is the engine's own metamorphic oracle (the
bucketed kernels are the reference-parity implementation)."""

import numpy as np
import pandas as pd
import pytest

from fruits_spark.engine.executor import (
    compute_features_block,
    compute_features_flat,
)
from fruits_spark.kernels.segments import flatten_lists
from fruits_spark.plan import FruitPlan, ISSSpec, Prep, Sieve, Slice
from fruits_spark.words import W


def _rows(n=40, seed=3):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 101, rng.integers(4, 33)).astype(np.float64)
        for _ in range(n)
    ]


def _both_paths(fplan, rows):
    values, offsets = flatten_lists(pd.Series(rows))
    ff = compute_features_flat(values, offsets, fplan)
    fb = np.vstack(
        [compute_features_block(x.reshape(1, 1, -1), fplan) for x in rows]
    )
    return ff, fb


def test_pre_wrapper_flat_matches_bucketed():
    fplan = FruitPlan(
        (
            Slice(
                iss=ISSSpec((W("[1]"), W("[11]"))),
                sieves=(
                    Sieve("max", {"pre": 1}),
                    Sieve("min", {"pre": 1}),
                    Sieve("end", {"pre": -1}),
                    Sieve("npi", {"pre": -1}),
                    Sieve("ppv", {"quantiles": [100.0], "pre": -1}),
                ),
            ),
        )
    )
    ff, fb = _both_paths(fplan, _rows())
    np.testing.assert_allclose(ff, fb, rtol=1e-12)


def test_pre_wrapper_semantics():
    # INC(MAX) on the [1] run stream == max over (0, x_1, x_2, ...);
    # INT(END) == sum of the running values (wrapper.py:9-104 semantics)
    rows = _rows(10)
    fplan = FruitPlan(
        (
            Slice(
                iss=ISSSpec((W("[1]"),)),
                sieves=(Sieve("max", {"pre": 1}), Sieve("end", {"pre": -1})),
            ),
        )
    )
    ff, _ = _both_paths(fplan, rows)
    for i, x in enumerate(rows):
        run1 = np.cumsum(x)
        d = np.zeros_like(run1)
        d[1:] = np.diff(run1)
        assert ff[i, 0] == d.max()
        assert ff[i, 1] == run1.sum()


def test_pre_wrapper_double_depth():
    # pre=2: two-fold increments; pre=-2: double cumsum
    rows = _rows(8, seed=9)
    fplan = FruitPlan(
        (
            Slice(
                iss=ISSSpec((W("[1]"),)),
                sieves=(Sieve("max", {"pre": 2}), Sieve("end", {"pre": -2})),
            ),
        )
    )
    ff, fb = _both_paths(fplan, rows)
    np.testing.assert_allclose(ff, fb, rtol=1e-12)
    for i, x in enumerate(rows):
        run1 = np.cumsum(x)
        d = run1.copy()
        for _ in range(2):
            nxt = np.zeros_like(d)
            nxt[1:] = np.diff(d)
            d = nxt
        assert ff[i, 0] == d.max()
        assert ff[i, 1] == np.cumsum(np.cumsum(run1))[-1]


def test_bayesian_end_nonstrict_indices():
    # reference Bayesian kernel (semiring.py:466-530) has NO shift
    # between levels -> indices i1 <= i2; END([e1][e2]) ==
    # max_j(runmax(x^e1)_j * x_j^e2)
    rows = _rows(20, seed=5)
    fplan = FruitPlan(
        (
            Slice(
                iss=ISSSpec(
                    (W("[1][1]"), W("[11][1]")), semiring="bayesian"
                ),
                sieves=(Sieve("end"),),
            ),
        )
    )
    ff, fb = _both_paths(fplan, rows)
    np.testing.assert_allclose(ff, fb, rtol=1e-12)
    for i, x in enumerate(rows):
        r1 = np.maximum.accumulate(x)
        r2 = np.maximum.accumulate(x * x)
        assert ff[i, 0] == (r1 * x).max()
        assert ff[i, 1] == (r2 * x).max()


def test_cts_qtc_prep_chain():
    rows = _rows(12, seed=7)
    fplan = FruitPlan(
        (
            Slice(
                preps=(Prep("cts", {"s": 2}), Prep("qtc", {"q_value": 75.0})),
                iss=ISSSpec((W("[1]"),)),
                sieves=(Sieve("end"),),
            ),
        )
    )
    values, offsets = flatten_lists(pd.Series(rows))
    # cts/qtc are bucketed-only -> extract path falls back; emulate via
    # per-row blocks
    for x in rows:
        f = compute_features_block(x.reshape(1, 1, -1), fplan)[0, 0]
        y = np.concatenate([x[2:], [x[-1], x[-1]]])
        assert f == np.minimum(y, 75.0).sum()


def test_embedding_near_dups_blocking(spark):
    # LSH-bucketed near-dup == brute-force pairs restricted to
    # same-bucket candidates (exact integer dots on both sides)
    from fruits_spark.pipeline import embedding_near_dups

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 16))
    # plant near-duplicates: rows 20..24 are noisy copies of 0..4
    base[20:25] = base[0:5] + 0.01 * rng.normal(size=(5, 16))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in base[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    H = rng.choice(np.array([-1.0, 1.0]), size=(4, 16))
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(emb, H, threshold=0.95).collect()
    }
    # brute force with identical quantization + bucketing
    Q = np.floor(base * 10000)
    qn = (Q * Q).sum(1)
    proj = Q @ H.T
    bucket = ((proj > 0) * (1 << np.arange(4))).sum(axis=1)
    want = set()
    for i in range(30):
        for j in range(i + 1, 30):
            if bucket[i] != bucket[j]:
                continue
            cos = (Q[i] @ Q[j]) / np.sqrt(qn[i] * qn[j])
            if cos > 0.95:
                want.add((i, j))
    assert got == want
    assert want, "fixture should contain at least one planted near-dup"
