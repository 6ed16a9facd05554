"""CosWISS brute-force oracle tests (reference:
tests/signature/test_cosine.py:6-135)."""

import numpy as np
import pytest

from fruits_spark.kernels.iss import coswiss, coswiss_table
from fruits_spark.words import W

RNG = np.random.default_rng(13)


def g_of(length, freq):
    return np.pi * np.arange(length) / (freq * (length - 1))


def test_exp1_len2_oracle():
    # word [1][23], freq 0.5, s=1 — O(l^2) definition
    X = RNG.random((6, 3, 30))
    res = coswiss(X, W("[1][23]").matrix, 0.5, exponent=1)[:, -1]
    g = g_of(30, 0.5)
    expect = np.zeros(6)
    for m in range(6):
        for k in range(30):
            for j in range(k):
                expect[m] += (
                    X[m, 0, j] * X[m, 1, k] * X[m, 2, k]
                    * np.cos(g[k] - g[j])
                )
    np.testing.assert_allclose(res, expect, rtol=1e-5)


def test_exp1_len3_oracle():
    X = RNG.random((5, 3, 20))
    res = coswiss(X, W("[12][2][33]").matrix, 0.5, exponent=1)[:, -1]
    g = g_of(20, 0.5)
    expect = np.zeros(5)
    for m in range(5):
        for k in range(20):
            for j in range(k):
                for i in range(j):
                    expect[m] += (
                        X[m, 0, i] * X[m, 1, i] * X[m, 1, j]
                        * X[m, 2, k] ** 2
                        * np.cos(g[j] - g[i]) * np.cos(g[k] - g[j])
                    )
    np.testing.assert_allclose(res, expect, rtol=1e-5)


def test_exp1_total_oracle():
    X = RNG.random((5, 3, 25))
    res = coswiss(X, W("[1][23]").matrix, 0.5, exponent=1, total=True)[:, -1]
    g = g_of(25, 0.5)
    expect = np.zeros(5)
    for m in range(5):
        for k in range(25):
            for j in range(k):
                expect[m] += (
                    X[m, 0, j] * X[m, 1, k] * X[m, 2, k]
                    * np.cos(g[k] - g[j]) * np.cos(g[24] - g[k])
                )
    np.testing.assert_allclose(res, expect, rtol=1e-5)


@pytest.mark.parametrize("s", [2, 3, 4])
def test_higher_exponents_oracle(s):
    X = RNG.random((4, 2, 18))
    res = coswiss(X, W("[2][11]").matrix, 0.7, exponent=s)[:, -1]
    g = g_of(18, 0.7)
    expect = np.zeros(4)
    for m in range(4):
        for k in range(18):
            for j in range(k):
                expect[m] += (
                    X[m, 1, j] * X[m, 0, k] ** 2
                    * np.cos(g[k] - g[j]) ** s
                )
    np.testing.assert_allclose(res, expect, rtol=1e-5)


def test_table_shapes():
    t = coswiss_table(2, 2, total=False)
    assert t.shape == (3, 5)
    assert t[:, 0].sum() == 4  # sum of binomials C(2,k) = 1+2+1
    t = coswiss_table(2, 1, total=True)
    assert t.shape == (4, 7)


def test_dropout_zeroes_indices():
    X = RNG.random((3, 1, 12))
    drop = np.array([[2, 5], [7, 8]])
    res = coswiss(X, W("[1][1]").matrix, 0.5, exponent=1,
                  dropout_indices=drop)
    # manual: same recurrence with tmp zeroed at drop[k] before cumsums
    g = g_of(12, 0.5)
    sw, cw = np.sin(g), np.cos(g)
    table = coswiss_table(2, 1, total=False)
    expect = np.zeros((3, 12))
    for row in table:
        tmp = np.ones((3, 12))
        for k in range(2):
            if k > 0:
                tmp = np.concatenate(
                    [np.zeros((3, 1)), tmp[:, :-1]], axis=1
                )
            tmp = tmp * X[:, 0, :]
            for _ in range(row[2 * k + 1]):
                tmp = tmp * sw
            for _ in range(row[2 * k + 2]):
                tmp = tmp * cw
            tmp[:, drop[k]] = 0.0
            tmp = np.cumsum(tmp, axis=1)
        expect += row[0] * tmp
    np.testing.assert_allclose(res, expect, rtol=1e-12)


def test_coswiss_multi_bit_identical_to_per_word():
    """Cross-word CSE (coswiss_multi) must return BIT-identical streams
    to the per-word kernel for every word, exponent, and total mode —
    sharing may only remove recomputation, never change op order."""
    from fruits_spark.kernels.iss import coswiss_multi
    from fruits_spark.words import of_weight

    Z = RNG.normal(size=(5, 2, 32))
    words = [w.matrix for w in of_weight(3, 2)] + [
        w.matrix for w in of_weight(1, 2)
    ]
    for total in (False, True):
        for s in (1, 2):
            multi = coswiss_multi(Z, words, 0.5, exponent=s, total=total)
            for wi, w in enumerate(words):
                single = coswiss(Z, w, 0.5, exponent=s, total=total)
                assert np.array_equal(multi[wi], single)


def test_coswiss_flat_multi_bit_identical():
    import pandas as pd
    from fruits_spark.kernels.flat import Seg, coswiss_flat, coswiss_flat_multi
    from fruits_spark.kernels.segments import flatten_lists
    from fruits_spark.words import of_weight

    rows = [RNG.integers(0, 20, l).astype(np.float64)
            for l in (5, 12, 1, 30, 8)]
    values, offsets = flatten_lists(pd.Series(rows))
    seg = Seg(offsets)
    words = [w.matrix for w in of_weight(3, 1)] + [
        w.matrix for w in of_weight(1, 1)
    ]
    for total in (False, True):
        for s in (1, 2):
            multi = coswiss_flat_multi(seg, values, words, 0.5,
                                       exponent=s, total=total)
            for wi, w in enumerate(words):
                single = coswiss_flat(seg, values, w, 0.5,
                                      exponent=s, total=total)
                assert np.array_equal(multi[wi], single)


def test_coswiss_multi_duplicate_words_all_filled():
    """Duplicate words (or words identical after dim padding) must each
    receive the shared stream — not silently zero out."""
    from fruits_spark.kernels.iss import coswiss_multi
    import pandas as pd
    from fruits_spark.kernels.flat import Seg, coswiss_flat_multi
    from fruits_spark.kernels.segments import flatten_lists

    Z = RNG.normal(size=(3, 2, 12))
    w = W("[1][2]").matrix
    w_padded = np.array([[1, 0], [0, 1]])  # same letters after padding
    multi = coswiss_multi(Z, [w, w, w_padded], 0.5, exponent=1)
    single = coswiss(Z, w, 0.5, exponent=1)
    for r in multi:
        assert np.array_equal(r, single)

    rows = [RNG.integers(0, 9, l).astype(np.float64) for l in (4, 7)]
    values, offsets = flatten_lists(pd.Series(rows))
    seg = Seg(offsets)
    wf = W("[1][1]").matrix
    mf = coswiss_flat_multi(seg, values, [wf, wf], 0.5, exponent=2,
                            total=True)
    from fruits_spark.kernels.flat import coswiss_flat
    sf = coswiss_flat(seg, values, wf, 0.5, exponent=2, total=True)
    assert np.array_equal(mf[0], sf) and np.array_equal(mf[1], sf)
