"""Sieve kernel tests — golden values ported from the reference
(tests/sieving/test_explicit.py, test_implicit.py).  The 2-D fixture rows
are the reference's ``X_1[0]`` / ``X_1[1]`` slices (2-D input promotes
each dimension to its own univariate series)."""

import numpy as np
import pytest

from fruits_spark.kernels import sieve as S

A = np.array([[-4.0, 0.8, 0.0, 5.0, -3.0], [2.0, 1.0, 0.0, 0.0, -7.0]])
B = np.array([[5.0, 8.0, 2.0, 6.0, 0.0], [-5.0, -1.0, -4.0, -0.5, -8.0]])
Q_FULL = np.array([-np.inf, np.inf])


def cuts(X, spec):
    return S.resolve_cuts(X, spec, "L2")


def test_max_goldens():
    np.testing.assert_allclose(
        S.sieve_max(A, cuts(A, [-1]), Q_FULL), [[5], [2]]
    )
    np.testing.assert_allclose(
        S.sieve_max(A, cuts(A, [3]), Q_FULL), [[0.8], [2]]
    )
    np.testing.assert_allclose(
        S.sieve_max(A, cuts(A, [0.5]), Q_FULL), [[5], [2]]
    )
    np.testing.assert_allclose(
        S.sieve_max(A, cuts(A, [-1, 3, 1]), Q_FULL),
        [[-4, 0.8, 5], [2, 1, 0]],
    )
    np.testing.assert_allclose(
        S.sieve_max(A, cuts(A, [-1, 0.2, 0.7, 0.5]), Q_FULL),
        [[-4, 5, 0, -3], [2, 0, 0, -7]],
    )


def test_min_goldens():
    np.testing.assert_allclose(
        S.sieve_min(B, cuts(B, [-1]), Q_FULL), [[0], [-8]]
    )
    np.testing.assert_allclose(
        S.sieve_min(A, cuts(A, [3]), Q_FULL), [[-4], [0]]
    )
    np.testing.assert_allclose(
        S.sieve_min(B, cuts(B, [0.5]), Q_FULL), [[2], [-5]]
    )
    np.testing.assert_allclose(
        S.sieve_min(B, cuts(B, [-1, 3, 1]), Q_FULL),
        [[5, 2, 0], [-5, -4, -8]],
    )
    np.testing.assert_allclose(
        S.sieve_min(B, cuts(B, [-1, 0.2, 0.7, 0.5]), Q_FULL),
        [[5, 2, 6, 0], [-5, -4, 0, -8]],
    )


def test_end_goldens():
    np.testing.assert_allclose(S.sieve_end(A, cuts(A, [-1])), [[-3], [-7]])
    np.testing.assert_allclose(S.sieve_end(A, cuts(A, [0.2])), [[-4], [0]])
    np.testing.assert_allclose(
        S.sieve_end(A, cuts(A, [1, 0.2, 0.8, 4, -1])),
        [[-4, -4, 5, 5, -3], [2, 0, 0, 0, -7]],
    )


Q_POS = np.array([0.0, np.inf])


def test_npi_goldens():
    np.testing.assert_allclose(
        S.sieve_npi(A, [-1], Q_POS), [[2], [0]]
    )
    np.testing.assert_allclose(
        S.sieve_npi(A, [3], Q_POS), [[1], [0]]
    )
    # float cut: coquantile computed on the ORIGINAL series, not increments
    np.testing.assert_allclose(
        S.sieve_npi(B, [0.5], Q_POS, source=B), [[1], [2]]
    )
    np.testing.assert_allclose(
        S.sieve_npi(B, [-1, 3, 1], Q_POS), [[0, 1, 1], [0, 1, 1]]
    )
    np.testing.assert_allclose(
        S.sieve_npi(B, [-1, 0.2, 0.7, 0.5], Q_POS, source=B),
        [[1, 0, 1, 0], [1, 1, 0, 0]],
    )


def test_mpi_goldens():
    np.testing.assert_allclose(S.sieve_mpi(A, [-1], Q_POS), [[4.9], [0]])
    np.testing.assert_allclose(S.sieve_mpi(B, [-1], Q_POS), [[3.5], [3.75]])


def test_xpi_goldens():
    np.testing.assert_allclose(S.sieve_xpi(A, [-1], Q_POS), [[2], [0]])
    np.testing.assert_allclose(S.sieve_xpi(B, [-1], Q_POS), [[2], [2]])


def test_lpi_goldens():
    np.testing.assert_allclose(S.sieve_lpi(A, [-1], Q_POS), [[1], [0]])
    np.testing.assert_allclose(S.sieve_lpi(B, [-1], Q_POS), [[1], [1]])


def test_ppv_goldens():
    np.testing.assert_allclose(S.sieve_ppv(A, [0.0]), [[3 / 5], [4 / 5]])
    # PPV(0.5, constant=False) on B: fitted quantile = median of all values
    q = np.quantile(B.flatten(), 0.5)
    np.testing.assert_allclose(S.sieve_ppv(B, [q]), [[1], [0]])
    qs = sorted(np.quantile(B.flatten(), p) for p in [0.5, 0.1, 0.7])
    # non-segments uses input order of quantiles (0.5, 0.1, 0.7)
    q_in = [np.quantile(B.flatten(), p) for p in [0.5, 0.1, 0.7]]
    np.testing.assert_allclose(
        S.sieve_ppv(B, q_in), [[1.0, 1.0, 3 / 5], [0.0, 4 / 5, 0.0]]
    )
    np.testing.assert_allclose(
        S.sieve_ppv(B, qs, segments=True), [[0.0, 2 / 5], [4 / 5, 0.0]]
    )
    np.testing.assert_allclose(
        S.sieve_ppv(B, [-5, 0, 2]), [[1.0, 1.0, 4 / 5], [4 / 5, 0.0, 0.0]]
    )
    np.testing.assert_allclose(
        S.sieve_ppv(B, [-5, 0, 2], segments=True), [[0.0, 1 / 5], [4 / 5, 0.0]]
    )


def test_cpv_golden():
    np.testing.assert_allclose(S.sieve_cpv(A, [0.0]), [[1 / 3], [0.0]])


def test_cur_is_sum_sq_2nd_increments():
    X = np.array([[1.0, 3.0, 2.0, 5.0, 4.0]])
    # increments: [0,2,-1,3,-1]; second pass: [0,2,-3,4,-4]
    out = S.sieve_cur(X, cuts(X, [-1]), Q_FULL)
    np.testing.assert_allclose(out, [[4 + 9 + 16 + 16]])


def test_avg_std_faithful_quirk():
    # reference AVG/STD accidentally call CUR._backend (segment.py:309,352)
    X = np.array([[1.0, 3.0, 2.0, 5.0, 4.0]])
    c, q = cuts(X, [-1]), Q_FULL
    np.testing.assert_allclose(
        S.sieve_avg(X, c, q, faithful=True), S.sieve_cur(X, c, q)
    )
    np.testing.assert_allclose(
        S.sieve_std(X, c, q, faithful=True), S.sieve_cur(X, c, q)
    )
    np.testing.assert_allclose(S.sieve_avg(X, c, q, faithful=False), [[3.0]])
    np.testing.assert_allclose(
        S.sieve_std(X, c, q, faithful=False), [[np.std(X[0])]]
    )


def test_quantile_bands():
    X = np.array([[1.0, 2.0, 3.0, 4.0, 5.0]])
    q = np.array([-np.inf, 2.5, np.inf])
    out = S.sieve_max(X, cuts(X, [-1]), q)
    np.testing.assert_allclose(out, [[2.0, 5.0]])
    out = S.sieve_min(X, cuts(X, [-1]), q)
    np.testing.assert_allclose(out, [[1.0, 3.0]])


def test_resolve_quantiles():
    fit = np.arange(101, dtype=np.float64)
    q = S.resolve_quantiles(fit, [-1.0, 0.5, 1.0])
    assert q[0] == -np.inf and q[2] == np.inf
    assert q[1] == 50.0
