"""Direct cross-checks against the actual reference library (imported
with a pass-through numba stub).  Skipped when /root/reference is not
available (e.g. CI outside the sandbox)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)

if "numba" not in sys.modules:
    numba = types.ModuleType("numba")
    numba.njit = lambda *a, **k: (lambda f: f)
    numba.prange = range
    sys.modules["numba"] = numba
sys.path.insert(0, REF)

import fruits  # noqa: E402  (the reference library)

from fruits_spark.kernels.iss import (  # noqa: E402
    coswiss,
    indices_lookup,
    iss,
    iss_arctic_argmax,
    l1_lookup,
    l2_lookup,
)
from fruits_spark.words import W  # noqa: E402

RNG = np.random.default_rng(99)
X = RNG.random((5, 2, 20))


def test_arctic_argmax_bitwise():
    ref = fruits.ISS(
        [fruits.words.SimpleWord("[12][1][2]")],
        mode=fruits.ISSMode.EXTENDED,
        semiring=fruits.iss.semiring.Arctic(argmax=True),
    ).fit_transform(X)
    mine = iss_arctic_argmax(X, W("[12][1][2]").matrix)
    np.testing.assert_allclose(np.swapaxes(ref, 0, 1), mine, rtol=1e-12)


def test_coswiss_bitwise():
    ref = fruits.CosWISS(
        [fruits.words.SimpleWord("[1][21]")], [0.7], exponent=3
    ).fit_transform(X)
    mine = coswiss(X, W("[1][21]").matrix, 0.7, exponent=3)
    np.testing.assert_allclose(ref[0], mine, rtol=1e-12)


def test_weighted_l1_total_bitwise():
    w = fruits.words.SimpleWord("[12][1]")
    w.alpha = [0.4, 0.9]
    ref = fruits.ISS(
        [w], weighting=fruits.iss.weighting.L1(scale=1, total=True)
    ).fit_transform(X)
    mine = iss(
        X, W("[12][1]").matrix, extended=1, alpha=np.array([0.4, 0.9]),
        lookup=l1_lookup(X, scale=1.0), total=True,
    )
    np.testing.assert_allclose(ref[0], mine[:, 0, :], rtol=1e-12)


def test_weighted_indices_bitwise():
    w = fruits.words.SimpleWord("[12][1]")
    w.alpha = [0.4, 0.9]
    ref = fruits.ISS(
        [w], weighting=fruits.iss.weighting.Indices(scale=2.5)
    ).fit_transform(X)
    mine = iss(
        X, W("[12][1]").matrix, extended=1, alpha=np.array([0.4, 0.9]),
        lookup=indices_lookup(5, 20, scale=2.5), total=False,
    )
    np.testing.assert_allclose(ref[0], mine[:, 0, :], rtol=1e-12)


def test_bayesian_weighted_l2_bitwise():
    w = fruits.words.SimpleWord("[12][1]")
    w.alpha = [0.4, 0.9]
    ref = fruits.ISS(
        [w], semiring=fruits.iss.semiring.Bayesian(),
        weighting=fruits.iss.weighting.L2(scale=1.0),
    ).fit_transform(X)
    mine = iss(
        X, W("[12][1]").matrix, extended=1, semiring="bayesian",
        alpha=np.array([0.4, 0.9]), lookup=l2_lookup(X, scale=1.0),
        total=False,
    )
    np.testing.assert_allclose(ref[0], mine[:, 0, :], rtol=1e-12)


def test_extended_multiword_bitwise():
    words = [
        fruits.words.SimpleWord(s)
        for s in ("[1][11]", "[1][11][2]", "[22][1]")
    ]
    ref = fruits.ISS(words, mode=fruits.ISSMode.EXTENDED).fit_transform(X)
    from fruits_spark.words import PrefixPlan

    plan = PrefixPlan([W("[1][11]"), W("[1][11][2]"), W("[22][1]")])
    outs = []
    for i, w in enumerate(plan.words):
        d = plan.depth(i)
        outs.append(iss(X, w.matrix, extended=d))
    mine = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.swapaxes(ref, 0, 1), mine, rtol=1e-12)


def test_sieves_bitwise():
    from fruits_spark.kernels import sieve as S

    stream = RNG.random((6, 25)) * 10 - 5
    for refsieve, mine_fn in [
        (fruits.sieving.MAX(cut=[-1, 0.5, 7]), "max"),
        (fruits.sieving.MIN(cut=[-1, 0.5, 7]), "min"),
        (fruits.sieving.END(cut=[0.3, -1]), "end"),
        (fruits.sieving.NPI(cut=[-1, 10]), "npi"),
        (fruits.sieving.LPI(), "lpi"),
    ]:
        ref = refsieve.fit_transform(stream)
        cuts_spec = list(refsieve._cut)
        cuts = S.resolve_cuts(stream, cuts_spec, "L2")
        if mine_fn == "end":
            mine = S.sieve_end(stream, cuts)
        elif mine_fn in ("max", "min"):
            fn = S.sieve_max if mine_fn == "max" else S.sieve_min
            mine = fn(stream, cuts, np.array([-np.inf, np.inf]))
        else:
            fn = S.sieve_npi if mine_fn == "npi" else S.sieve_lpi
            mine = fn(stream, cuts_spec, np.array([0.0, np.inf]),
                      source=stream)
        np.testing.assert_allclose(ref, mine, rtol=1e-12)
