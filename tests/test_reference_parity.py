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


# ---------------------------------------------------------------------------
# systematic sweeps (round 3): semiring x mode x word matrix, and live
# preparateur parity (fitted params extracted from the reference object
# and fed to our kernels — proves TRANSFORM semantics for arbitrary
# params, independent of RNG draw order)
# ---------------------------------------------------------------------------

MATRIX_WORDS = [
    "[1]", "[22]", "[12]", "[1][2]", "[11][2]",
    "[112][2]", "[1][1][2]", "[2][21][1]", "[(-1)][2]",
]


@pytest.mark.parametrize("mode", ["single", "extended"])
@pytest.mark.parametrize("semiring", ["reals", "arctic", "bayesian"])
@pytest.mark.parametrize("word", MATRIX_WORDS)
def test_iss_matrix_parity(word, semiring, mode):
    ref_sr = {
        "reals": fruits.iss.semiring.Reals(),
        "arctic": fruits.iss.semiring.Arctic(),
        "bayesian": fruits.iss.semiring.Bayesian(),
    }[semiring]
    ref = fruits.ISS(
        [fruits.words.SimpleWord(word)],
        mode=(fruits.ISSMode.EXTENDED if mode == "extended"
              else fruits.ISSMode.SINGLE),
        semiring=ref_sr,
    ).fit_transform(X)
    depth = word.count("[")
    ext = depth if mode == "extended" else 1
    mine = iss(X, W(word).matrix, extended=ext, semiring=semiring)
    np.testing.assert_allclose(np.swapaxes(ref, 0, 1), mine, rtol=1e-12)


def _prep_cases():
    """(name, reference preparateur factory, our-kernel closure) — the
    closure receives the FITTED reference object so fitted params
    (kernels, quantiles, strip layouts) come from the reference
    itself."""
    from fruits_spark.kernels import prep as P

    k = np.array([0.3, -1.2, 0.45])
    return [
        ("inc", lambda: fruits.preparation.INC(), lambda o, x: P.inc(x)),
        ("inc_nopad", lambda: fruits.preparation.INC(zero_padding=False),
         lambda o, x: P.inc(x, zero_padding=False)),
        ("std", lambda: fruits.preparation.STD(), lambda o, x: P.std(x)),
        ("nrm", lambda: fruits.preparation.NRM(), lambda o, x: P.nrm(x)),
        ("nrm_dim", lambda: fruits.preparation.NRM(scale_dim=True),
         lambda o, x: P.nrm(x, scale_dim=True)),
        ("mav2", lambda: fruits.preparation.MAV(2), lambda o, x: P.mav(x, 2)),
        ("mav_frac", lambda: fruits.preparation.MAV(0.6),
         lambda o, x: P.mav(x, int(0.6 * x.shape[-1]))),
        ("lag", lambda: fruits.preparation.LAG(), lambda o, x: P.lag(x)),
        ("cts", lambda: fruits.preparation.CTS(3), lambda o, x: P.cts(x, 3)),
        ("spe", lambda: fruits.preparation.SPE(0.7),
         lambda o, x: P.spe(x, 0.7)),
        ("rpe", lambda: fruits.preparation.RPE(0.5),
         lambda o, x: P.rpe(x, 0.5)),
        ("rin", lambda: fruits.preparation.RIN(
            kernel=np.tile(k[::-1], (2, 1))),
         lambda o, x: P.rin(x, k)),
        ("jld", lambda: fruits.preparation.JLD(5),
         lambda o, x: P.jld(x, np.asarray(o._kernel).reshape(5, 2))),
        ("ffn", lambda: fruits.preparation.FFN(3, d_hidden=6),
         lambda o, x: P.ffn(x, o._weights1, o._biases, o._weights2,
                            np.zeros(3))),
        ("qtc", lambda: fruits.preparation.QTC(0.3),
         lambda o, x: P.qtc(x, o._quantile)),
        ("qtc_lower_bound", lambda: fruits.preparation.QTC(
            0.7, lower=True, bound=9.0),
         lambda o, x: P.qtc(x, o._quantile, lower=True, bound=9.0)),
        ("dil", lambda: fruits.preparation.DIL(),
         lambda o, x: P.dil(x, np.asarray(o._indices),
                            np.asarray(o._lengths))),
        ("pdd", lambda: fruits.preparation.PDD(),
         lambda o, x: P.pdd(x, np.asarray(o._indices), o._width)),
        ("win", lambda: fruits.preparation.WIN(0.2, 0.8),
         lambda o, x: P.win_filter(x, 0.2, 0.8)),
        ("dot", lambda: fruits.preparation.DOT(0.3),
         lambda o, x: P.dot_filter(x, int(0.3 * x.shape[-1]))),
    ]


@pytest.mark.parametrize(
    "name,mk_ref,mine_fn", _prep_cases(),
    ids=[c[0] for c in _prep_cases()],
)
def test_prep_parity_live(name, mk_ref, mine_fn):
    np.random.seed(1234)  # reference preps draw from the global RNG
    Xp = RNG.random((4, 2, 19)) * 6 - 3
    obj = mk_ref()
    ref = obj.fit(Xp) or obj.transform(Xp)
    mine = mine_fn(obj, Xp)
    # rin/jld/ffn accumulate in a different order (einsum/tensordot vs
    # the reference's sequential loop): 1e-12 relative; all others are
    # bit-identical and the zero tolerance enforces it
    if name in ("rin", "jld", "ffn"):
        np.testing.assert_allclose(ref, mine, rtol=1e-12, atol=1e-12)
    else:
        np.testing.assert_array_equal(ref, mine)


def test_rdw_parity_live_positive_base():
    """RDW exponents on positive data (fractional powers of negatives
    are NaN in both engines — positive input isolates the semantics)."""
    from fruits_spark.kernels import prep as P

    np.random.seed(77)
    Xp = RNG.random((4, 3, 19)) + 0.1
    o = fruits.preparation.RDW()
    o.fit(Xp)
    np.testing.assert_array_equal(
        o.transform(Xp), P.rdw(Xp, np.asarray(o._weights))
    )


def test_sieves_bitwise_extended():
    """CUR / AVG / STD (reference CUR-bug semantics behind
    faithful=True) / MPI / XPI with inc, plus PPV / CPV in constant,
    fitted (threshold extracted from the reference object) and
    segments forms."""
    from fruits_spark.kernels import sieve as S

    stream = RNG.random((6, 25)) * 10 - 5
    inf = np.array([-np.inf, np.inf])
    qz = np.array([0.0, np.inf])
    cuts = S.resolve_cuts(stream, [-1, 0.5, 9], "L2")

    for ref_obj, mine in [
        (fruits.sieving.CUR(cut=[-1, 0.5, 9]),
         lambda: S.sieve_cur(stream, cuts, inf)),
        (fruits.sieving.AVG(cut=[-1, 0.5, 9]),
         lambda: S.sieve_avg(stream, cuts, inf, faithful=True)),
        (fruits.sieving.STD(cut=[-1, 0.5, 9]),
         lambda: S.sieve_std(stream, cuts, inf, faithful=True)),
        (fruits.sieving.MPI(cut=[-1, 10], inc=2),
         lambda: S.sieve_mpi(stream, [-1, 10], qz, inc=2, source=stream)),
        (fruits.sieving.XPI(cut=[-1, 10], inc=1),
         lambda: S.sieve_xpi(stream, [-1, 10], qz, inc=1, source=stream)),
        (fruits.sieving.PPV(quantile=[0.3, 2.0], constant=True),
         lambda: S.sieve_ppv(stream, [0.3, 2.0])),
        (fruits.sieving.CPV(quantile=[0.2, 0.6, 3.0], constant=True),
         lambda: S.sieve_cpv(stream, [0.2, 0.6, 3.0])),
    ]:
        np.testing.assert_allclose(
            ref_obj.fit_transform(stream), mine(), rtol=1e-12
        )

    # fitted (probability -> value at fit) and segments forms: feed the
    # reference's own fitted threshold(s) to our kernel
    for cls, kw in [
        (fruits.sieving.PPV, dict(quantile=0.4, constant=False)),
        (fruits.sieving.PPV,
         dict(quantile=[0.2, 0.5, 0.9], constant=False, segments=True)),
        (fruits.sieving.CPV,
         dict(quantile=[0.2, 0.5, 0.9], constant=False, segments=True)),
    ]:
        o = cls(**kw)
        o.fit(stream)
        fn = S.sieve_ppv if cls is fruits.sieving.PPV else S.sieve_cpv
        np.testing.assert_allclose(
            o.transform(stream),
            fn(stream, list(np.atleast_1d(o._q)),
               segments=kw.get("segments", False)),
            rtol=1e-12,
        )


def test_fruit_end_to_end_parity():
    """Capstone: whole reference Fruits (preps + ISS + sieves, multi
    slice, reals AND arctic) vs our engine's block executor — feature
    matrices match column-for-column in the reference's own order."""
    from fruits_spark.engine.executor import compute_features_block
    from fruits_spark.plan import ISSSpec, Prep, Sieve, Slice, FruitPlan
    from fruits_spark.words import of_weight

    Xf = np.random.default_rng(123).random((7, 3, 30)) * 4 - 2

    f1 = fruits.Fruit("par1")
    f1.add(fruits.preparation.INC)
    f1.add(fruits.ISS(
        list(fruits.words.of_weight(2, dim=3)),
        mode=fruits.ISSMode.EXTENDED,
    ))
    f1.add(fruits.sieving.END)
    f1.add(fruits.sieving.MAX)
    f1.fit(Xf)
    plan1 = FruitPlan((
        Slice(preps=(Prep("inc"),),
              iss=ISSSpec(tuple(of_weight(2, 3)), mode="extended"),
              sieves=(Sieve("end"), Sieve("max"))),
    ))
    np.testing.assert_allclose(
        f1.transform(Xf), compute_features_block(Xf, plan1), rtol=1e-12
    )

    X2 = Xf[:, :2, :]
    f2 = fruits.Fruit("par2")
    f2.add(fruits.preparation.STD)
    f2.add(fruits.ISS(
        [fruits.words.SimpleWord("[11][2]"), fruits.words.SimpleWord("[1][2]")],
        mode=fruits.ISSMode.EXTENDED,
    ))
    f2.add(fruits.sieving.END)
    f2.add(fruits.sieving.PPV(quantile=0.0, constant=True))
    f2.cut()
    f2.add(fruits.preparation.INC)
    f2.add(fruits.ISS([fruits.words.SimpleWord("[1][1]")],
                      semiring=fruits.iss.semiring.Arctic()))
    f2.add(fruits.sieving.END)
    f2.add(fruits.sieving.MAX)
    f2.fit(X2)
    plan2 = FruitPlan((
        Slice(preps=(Prep("std"),),
              iss=ISSSpec((W("[11][2]"), W("[1][2]")), mode="extended"),
              sieves=(Sieve("end"),
                      Sieve("ppv", {"quantiles": [0.0], "constant": [True]}))),
        Slice(preps=(Prep("inc"),),
              iss=ISSSpec((W("[1][1]"),), semiring="arctic"),
              sieves=(Sieve("end"), Sieve("max"))),
    ))
    np.testing.assert_allclose(
        f2.transform(X2), compute_features_block(X2, plan2), rtol=1e-12
    )
