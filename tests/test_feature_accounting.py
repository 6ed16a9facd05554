"""Plan-level feature accounting parity with the reference's published
experiment pipelines (BASELINE.md: fruit_general=20167,
fruit_reduced=4431, fruit_twi=1725)."""

from fruits_spark.plan import CosWISSSpec, ISSSpec, Prep, Sieve, Slice, FruitPlan
from fruits_spark.words import W, alternate_sign, of_weight

SIEVES_7 = (
    Sieve("npi", {"q": (0.5, 1.0), "inc": 0}),
    Sieve("npi", {"q": (0.5, 1.0), "inc": 1}),
    Sieve("npi", {"q": (0.5, 1.0), "inc": 2}),
    Sieve("mpi", {"q": (0.5, 1.0), "inc": 0}),
    Sieve("mpi", {"q": (0.5, 1.0), "inc": 1}),
    Sieve("mpi", {"q": (0.5, 1.0), "inc": 2}),
    Sieve("end"),
)


def arctic_words(n: int):
    return alternate_sign(
        [
            W("[1]" * n),
            W("[2]" * n),
            W("[1][2]" * (n // 2)),
            W("[2][1]" * (n // 2)),
        ]
    )


def test_fruit_general_feature_count():
    # experiments/fruit_general.py:1-75; executed count = 20167
    cos_words = tuple(
        w for k in range(1, 5) for w in of_weight(k, 2)
    )
    slices = [
        Slice(
            preps=(Prep("new", {"prep": Prep("inc")}), Prep("std")),
            iss=ISSSpec(
                of_weight(6, 2), mode="extended", weighting="indices"
            ),
            sieves=SIEVES_7,
        ),
        Slice(
            preps=(Prep("new", {"prep": Prep("inc")}),),
            iss=ISSSpec(
                tuple(arctic_words(48)), mode="extended", semiring="arctic"
            ),
            sieves=SIEVES_7,
        ),
    ]
    for e in (1, 2):
        slices.append(
            Slice(
                preps=(Prep("new", {"prep": Prep("inc")}), Prep("std")),
                iss=CosWISSSpec(
                    cos_words,
                    tuple(i / 20 for i in range(1, 11, 2)),
                    exponent=e,
                    total=True,
                ),
                sieves=SIEVES_7,
            )
        )
    fplan = FruitPlan(tuple(slices))
    streams = [s.n_streams() for s in fplan.slices]
    assert streams == [1351, 380, 575, 575]
    assert fplan.n_features() == 20167


def test_fruit_reduced_feature_count():
    # experiments/fruit_reduced.py (of_weight(4,2) variant) = 4431
    cos_words = tuple(
        w for k in range(1, 4) for w in of_weight(k, 2)
    )
    slices = [
        Slice(
            preps=(Prep("new", {"prep": Prep("inc")}), Prep("std")),
            iss=ISSSpec(
                of_weight(4, 2), mode="extended", weighting="indices"
            ),
            sieves=SIEVES_7,
        ),
        Slice(
            preps=(Prep("new", {"prep": Prep("inc")}),),
            iss=ISSSpec(
                tuple(arctic_words(24)), mode="extended", semiring="arctic"
            ),
            sieves=SIEVES_7,
        ),
    ]
    for e in (1, 2):
        slices.append(
            Slice(
                preps=(Prep("new", {"prep": Prep("inc")}), Prep("std")),
                iss=CosWISSSpec(
                    cos_words,
                    tuple(i / 20 for i in range(1, 11, 2)),
                    exponent=e,
                    total=True,
                ),
                sieves=SIEVES_7,
            )
        )
    fplan = FruitPlan(tuple(slices))
    streams = [s.n_streams() for s in fplan.slices]
    assert fplan.n_features() == sum(s * 7 for s in streams)
    assert streams == [115, 188, 165, 165]
    assert fplan.n_features() == 4431
