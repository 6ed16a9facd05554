"""UCR .txt / UEA .arff ingestion (reference: corbeille/data.py:150-267)
— tiny fixtures flow end-to-end into extract_features, plus LIVE parity
against the reference loader itself (loaded standalone; scipy is
present in this container, the fruits/numba import of the full
corbeille package is not needed for data.py)."""

import importlib.util
import os

import numpy as np
import pytest

from fruits_spark import datasets as DS
from fruits_spark.plan import ISSSpec, Sieve, Slice, FruitPlan
from fruits_spark.words import W

_REF_DATA = "/root/reference/experiments/corbeille/corbeille/data.py"


def _load_reference_data():
    """Load the reference's data.py standalone.  scipy is absent in
    this container; its arff reader is only touched by the
    multivariate branch, so a module stub satisfies the import and the
    UNIVARIATE branch runs the reference's real code (np.loadtxt +
    replace_nan) untouched."""
    import sys
    import types

    if "scipy" not in sys.modules:
        scipy = types.ModuleType("scipy")
        scipy_io = types.ModuleType("scipy.io")
        arff = types.ModuleType("scipy.io.arff")
        arff.loadarff = None  # multivariate branch unsupported w/o scipy
        scipy_io.arff = arff
        scipy.io = scipy_io
        sys.modules["scipy"] = scipy
        sys.modules["scipy.io"] = scipy_io
        sys.modules["scipy.io.arff"] = arff
    spec = importlib.util.spec_from_file_location("ref_corbeille_data",
                                                  _REF_DATA)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _plan():
    return FruitPlan(
        (Slice(iss=ISSSpec((W("[1]"),)), sieves=(Sieve("end"),)),)
    )


def _write_ucr(tmp_path, name, delim):
    d = tmp_path / name
    d.mkdir()
    rows_train = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [5.0, float("nan"), float("nan"), 2.0]),
    ]
    rows_test = [(1, [0.5, 1.5, 2.5, 3.5])]
    for split, rows in (("TRAIN", rows_train), ("TEST", rows_test)):
        lines = [
            delim.join([str(lb)] + [str(v) for v in series])
            for lb, series in rows
        ]
        (d / f"{name}_{split}.txt").write_text("\n".join(lines) + "\n")
    return str(d)


def test_read_ucr_txt_both_delimiters_and_nan_repair(spark, tmp_path):
    for name, delim in (("DSComma", ","), ("DSSpace", "  ")):
        path = _write_ucr(tmp_path, name, delim)
        splits = DS.read_ucr_dir(spark, path)
        train = sorted(
            splits["train"].collect(), key=lambda r: r["label"]
        )
        assert [r["label"] for r in train] == [1, 2]
        assert list(train[0]["series"]) == [1.0, 2.0, 3.0, 4.0]
        # NaN repair: LOCF (reference replace_nan — consecutive NaNs
        # carry the same value)
        assert list(train[1]["series"]) == [5.0, 5.0, 5.0, 2.0]
        assert train[1]["n_tok"] == 4
        test = splits["test"].collect()
        assert [r["label"] for r in test] == [1]


def test_ucr_leading_nan_repairs_to_zero(spark, tmp_path):
    d = tmp_path / "DSLead"
    d.mkdir()
    (d / "DSLead_TRAIN.txt").write_text("1,NaN,2.0,NaN\n")
    (d / "DSLead_TEST.txt").write_text("1,1.0,1.0,1.0\n")
    got = DS.read_ucr_dir(spark, str(d))["train"].collect()[0]
    assert list(got["series"]) == [0.0, 2.0, 2.0]


def test_ucr_through_extract_features(spark, tmp_path):
    from fruits_spark.engine.executor import extract_features, feature_columns

    path = _write_ucr(tmp_path, "DSFeat", ",")
    df = DS.read_ucr_dir(spark, path)["train"]
    fc = feature_columns(_plan())
    out = extract_features(
        df, _plan(), tokens_col="series", keep=("doc_id", "label", "n_tok")
    )
    got = {r["label"]: r[fc[0]] for r in out.collect()}
    # END([1]) = plain sum of the (repaired) series
    assert got[1] == 10.0
    assert got[2] == 5.0 + 5.0 + 5.0 + 2.0


ARFF = """% tiny UEA-style relational fixture
@relation test
@attribute series relational
  @attribute dim numeric
@end series
@attribute cls {a,b}
@data
'1.0,2.0,3.0\\n10.0,20.0,30.0',b
'4.0,5.0,6.0\\n40.0,50.0,60.0',a
"""

ARFF_TEST = """@relation test
@attribute series relational
  @attribute dim numeric
@end series
@attribute cls {a,b}
@data
'7.0,8.0,9.0\\n70.0,80.0,90.0',a
"""


def test_read_uea_arff_labels_first_appearance(spark, tmp_path):
    f1 = tmp_path / "T_TRAIN.arff"
    f1.write_text(ARFF)
    f2 = tmp_path / "T_TEST.arff"
    f2.write_text(ARFF_TEST)
    train, lmap = DS.read_uea_arff(spark, str(f1))
    # first appearance order across the TRAIN split: b then a
    assert lmap == {"b": 0, "a": 1}
    test, lmap = DS.read_uea_arff(spark, str(f2), label_map=lmap)
    assert lmap == {"b": 0, "a": 1}
    rows = sorted(train.collect(), key=lambda r: r["doc_id"])
    assert rows[0]["label"] == 0 and rows[1]["label"] == 1
    np.testing.assert_array_equal(
        np.array(rows[0]["series"]), [[1.0, 2.0, 3.0], [10.0, 20.0, 30.0]]
    )
    assert rows[0]["n_tok"] == 3
    assert test.collect()[0]["label"] == 1


@pytest.mark.skipif(not os.path.exists(_REF_DATA),
                    reason="reference checkout not present")
def test_ucr_txt_parity_with_reference_loader(spark, tmp_path):
    """Live parity: the reference's load() (np.loadtxt + replace_nan)
    and read_ucr_dir must produce identical (label, repaired series)
    sets on a fixture with NaNs in every tricky position."""
    ref = _load_reference_data()
    fixtures = {
        "ParC": (  # comma-delimited (the reference's sniff picks ',')
            "1,NaN,2.0,NaN,NaN,7.0\n"
            "2,5.0,6.0,7.0,8.0,9.0\n"
            "3,NaN,NaN,NaN,NaN,NaN\n",
            # 2 rows: np.loadtxt returns 1-D for a single row and the
            # reference's [:, 1:] slice crashes on it
            "2,1.0,2.0,3.0,4.0,5.0\n1,0.5,NaN,1.5,2.5,3.5\n",
        ),
        "ParW": (  # whitespace-delimited (sniff falls through to None)
            "1  NaN  2.0  NaN  NaN  7.0\n"
            "2  5.0  6.0  7.0  8.0  9.0\n",
            "2  1.0  2.0  3.0  4.0  5.0\n3  9.0  8.0  7.0  6.0  5.0\n",
        ),
    }
    for name, (train_txt, test_txt) in fixtures.items():
        d = tmp_path / name
        d.mkdir()
        (d / f"{name}_TRAIN.txt").write_text(train_txt)
        (d / f"{name}_TEST.txt").write_text(test_txt)
        Xtr, ytr, Xte, yte = ref.load(str(d), univariate=True, cache=False)
        for split, X, y in (("train", Xtr, ytr), ("test", Xte, yte)):
            want = {
                (int(y[i]), tuple(X[i, 0])) for i in range(len(y))
            }
            got = {
                (r["label"], tuple(r["series"]))
                for r in DS.read_ucr_dir(spark, str(d))[split].collect()
            }
            assert got == want, (name, split)


def test_uea_arff_through_multivariate_extract(spark, tmp_path):
    from fruits_spark.engine.executor import extract_features, feature_columns

    f1 = tmp_path / "M_TRAIN.arff"
    f1.write_text(ARFF)
    df, _ = DS.read_uea_arff(spark, str(f1))
    # word [2] = dimension 2 of the multivariate series (SimpleWord
    # digits are DIMENSIONS)
    fplan = FruitPlan(
        (Slice(iss=ISSSpec((W("[2]"),)), sieves=(Sieve("end"),)),)
    )
    fc = feature_columns(fplan)
    out = extract_features(
        df, fplan, tokens_col="series", keep=("doc_id", "label", "n_tok"),
        multivariate=True,
    )
    got = {r["label"]: r[fc[0]] for r in out.collect()}
    assert got[0] == 60.0   # 10+20+30
    assert got[1] == 150.0  # 40+50+60


def test_uea_arff_size_guard(spark, tmp_path, monkeypatch):
    """Files above the driver-side cap fail fast with a clear message
    instead of OOMing the driver during parse."""
    import pytest

    f1 = tmp_path / "BIG_TRAIN.arff"
    f1.write_text(ARFF)
    monkeypatch.setattr(DS, "ARFF_MAX_BYTES", 10)
    with pytest.raises(ValueError, match="driver-side and capped"):
        DS.read_uea_arff(spark, str(f1))
