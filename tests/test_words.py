"""Word algebra tests (reference parity: tests/signature/test_simple.py:54-57,
test_simple.py:60-70, test_cache.py:11-26)."""

import numpy as np

from fruits_spark.words import (
    PrefixPlan,
    W,
    alternate_sign,
    of_weight,
    parse_word,
    word_string,
)


def test_parse_simple():
    np.testing.assert_array_equal(parse_word("[11]"), [[2]])
    np.testing.assert_array_equal(parse_word("[12][122]"), [[1, 1], [1, 2]])
    np.testing.assert_array_equal(parse_word("[1][2]"), [[1, 0], [0, 1]])


def test_parse_permutation_invariance():
    # reference: SimpleWord("[12][122]") == SimpleWord("[21][212]")
    np.testing.assert_array_equal(parse_word("[12][122]"), parse_word("[21][212]"))


def test_parse_negative_and_multidigit():
    # reference golden: tests/signature/test_simple.py:60-70
    m = parse_word("[-12][-2-21]")
    np.testing.assert_array_equal(m, [[-1, 1], [1, -2]])
    m2 = parse_word("[-12][-2-21][(-11)(-11)(11)][25]")
    expected = np.zeros((4, 11), dtype=int)
    expected[0, :2] = [-1, 1]
    expected[1, :2] = [1, -2]
    expected[2, 10] = -1
    expected[3, 1] = 1
    expected[3, 4] = 1
    np.testing.assert_array_equal(m2, expected)


def test_word_string_roundtrip():
    for s in ["[11]", "[12][122]", "[1][2][1]", "[-1-12]"]:
        assert word_string(parse_word(s)) == word_string(
            parse_word(word_string(parse_word(s)))
        )


def test_of_weight_counts():
    # reference: test_simple.py:54-57 and BASELINE.md word-set sizes
    for n in range(1, 7):
        assert len(of_weight(n, dim=1)) == 2 ** (n - 1)
    assert len(of_weight(4, dim=2)) == 82
    assert len(of_weight(6, dim=2)) == 956
    # all distinct
    ws = of_weight(4, 2)
    assert len({w.letters() for w in ws}) == 82


def test_alternate_sign():
    out = alternate_sign([W("[12][1]")])
    assert len(out) == 2
    assert out[0].letters() == ((-1, -1), (1,))
    assert out[1].letters() == ((1, 1), (-1,))


def test_prefix_plan_reference_golden():
    # reference: tests/signature/test_cache.py:11-26
    words = [
        W("[1][11][3][11]"),
        W("[11][13][11][1][3]"),
        W("[1][13][1]"),
        W("[11][13][111][13][11]"),
        W("[3][11][111]"),
        W("[1][11][2]"),
        W("[11][2]"),
        W("[11][13][111][13][2]"),
        W("[3][11][1112][21]"),
    ]
    plan = PrefixPlan(words)
    assert [plan.depth(i) for i in range(len(words))] == [
        4, 5, 2, 3, 3, 1, 1, 1, 2,
    ]
    assert plan.n_streams() == 22
    labels = plan.labels()
    assert len(labels) == 22
    assert labels[0] == "[1]"
    assert labels[3] == "[1][11][3][11]"
