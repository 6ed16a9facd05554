"""The bench harness's scaling-evidence statistics (bench.py) — the
artifact the driver records; its selection logic is pinned here so a
refactor can't silently change what 'efficiency' means."""

import sys

sys.path.insert(0, "/root/repo")

import bench as B


def test_ratio_iqr():
    assert B.ratio_iqr([3.0, 3.1, 3.2, 3.3]) == 3.3 - 3.1
    assert B.ratio_iqr([3.0]) == 0.0
    # the round-3 artifact's spread (2.88-3.86) must NOT satisfy the
    # <=0.15 retry criterion
    assert B.ratio_iqr([2.88, 2.93, 3.05, 3.48, 3.86]) > 0.15


def test_quiet_pairs_exclude_loaded_windows():
    # two quiet pairs at ~3.8, one pair whose small run was hit 2x by
    # external load (ratio inflated to 7.6): the loaded pair must not
    # move the median
    pairs = [
        (3.8, 10.0, 2.63),
        (7.6, 20.0, 2.63),   # small run hit: 20 > 1.25 * 10
        (3.84, 10.1, 2.63),
    ]
    eff, n_quiet = B.scaling_efficiency(pairs)
    assert n_quiet == 2
    assert abs(eff - (3.8 + 3.84) / 2 / 4) < 1e-9


def test_quiet_filter_is_symmetric():
    # a pair whose BIG run was hit (deflating the ratio) is excluded too
    pairs = [
        (3.8, 10.0, 2.63),
        (2.0, 10.0, 5.0),    # big run hit: 5.0 > 1.25 * 2.63
        (3.9, 10.2, 2.62),
    ]
    eff, n_quiet = B.scaling_efficiency(pairs)
    assert n_quiet == 2
    assert abs(eff - (3.8 + 3.9) / 2 / 4) < 1e-9


def test_quiet_fallback_to_all_pairs():
    # alternating load on both configs -> <2 quiet pairs -> median of all
    pairs = [
        (2.0, 20.0, 10.0),
        (8.0, 10.0, 1.25),
    ]
    eff, n_quiet = B.scaling_efficiency(pairs)
    assert n_quiet < 2
    assert abs(eff - (2.0 + 8.0) / 2 / 4) < 1e-9


def test_single_pair():
    eff, n_quiet = B.scaling_efficiency([(3.6, 10.0, 2.78)])
    assert n_quiet == 1
    assert abs(eff - 0.9) < 1e-9
