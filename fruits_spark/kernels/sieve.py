"""Feature sieves: reduce an ISS stream batch ``(n, l)`` to scalars.

Semantics per the reference (`/root/reference/fruits/sieving/segment.py`,
``increment.py``, ``implicit.py``): each sieve is evaluated per
(cut-segment x quantile-band).  A *cut* is an int index (negative counts
from the end, -1 == full length) or a float in [0,1] -> per-series
"coquantile" index of accumulated increment mass.  Bands ``(q_k, q_{k+1}]``
filter the values inside a segment.

Implementation is mask-based and vectorized across the batch: for each
(segment, band) pair we build one boolean ``(n, l)`` mask and reduce along
time — no per-series Python.

Deviations from the reference, both documented:
  * empty (segment ∩ band) selections return 0.0 — the reference's numba
    ``np.max``/``np.min`` on an empty slice is undefined behavior its own
    tests never hit (segment.py:135-139).
  * the reference's AVG and STD sieves accidentally call ``CUR._backend``
    (segment.py:309, 352).  ``faithful=True`` (default) reproduces that
    quirk bit-for-bit; ``faithful=False`` computes the true mean/std.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from .iss import coquantile, increments

CutSpec = Union[int, float]


def resolve_cuts(
    X: np.ndarray,
    cuts: Sequence[CutSpec],
    norm: str = "L2",
    source: np.ndarray | None = None,
) -> np.ndarray:
    """Turn cut specs into a sorted ``(n, len(cuts)+1)`` int index matrix
    with a leading 0 column (segment.py:51-64).

    ``source`` (if given) is the series the coquantile mass is computed
    on — the reference computes coquantiles on the *cache input* (the
    prepared series), not on the sieved stream.
    """
    base = source if source is not None else X
    if base.ndim == 2:
        base = base[:, np.newaxis, :]
    n, length = X.shape
    out = np.zeros((n, len(cuts) + 1), dtype=np.int64)
    for i, c in enumerate(cuts):
        if isinstance(c, float):
            out[:, i + 1] = coquantile(base, c, norm)
        else:
            out[:, i + 1] = c if c >= 0 else length + c + 1
    out.sort(axis=1)
    return out


def resolve_quantiles(
    X_fit: np.ndarray | None, q: Sequence[float]
) -> np.ndarray:
    """Map band probabilities to values: 1 -> +inf, -1 -> -inf, 0 -> 0,
    else the dataset-level quantile of the fit sample's stream values
    (segment.py:66-85)."""
    out = np.zeros(len(q))
    for i, p in enumerate(q):
        if p == 1.0:
            out[i] = np.inf
        elif p == -1.0:
            out[i] = -np.inf
        elif p != 0:
            if X_fit is None:
                raise ValueError("non-trivial band requires a fit sample")
            out[i] = np.quantile(X_fit, p)
    out.sort()
    return out


def _segment_band_masks(X: np.ndarray, cuts: np.ndarray, quantiles: np.ndarray):
    """Yield (j, k, mask) for every segment x band, mask shape (n, l)."""
    n, length = X.shape
    idx = np.arange(length)[np.newaxis, :]
    for j in range(cuts.shape[1] - 1):
        seg = (idx >= cuts[:, j:j + 1]) & (idx < cuts[:, j + 1:j + 2])
        for k in range(len(quantiles) - 1):
            band = (quantiles[k] < X) & (X <= quantiles[k + 1])
            yield j, k, seg & band


def _alloc(X, cuts, quantiles):
    return np.zeros((X.shape[0], (cuts.shape[1] - 1) * (len(quantiles) - 1)))


def sieve_max(X: np.ndarray, cuts: np.ndarray, quantiles: np.ndarray):
    out = _alloc(X, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(X, cuts, quantiles):
        vals = np.where(m, X, -np.inf).max(axis=-1)
        empty = ~m.any(axis=-1)
        out[:, j * nb + k] = np.where(empty, 0.0, vals)
    return out


def sieve_min(X: np.ndarray, cuts: np.ndarray, quantiles: np.ndarray):
    out = _alloc(X, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(X, cuts, quantiles):
        vals = np.where(m, X, np.inf).min(axis=-1)
        empty = ~m.any(axis=-1)
        out[:, j * nb + k] = np.where(empty, 0.0, vals)
    return out


def sieve_end(X: np.ndarray, cuts: np.ndarray):
    """Value at each cut index - 1 (segment.py:203-219); no bands."""
    out = np.zeros((X.shape[0], cuts.shape[1] - 1))
    rows = np.arange(X.shape[0])
    for j in range(cuts.shape[1] - 1):
        out[:, j] = X[rows, cuts[:, j + 1] - 1]
    return out


def sieve_cur(X: np.ndarray, cuts: np.ndarray, quantiles: np.ndarray):
    """Sum of squared band-filtered 2nd-order increments
    (segment.py:228-260).  Note: the band filters X_inc, not X."""
    X_inc = increments(increments(X[:, np.newaxis, :], 1), 1)[:, 0, :]
    out = _alloc(X, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(X_inc, cuts, quantiles):
        out[:, j * nb + k] = np.where(m, X_inc * X_inc, 0.0).sum(axis=-1)
    return out


def sieve_avg(X, cuts, quantiles, faithful: bool = True):
    if faithful:  # reference quirk: AVG._transform calls CUR._backend
        return sieve_cur(X, cuts, quantiles)
    out = _alloc(X, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(X, cuts, quantiles):
        cnt = m.sum(axis=-1)
        s = np.where(m, X, 0.0).sum(axis=-1)
        out[:, j * nb + k] = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return out


def sieve_std(X, cuts, quantiles, faithful: bool = True):
    if faithful:  # reference quirk: STD._transform calls CUR._backend
        return sieve_cur(X, cuts, quantiles)
    out = _alloc(X, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(X, cuts, quantiles):
        cnt = np.maximum(m.sum(axis=-1), 1)
        mu = np.where(m, X, 0.0).sum(axis=-1) / cnt
        var = np.where(m, (X - mu[:, None]) ** 2, 0.0).sum(axis=-1) / cnt
        out[:, j * nb + k] = np.sqrt(var)
    return out


# --- increment sieves (increment.py) ---------------------------------------

def _pre_inc(X: np.ndarray, inc: int) -> np.ndarray:
    """inc>0: inc-fold increments; inc<0: |inc|-fold cumulative sums
    (increment.py:63-71)."""
    arr = X.astype(np.float64, copy=True)
    if inc > 0:
        for _ in range(inc):
            arr = increments(arr[:, np.newaxis, :], 1)[:, 0, :]
    elif inc < 0:
        for _ in range(-inc):
            arr = np.cumsum(arr, axis=1)
    return arr


def sieve_npi(X, cuts, quantiles, inc: int = 1, source=None, norm="L2"):
    """Count of increment values inside each band (increment.py:101-129).
    ``cuts`` here are raw specs if a list, else a resolved matrix."""
    arr = _pre_inc(X, inc)
    if not isinstance(cuts, np.ndarray):
        cuts = resolve_cuts(arr, cuts, norm, source)
    out = _alloc(arr, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(arr, cuts, quantiles):
        out[:, j * nb + k] = m.sum(axis=-1)
    return out


def sieve_mpi(X, cuts, quantiles, inc: int = 1, source=None, norm="L2"):
    """Mean of banded increments; 0 if empty (increment.py:132-163)."""
    arr = _pre_inc(X, inc)
    if not isinstance(cuts, np.ndarray):
        cuts = resolve_cuts(arr, cuts, norm, source)
    out = _alloc(arr, cuts, quantiles)
    nb = len(quantiles) - 1
    for j, k, m in _segment_band_masks(arr, cuts, quantiles):
        cnt = m.sum(axis=-1)
        s = np.where(m, arr, 0.0).sum(axis=-1)
        out[:, j * nb + k] = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return out


def sieve_xpi(X, cuts, quantiles, inc: int = 1, source=None, norm="L2"):
    """Mean *in-segment index* of banded increments (increment.py:166-198).
    Indices are relative to the segment start, as in the reference's
    per-slice ``np.where``."""
    arr = _pre_inc(X, inc)
    if not isinstance(cuts, np.ndarray):
        cuts = resolve_cuts(arr, cuts, norm, source)
    out = _alloc(arr, cuts, quantiles)
    nb = len(quantiles) - 1
    idx = np.arange(arr.shape[1])[np.newaxis, :]
    for j, k, m in _segment_band_masks(arr, cuts, quantiles):
        rel = idx - cuts[:, j:j + 1]
        cnt = m.sum(axis=-1)
        s = np.where(m, rel, 0).sum(axis=-1)
        out[:, j * nb + k] = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return out


def sieve_lpi(X, cuts, quantiles, inc: int = 1, source=None, norm="L2"):
    """Longest run of banded increments (increment.py:201-239).
    Vectorized run-length: within the mask, run(t) = t - last index where
    the mask was False."""
    arr = _pre_inc(X, inc)
    if not isinstance(cuts, np.ndarray):
        cuts = resolve_cuts(arr, cuts, norm, source)
    out = _alloc(arr, cuts, quantiles)
    nb = len(quantiles) - 1
    n, length = arr.shape
    idx = np.arange(length)[np.newaxis, :]
    for j, k, m in _segment_band_masks(arr, cuts, quantiles):
        last_false = np.maximum.accumulate(np.where(~m, idx, -1), axis=-1)
        runs = np.where(m, idx - last_false, 0)
        out[:, j * nb + k] = runs.max(axis=-1)
    return out


# --- implicit sieves (implicit.py) ------------------------------------------

def sieve_ppv(
    X: np.ndarray, quantiles: Sequence[float], segments: bool = False
) -> np.ndarray:
    """Proportion of values >= q (or within adjacent quantile pairs when
    ``segments``) (implicit.py:114-129).  ``quantiles`` are *values* —
    probability->value resolution happens at fit time."""
    n, length = X.shape
    qs = list(quantiles)
    if segments:
        out = np.zeros((n, len(qs) - 1))
        for j in range(1, len(qs)):
            out[:, j - 1] = (
                ((qs[j - 1] <= X) & (X < qs[j])).sum(axis=1) / length
            )
        return out
    out = np.zeros((n, len(qs)))
    for j, q in enumerate(qs):
        out[:, j] = (X >= q).sum(axis=1) / length
    return out


def sieve_cpv(
    X: np.ndarray, quantiles: Sequence[float], segments: bool = False
) -> np.ndarray:
    """Proportion of connected components above quantile: 2 * (#rising
    edges of the indicator) / n_even (implicit.py:169-190)."""
    n, length = X.shape
    n_even = length + (length % 2)
    qs = list(quantiles)
    if segments:
        out = np.zeros((n, len(qs) - 1))
        for j in range(1, len(qs)):
            ind = ((qs[j - 1] <= X) & (X < qs[j])).astype(np.float64)
            d = increments(ind[:, np.newaxis, :], 1)[:, 0, :]
            out[:, j - 1] = 2 * (d == 1).sum(axis=1) / n_even
        return out
    out = np.zeros((n, len(qs)))
    for j, q in enumerate(qs):
        ind = (X >= q).astype(np.float64)
        d = increments(ind[:, np.newaxis, :], 1)[:, 0, :]
        out[:, j] = 2 * (d == 1).sum(axis=1) / n_even
    return out
