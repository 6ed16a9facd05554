"""Band-padded execution: the fastest batch layout for ISS scans.

Rows are grouped into power-of-two length *bands* and padded with zeros
to the band width, giving a regular 2-D ``(n, L)`` block with fill ratio
>= 50%.  Every scan then runs as ONE contiguous ``axis=-1`` NumPy op
(``cumsum`` / ``maximum.accumulate``) — no per-segment carry logic, no
O(log L) doubling passes, and streaming-friendly memory access.

Why padding is safe: every ISS/prep scan is *prefix-local* — the value at
position t depends only on positions <= t — so zero pads after a row's
true length can never contaminate true positions.  The pad tail of a
Reals stream is constant (pad products are 0, cumsum flat) and of an
Arctic stream is the running final max, which lets most sieves run
mask-free over the padded row with an O(n_rows) tail correction:

  * MAX/MIN: tail == final stream value, already attained inside the
    true region -> no correction at all.
  * PPV: count over padded row minus ``(L - len) * (final >= q)``.
  * NPI/MPI/XPI/LPI/CPV on increments: the tail's increments are exactly
    0 (constant tail), so bands excluding 0 need no correction.
  * END / coquantiles: per-row gathers at true indices.

Operators that can't be tail-corrected cheaply (CUR's boundary second
difference, bands containing 0) apply an explicit validity mask.

Preps/stats that aggregate over a row (STD mean/std, NRM min/max,
weighting lookups) use per-row *masked* statistics so pads never enter.
"""

from __future__ import annotations

import numpy as np

from .iss import iss as iss_3d


def band_of(lengths: np.ndarray, min_width: int = 8) -> np.ndarray:
    """Power-of-two band width per row (>= min_width)."""
    w = np.maximum(lengths, 1)
    exp = np.ceil(np.log2(np.maximum(w, min_width))).astype(np.int64)
    return np.int64(1) << exp


def pad_rows(values: np.ndarray, offsets: np.ndarray, rows: np.ndarray,
             width: int) -> tuple[np.ndarray, np.ndarray]:
    """Gather the given rows into a zero-padded (len(rows), width) block.

    Returns (X, lengths)."""
    lengths = (offsets[1:] - offsets[:-1])[rows]
    n = len(rows)
    X = np.zeros((n, width), dtype=np.float64)
    if values.size == 0:
        return X, lengths
    # one flat gather: positions clipped into each row, then masked
    idx = offsets[rows][:, None] + np.minimum(
        np.arange(width)[None, :], np.maximum(lengths - 1, 0)[:, None]
    )
    X[:] = values[np.minimum(idx, values.size - 1)]
    X[np.arange(width)[None, :] >= lengths[:, None]] = 0.0
    return X, lengths


class PadCtx:
    """A padded band plus its per-row geometry."""

    def __init__(self, X: np.ndarray, lengths: np.ndarray) -> None:
        self.X = X
        self.lengths = lengths
        self.n, self.L = X.shape
        self._valid = None

    @property
    def valid(self) -> np.ndarray:
        if self._valid is None:
            self._valid = (
                np.arange(self.L)[None, :] < self.lengths[:, None]
            )
        return self._valid


# ---------------------------------------------------------------------------
# preps (length-aware)
# ---------------------------------------------------------------------------

def inc_p(ctx: PadCtx, X, shift=1, depth=1, zero_padding=True):
    out = X
    for _ in range(depth):
        nxt = np.zeros_like(out)
        nxt[:, shift:] = out[:, shift:] - out[:, :-shift]
        if not zero_padding:
            nxt[:, :shift] = X[:, :shift]
        out = nxt
    return out


def std_p(ctx: PadCtx, X, var=True, eps=1e-5):
    n = np.maximum(ctx.lengths, 1).astype(np.float64)[:, None]
    v = ctx.valid
    mu = np.where(v, X, 0.0).sum(axis=1, keepdims=True) / n
    if var:
        sd = np.sqrt(
            np.where(v, (X - mu) ** 2, 0.0).sum(axis=1, keepdims=True) / n
        )
    else:
        sd = np.zeros_like(mu)
    out = (X - mu) / (sd + eps)
    return np.where(v, out, 0.0)


def nrm_p(ctx: PadCtx, X):
    v = ctx.valid
    lo = np.where(v, X, np.inf).min(axis=1, keepdims=True)
    hi = np.where(v, X, -np.inf).max(axis=1, keepdims=True)
    span = hi - lo
    safe = np.where(span == 0, 1.0, span)
    out = (X - lo) / safe
    out = np.where(span == 0, 0.0, out)
    return np.where(v, out, 0.0)


# ---------------------------------------------------------------------------
# weighting lookups (length-aware)
# ---------------------------------------------------------------------------

def _nrm01_p(ctx: PadCtx, x: np.ndarray) -> np.ndarray:
    v = ctx.valid
    lo = np.where(v, x, np.inf).min(axis=1, keepdims=True)
    hi = np.where(v, x, -np.inf).max(axis=1, keepdims=True)
    span = hi - lo
    safe = np.where(span == 0, 1.0, span)
    out = np.where(span == 0, 0.0, (x - lo) / safe)
    return np.where(v, out, 0.0)


def indices_lookup_p(ctx: PadCtx, relative=True, scale=50.0):
    r = (np.arange(ctx.L)[None, :] + 1).astype(np.float64)
    if relative:
        r = r / ctx.lengths[:, None]
    else:
        r = np.broadcast_to(r, ctx.X.shape).copy()
    return _nrm01_p(ctx, r) * scale


def _mass_p(ctx: PadCtx, X, kind: str) -> np.ndarray:
    d = inc_p(ctx, X)
    d = np.where(ctx.valid, d, 0.0)  # boundary diff at first pad -> 0
    m = np.abs(d) if kind == "L1" else d * d
    return np.cumsum(m, axis=1)


def l1_lookup_p(ctx, X, relative=False, scale=50.0):
    s = _mass_p(ctx, X, "L1")
    if relative:
        last = np.take_along_axis(
            s, np.maximum(ctx.lengths - 1, 0)[:, None], axis=1
        )
        s = s / (last + 1e-5)
    return _nrm01_p(ctx, s) * scale


def l2_lookup_p(ctx, X, relative=False, scale=50.0):
    s = _mass_p(ctx, X, "L2")
    if relative:
        last = np.take_along_axis(
            s, np.maximum(ctx.lengths - 1, 0)[:, None], axis=1
        )
        s = s / (last + 1e-5)
    return _nrm01_p(ctx, s) * scale


def coquantile_p(ctx, X, q, norm="L2"):
    mass = _mass_p(ctx, X, norm)
    last = np.take_along_axis(
        mass, np.maximum(ctx.lengths - 1, 0)[:, None], axis=1
    )
    return np.where(
        ctx.valid & (mass <= q * last), 1, 0
    ).sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# sieves with tail corrections
# ---------------------------------------------------------------------------

def _last_val(ctx: PadCtx, stream: np.ndarray) -> np.ndarray:
    return np.take_along_axis(
        stream, np.maximum(ctx.lengths - 1, 0)[:, None], axis=1
    )[:, 0]


def resolve_cuts_p(ctx: PadCtx, cuts, norm: str, src: np.ndarray) -> np.ndarray:
    out = np.zeros((ctx.n, len(cuts) + 1), dtype=np.int64)
    for i, c in enumerate(cuts):
        if isinstance(c, float):
            out[:, i + 1] = coquantile_p(ctx, src, c, norm)
        else:
            out[:, i + 1] = c if c >= 0 else ctx.lengths + c + 1
    out.sort(axis=1)
    return out


def _is_full_cut(ctx, cuts, j) -> bool:
    return bool(
        np.all(cuts[:, j] == 0) and np.all(cuts[:, j + 1] == ctx.lengths)
    )


def sieve_end_p(ctx, stream, cuts):
    out = np.zeros((ctx.n, cuts.shape[1] - 1))
    for j in range(cuts.shape[1] - 1):
        idx = np.clip(cuts[:, j + 1] - 1, 0, ctx.L - 1)
        out[:, j] = np.take_along_axis(stream, idx[:, None], axis=1)[:, 0]
        out[ctx.lengths == 0, j] = 0.0
    return out


def sieve_max_p(ctx, stream, cuts, quantiles, minimum=False,
                tail_const=True):
    nb = len(quantiles) - 1
    out = np.zeros((ctx.n, (cuts.shape[1] - 1) * nb))
    op_empty = np.inf if minimum else -np.inf
    for j in range(cuts.shape[1] - 1):
        full_seg = _is_full_cut(ctx, cuts, j)
        for k in range(nb):
            full_band = np.isneginf(quantiles[k]) and np.isposinf(quantiles[k + 1])
            if full_seg and full_band and tail_const:
                # pad tail == final value (attained in the true region):
                # plain row-max/min is already correct
                v = stream.min(axis=1) if minimum else stream.max(axis=1)
            else:
                m = ctx.valid
                if not full_seg:
                    idx = np.arange(ctx.L)[None, :]
                    m = m & (idx >= cuts[:, j:j + 1]) & (idx < cuts[:, j + 1:j + 2])
                if not full_band:
                    m = m & (quantiles[k] < stream) & (stream <= quantiles[k + 1])
                filled = np.where(m, stream, op_empty)
                v = filled.min(axis=1) if minimum else filled.max(axis=1)
            v = np.where(np.isfinite(v), v, 0.0)
            v[ctx.lengths == 0] = 0.0
            out[:, j * nb + k] = v
    return out


def sieve_ppv_p(ctx, stream, quantiles, segments=False, tail_const=True):
    n = np.maximum(ctx.lengths, 1).astype(np.float64)
    qs = list(quantiles)
    if tail_const:
        # constant tail == final value: count over the padded row, then
        # subtract the tail's contribution in O(n_rows)
        tail = (ctx.L - ctx.lengths).astype(np.float64)
        last = _last_val(ctx, stream)
        if segments:
            out = np.zeros((ctx.n, len(qs) - 1))
            for j in range(1, len(qs)):
                cnt = ((qs[j - 1] <= stream) & (stream < qs[j])).sum(axis=1)
                corr = tail * ((qs[j - 1] <= last) & (last < qs[j]))
                out[:, j - 1] = (cnt - corr) / n
            return out
        out = np.zeros((ctx.n, len(qs)))
        for j, q in enumerate(qs):
            cnt = (stream >= q).sum(axis=1)
            corr = tail * (last >= q)
            out[:, j] = (cnt - corr) / n
        return out
    v = ctx.valid
    if segments:
        out = np.zeros((ctx.n, len(qs) - 1))
        for j in range(1, len(qs)):
            out[:, j - 1] = (
                ((qs[j - 1] <= stream) & (stream < qs[j]) & v).sum(axis=1) / n
            )
        return out
    out = np.zeros((ctx.n, len(qs)))
    for j, q in enumerate(qs):
        out[:, j] = ((stream >= q) & v).sum(axis=1) / n
    return out


def sieve_cpv_p(ctx, stream, quantiles, segments=False):
    # tail is constant -> indicator has no rising edge at or after the
    # boundary, so padded rising-edge counts are already correct
    n_even = np.maximum(
        ctx.lengths + (ctx.lengths % 2), 1
    ).astype(np.float64)
    qs = list(quantiles)
    def rising(ind):
        d = np.zeros_like(ind)
        d[:, 1:] = ind[:, 1:] - ind[:, :-1]
        return (d == 1).sum(axis=1)
    if segments:
        out = np.zeros((ctx.n, len(qs) - 1))
        for j in range(1, len(qs)):
            ind = ((qs[j - 1] <= stream) & (stream < qs[j])).astype(np.float64)
            ind = np.where(ctx.valid, ind, ind[
                np.arange(ctx.n)[:, None],
                np.maximum(ctx.lengths - 1, 0)[:, None],
            ])
            out[:, j - 1] = 2 * rising(ind) / n_even
        return out
    out = np.zeros((ctx.n, len(qs)))
    for j, q in enumerate(qs):
        ind = (stream >= q).astype(np.float64)
        ind = np.where(ctx.valid, ind, ind[
            np.arange(ctx.n)[:, None],
            np.maximum(ctx.lengths - 1, 0)[:, None],
        ])
        out[:, j] = 2 * rising(ind) / n_even
    return out


def _pre_inc_p(ctx, stream, inc):
    arr = stream
    if inc > 0:
        for _ in range(inc):
            arr = inc_p(ctx, arr)
            arr = np.where(ctx.valid, arr, 0.0)
    elif inc < 0:
        for _ in range(-inc):
            arr = np.cumsum(arr, axis=1)
    return arr


def _inc_family_p(ctx, stream, cuts, quantiles, inc, kind):
    """NPI/MPI/XPI/LPI: masked generic (increments' pads already zeroed
    by _pre_inc_p, so bands excluding 0 are naturally pad-free; masks
    are only built for non-default segments/bands)."""
    arr = _pre_inc_p(ctx, stream, inc)
    nb = len(quantiles) - 1
    out = np.zeros((ctx.n, (cuts.shape[1] - 1) * nb))
    idx = np.arange(ctx.L)[None, :]
    for j in range(cuts.shape[1] - 1):
        full_seg = _is_full_cut(ctx, cuts, j)
        for k in range(nb):
            m = (quantiles[k] < arr) & (arr <= quantiles[k + 1])
            m &= ctx.valid
            if not full_seg:
                m = m & (idx >= cuts[:, j:j + 1]) & (idx < cuts[:, j + 1:j + 2])
            if kind == "npi":
                v = m.sum(axis=1).astype(np.float64)
            elif kind == "mpi":
                cnt = m.sum(axis=1)
                s = np.where(m, arr, 0.0).sum(axis=1)
                v = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
            elif kind == "xpi":
                rel = idx - cuts[:, j:j + 1]
                cnt = m.sum(axis=1)
                s = np.where(m, rel, 0).sum(axis=1)
                v = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
            else:  # lpi
                last_false = np.maximum.accumulate(
                    np.where(~m, idx, -1), axis=1
                )
                runs = np.where(m, idx - last_false, 0)
                v = runs.max(axis=1).astype(np.float64)
            out[:, j * nb + k] = v
    return out


def sieve_cur_p(ctx, stream, cuts, quantiles):
    x2 = inc_p(ctx, inc_p(ctx, stream))
    x2 = np.where(ctx.valid, x2, 0.0)
    nb = len(quantiles) - 1
    out = np.zeros((ctx.n, (cuts.shape[1] - 1) * nb))
    idx = np.arange(ctx.L)[None, :]
    for j in range(cuts.shape[1] - 1):
        full_seg = _is_full_cut(ctx, cuts, j)
        for k in range(nb):
            m = (quantiles[k] < x2) & (x2 <= quantiles[k + 1]) & ctx.valid
            if not full_seg:
                m = m & (idx >= cuts[:, j:j + 1]) & (idx < cuts[:, j + 1:j + 2])
            out[:, j * nb + k] = np.where(m, x2 * x2, 0.0).sum(axis=1)
    return out


# ---------------------------------------------------------------------------
# ISS on the padded block (delegates to the 3-D kernels — prefix-local)
# ---------------------------------------------------------------------------

def iss_p(ctx: PadCtx, X: np.ndarray, word, extended, semiring,
          alpha=None, lookup=None, total=False) -> np.ndarray:
    """(n, L) -> (n, extended, L) via the shared 3-D kernels; pads don't
    contaminate true positions (all scans are prefix-local)."""
    return iss_3d(
        X[:, np.newaxis, :], word, extended=extended, semiring=semiring,
        alpha=alpha, lookup=lookup, total=total,
    )


def coswiss_grids_p(ctx: PadCtx, freq: float):
    """(sin, cos) angle grids for one frequency — shared across every
    word of a CosWISS spec (they depend only on freq and geometry)."""
    f32 = float(np.float32(freq))
    denom = np.where(
        ctx.lengths > 1, f32 * (ctx.lengths - 1).astype(np.float64), 1.0
    )
    g = np.pi * np.arange(ctx.L)[None, :] / denom[:, None]
    return np.sin(g), np.cos(g)


def coswiss_p(
    ctx: PadCtx,
    X: np.ndarray,
    word,
    freq: float,
    exponent: int = 2,
    total: bool = False,
    grids=None,
) -> np.ndarray:
    """CosWISS on a padded band: same gap-choice trie DFS as
    :func:`fruits_spark.kernels.iss.coswiss`, but the angle grid uses
    each row's TRUE length (``pi * t / (f * (len-1))`` per row — the
    band width is padding, not signal).  Zero pads kill every summand
    (every letter has exponent >= 1, so ``tmp`` is 0 at pads), hence
    the non-``total`` result has a constant tail; ``total`` multiplies
    the final stream by position weights, so its tail is NOT constant
    and callers must use masked sieves."""
    from math import comb

    word = np.asarray(word, dtype=np.int32)
    exps = word[:, 0]
    sin_w, cos_w = (
        grids if grids is not None else coswiss_grids_p(ctx, freq)
    )
    n_let = len(exps)
    n_gaps = (n_let + 1 if total else n_let) - 1
    result = np.zeros_like(X)

    def shift1(a):
        out = np.zeros_like(a)
        out[:, 1:] = a[:, :-1]
        return out

    def step(state, k, sin_e, cos_e):
        tmp = shift1(state) if k > 0 else state
        tmp = tmp * X ** int(exps[k])
        for _ in range(sin_e):
            tmp = tmp * sin_w
        for _ in range(cos_e):
            tmp = tmp * cos_w
        return np.cumsum(tmp, axis=-1)

    def dfs(k, state, coeff, prev):
        nonlocal result
        if k == n_let:
            tmp = state
            if total:
                for _ in range(exponent - prev):
                    tmp = tmp * sin_w
                for _ in range(prev):
                    tmp = tmp * cos_w
            result += coeff * tmp
            return
        right_sin = (exponent - prev) if k > 0 else 0
        right_cos = prev if k > 0 else 0
        if k < n_gaps:
            for c in range(exponent + 1):
                st = step(state, k, right_sin + (exponent - c),
                          right_cos + c)
                dfs(k + 1, st, coeff * comb(exponent, c), c)
        else:
            st = step(state, k, right_sin, right_cos)
            dfs(k + 1, st, coeff, prev)

    dfs(0, np.ones_like(X), 1, 0)
    return result
