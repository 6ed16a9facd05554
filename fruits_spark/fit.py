"""Fit stage: resolve dataset-level statistics before execution.

The reference's ``Fruit.fit`` (fruit.py:121-136, 473-496) runs the
pipeline on a fit sample and stores per-component state:

  * sieves whose quantile bands use probabilities (``q`` not in
    {-1, 0, 1}) — and PPV/CPV with ``constant=False`` — are fitted PER
    STREAM: every iterated-sum stream gets its own fitted copy;
  * STD with ``separately=False`` stores the sample's global mean/std;
  * QTC stores the sample's quantile value.

Spark mapping: the fit sample is a deterministic slice of the table
(first ``sample_size`` rows by doc_id), collected to the driver; fitting
runs the same kernels locally, and the fitted values are embedded into a
NEW FruitPlan (plain data -> broadcast to executors inside the UDF
closure).  Executors never re-fit.
"""

from __future__ import annotations

import numpy as np

from . import plan as Pl
from .kernels.segments import flatten_lists


def _fitted_sieve(sv: Pl.Sieve, per_stream: list) -> Pl.Sieve:
    params = dict(sv.params)
    if sv.kind in ("ppv", "cpv"):
        params["quantiles_per_stream"] = tuple(
            tuple(q) for q in per_stream
        )
    else:
        params["q_values_per_stream"] = tuple(tuple(q) for q in per_stream)
    return Pl.Sieve(sv.kind, params)


def fit_plan_pandas(pdf, fplan: Pl.FruitPlan, tokens_col: str = "tokens",
                    cast_scale: float | None = None) -> Pl.FruitPlan:
    """Fit on a local pandas sample; returns a plan with fitted params."""
    from .engine.executor import _apply_prep, _emit_streams_block
    from .kernels.sieve import resolve_quantiles

    values, offsets = flatten_lists(pdf[tokens_col])
    if cast_scale is not None:
        values = values * cast_scale
    lengths = np.diff(offsets)

    new_slices = []
    for sl in fplan.slices:
        needs = [sv.requires_fitting() for sv in sl.sieves]
        new_preps = []
        # dataset-level prep stats
        for p in sl.preps:
            if p.kind == "std" and not p.params.get("separately", True):
                params = dict(p.params)
                params["mean"] = float(values.mean()) if values.size else 0.0
                params["stdev"] = float(values.std()) if values.size else 1.0
                new_preps.append(Pl.Prep("std", params))
            elif p.kind == "qtc" and "q_value" not in p.params:
                params = dict(p.params)
                q = params.pop("q", 0.5)
                params["q_value"] = (
                    float(np.quantile(values, q)) if values.size else 0.0
                )
                new_preps.append(Pl.Prep("qtc", params))
            else:
                new_preps.append(p)
        if not any(needs):
            new_slices.append(
                Pl.Slice(tuple(new_preps), sl.iss, sl.sieves)
            )
            continue

        # run the sample through preps + ISS per length bucket, collect
        # each stream's values across the whole sample
        n_streams = sl.n_streams()
        stream_vals: list[list[np.ndarray]] = [[] for _ in range(n_streams)]
        for ln in np.unique(lengths):
            rows = np.nonzero(lengths == ln)[0]
            if ln == 0:
                continue
            gather = (offsets[rows][:, None] + np.arange(ln)[None, :]).ravel()
            Z = values[gather].reshape(len(rows), 1, int(ln))
            Zp = Z
            for p in new_preps:
                Zp = _apply_prep(Zp, p)
            for si, stream in enumerate(
                _emit_streams_block(Zp, sl.iss_chain(), Z)
            ):
                stream_vals[si].append(stream.ravel())

        new_sieves = []
        for sv in sl.sieves:
            if not sv.requires_fitting():
                new_sieves.append(sv)
                continue
            per_stream = []
            for si in range(n_streams):
                flat = (
                    np.concatenate(stream_vals[si])
                    if stream_vals[si] else np.zeros(1)
                )
                if sv.kind in ("ppv", "cpv"):
                    qs = sv.params.get("quantiles", [0.5])
                    consts = sv.params.get(
                        "constant", [False] * len(qs)
                    )
                    vals = [
                        q if c else float(np.quantile(flat, q))
                        for q, c in zip(qs, consts)
                    ]
                    per_stream.append(vals)
                else:
                    probs = sv.params.get("q", (-1.0, 1.0))
                    per_stream.append(
                        list(resolve_quantiles(flat, list(probs)))
                    )
            new_sieves.append(_fitted_sieve(sv, per_stream))
        new_slices.append(
            Pl.Slice(tuple(new_preps), sl.iss, tuple(new_sieves))
        )
    return Pl.FruitPlan(tuple(new_slices))


def fit_plan(df, fplan: Pl.FruitPlan, sample_size: int = 1024,
             tokens_col: str = "tokens", order_col: str = "doc_id",
             cast_scale: float | None = None) -> Pl.FruitPlan:
    """Fit from a Spark DataFrame: deterministic sample (first
    ``sample_size`` rows by ``order_col``) collected to the driver."""
    sample = (
        df.select(order_col, tokens_col)
        .orderBy(order_col)
        .limit(sample_size)
        .toPandas()
    )
    return fit_plan_pandas(sample, fplan, tokens_col, cast_scale)
