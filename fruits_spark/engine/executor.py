"""Compile a :class:`~fruits_spark.plan.FruitPlan` into a Spark job.

Hot path = ONE ``mapInPandas`` over the token table: each Arrow batch is
flattened to ``(values, offsets)``, length-bucketed, and every slice's
prep -> ISS -> sieve chain runs as vectorized NumPy on 3-D blocks
(:mod:`fruits_spark.kernels`).  No per-row Python, no shuffle — feature
extraction is embarrassingly parallel across partitions; the only
shuffles in an end-to-end job are the rollup ``groupBy`` afterwards.

Feature columns come out *wide* (one DoubleType column per feature,
sanitized names + a label map) so the downstream tier rollup is plain
JVM hash aggregation with map-side partial aggregation; Catalyst prunes
unused feature columns out of the UDF projection automatically.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from .. import plan as Pl
from ..kernels import iss as KI
from ..kernels import prep as KP
from ..kernels import sieve as KS
from ..kernels.segments import flatten_lists


def _apply_prep(Z: np.ndarray, p: Pl.Prep) -> np.ndarray:
    fn = {
        "inc": KP.inc,
        "std": KP.std,
        "nrm": KP.nrm,
        "mav": KP.mav,
        "lag": KP.lag,
        "dot": KP.dot_filter,
        "win": KP.win_filter,
        "cts": KP.cts,
        "qtc": KP.qtc,
        "ffn": KP.ffn,
        "rin": KP.rin,
        "rdw": KP.rdw,
        "jld": KP.jld,
        "spe": KP.spe,
        "rpe": KP.rpe,
    }[p.kind]
    return fn(Z, **p.params)


def _lookup_for(spec: Pl.ISSSpec, Z: np.ndarray):
    if spec.weighting is None:
        return None
    n, _, length = Z.shape
    wp = dict(spec.weighting_params)
    if spec.weighting == "indices":
        return KI.indices_lookup(n, length, **wp)
    if spec.weighting == "l1":
        return KI.l1_lookup(Z, **wp)
    if spec.weighting == "l2":
        return KI.l2_lookup(Z, **wp)
    if spec.weighting == "plateaus":
        return KI.plateaus_lookup(n, length, **wp)
    raise ValueError(spec.weighting)


def _apply_sieve(stream: np.ndarray, sv: Pl.Sieve, Z_src: np.ndarray) -> np.ndarray:
    """stream (n, l) -> features (n, k).  ``Z_src`` is the prepared input
    batch — coquantile cuts are computed on it, not on the stream."""
    p = sv.params
    if sv.kind in ("ppv", "cpv"):
        qs = p.get("quantiles", [0.5])
        fn = KS.sieve_ppv if sv.kind == "ppv" else KS.sieve_cpv
        return fn(stream, qs, segments=p.get("segments", False))
    cuts_spec = p.get("cuts", [-1])
    norm = p.get("norm", "L2")
    q = np.asarray(
        p.get("q_values", KS.resolve_quantiles(None, p.get("q", (-1.0, 1.0))))
    )
    if sv.kind in ("npi", "mpi", "xpi", "lpi"):
        fn = {
            "npi": KS.sieve_npi, "mpi": KS.sieve_mpi,
            "xpi": KS.sieve_xpi, "lpi": KS.sieve_lpi,
        }[sv.kind]
        return fn(stream, list(cuts_spec), q, inc=p.get("inc", 1),
                  source=Z_src, norm=norm)
    cuts = KS.resolve_cuts(stream, list(cuts_spec), norm, source=Z_src)
    if sv.kind == "end":
        return KS.sieve_end(stream, cuts)
    if sv.kind == "max":
        return KS.sieve_max(stream, cuts, q)
    if sv.kind == "min":
        return KS.sieve_min(stream, cuts, q)
    if sv.kind == "cur":
        return KS.sieve_cur(stream, cuts, q)
    if sv.kind == "avg":
        return KS.sieve_avg(stream, cuts, q, faithful=p.get("faithful", True))
    if sv.kind == "std":
        return KS.sieve_std(stream, cuts, q, faithful=p.get("faithful", True))
    raise ValueError(sv.kind)


def compute_features_block(Z: np.ndarray, fplan: Pl.FruitPlan) -> np.ndarray:
    """One equal-length 3-D block -> (n, n_features) float64.

    This is the unit the reference calls ``Fruit.transform``
    (fruit.py:138-173), restructured: NaNs are zeroed at the end exactly
    like the reference (fruit.py:172).
    """
    n = Z.shape[0]
    out = np.empty((n, fplan.n_features()), dtype=np.float64)
    col = 0
    for sl in fplan.slices:
        Zp = Z
        for p in sl.preps:
            Zp = _apply_prep(Zp, p)
        spec = sl.iss
        lookup = _lookup_for(spec, Zp)
        alpha = None
        pplan = spec.plan()
        for wi, w in enumerate(spec.words):
            depth = pplan.depth(wi) if pplan is not None else 1
            if depth == 0:
                continue
            if spec.weighting is not None:
                alpha = np.array(w.alpha, dtype=np.float32)
            streams = KI.iss(
                Zp, w.matrix, extended=depth, semiring=spec.semiring,
                alpha=alpha, lookup=lookup, total=spec.total,
            )
            for s in range(depth):
                stream = streams[:, s, :]
                for sv in sl.sieves:
                    feats = _apply_sieve(stream, sv, Zp)
                    out[:, col:col + feats.shape[1]] = feats
                    col += feats.shape[1]
    if col != fplan.n_features():
        raise AssertionError(f"feature accounting: {col} != {fplan.n_features()}")
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def _sanitize(label: str, i: int) -> str:
    return f"f{i:04d}_" + re.sub(r"[^A-Za-z0-9]+", "_", label).strip("_")[:48]


def feature_columns(fplan: Pl.FruitPlan) -> list[str]:
    return [_sanitize(lb, i) for i, lb in enumerate(fplan.feature_labels())]


def extract_features(
    df: DataFrame,
    fplan: Pl.FruitPlan,
    tokens_col: str = "tokens",
    keep: tuple[str, ...] = ("doc_id", "source", "n_tok"),
    cast_scale: float | None = None,
) -> DataFrame:
    """Token table -> per-doc feature table (one mapInPandas, no shuffle).

    ``cast_scale``: optional multiplier applied after casting tokens to
    float64 (e.g. 1/TOKEN_MOD to keep monomials bounded without a fitted
    preparateur).
    """
    fcols = feature_columns(fplan)
    keep_fields = [df.schema[k] for k in keep]
    out_schema = StructType(
        list(keep_fields) + [StructField(c, DoubleType(), False) for c in fcols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            values, offsets = flatten_lists(pdf[tokens_col])
            if cast_scale is not None:
                values *= cast_scale
            lengths = np.diff(offsets)
            feats = np.zeros((len(pdf), fplan.n_features()), dtype=np.float64)
            for ln in np.unique(lengths):
                rows = np.nonzero(lengths == ln)[0]
                if ln == 0:
                    continue
                gather = (
                    offsets[rows][:, None] + np.arange(ln)[None, :]
                ).ravel()
                Z = values[gather].reshape(len(rows), 1, int(ln))
                feats[rows] = compute_features_block(Z, fplan)
            out = pdf[list(keep)].reset_index(drop=True)
            for i, c in enumerate(fcols):
                out[c] = feats[:, i]
            yield out

    return df.select(*keep, tokens_col).mapInPandas(run, out_schema)
