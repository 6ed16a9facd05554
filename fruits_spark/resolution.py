"""Resolution ops on token-sequence columns (reference
``experiments/corbeille/corbeille/data.py:311-417``), Spark-first.

``downsample`` / ``upsample`` / ``lengthen`` are pure JVM higher-order
array expressions (whole-stage codegen, no Python, no shuffle) applied
to an ``array`` column — at 10^12 sequences they cost one map pass.
``implant_stuttering`` is inherently sequential-random per series, so it
runs as a ``mapInPandas`` Arrow kernel with a per-document seeded
Generator (the reference uses the global ``np.random`` — a seeded
per-row RNG is the deterministic distributed equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def downsample(col: str, resolution: float = 0.5) -> Column:
    """Coarser series: keep every n-th value, n = int(1/resolution)
    (ref data.py:389-402)."""
    if not 0.0 < resolution <= 1.0:
        raise ValueError(
            f"resolution must be in (0, 1], got {resolution}"
        )
    n = int(1 / resolution)
    return F.expr(
        f"transform(sequence(0, size({col}) - 1, {n}), "
        f"i -> element_at({col}, i + 1))"
    )


def upsample(col: str) -> Column:
    """Linear midpoint interpolation to length 2l-1 (ref data.py:405-417):
    out[2i] = x[i], out[2i+1] = (x[i] + x[i+1]) / 2, as double."""
    return F.expr(
        f"transform(sequence(0, 2 * (size({col}) - 1)), k -> "
        f"CASE WHEN k % 2 = 0 THEN cast(element_at({col}, "
        f"cast(k / 2 as int) + 1) as double) "
        f"ELSE (cast(element_at({col}, cast((k - 1) / 2 as int) + 1) "
        f"as double) + cast(element_at({col}, cast((k + 1) / 2 as int) + 1) "
        f"as double)) / 2.0 END)"
    )


def lengthen(col: str, length: float = 0.1) -> Column:
    """Pad the tail with int(length*l) copies of the last value
    (ref data.py:368-386)."""
    return F.expr(
        f"concat({col}, array_repeat(element_at({col}, -1), "
        f"cast(floor(size({col}) * {length}) as int)))"
    )


def implant_stuttering(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    stutter_length: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Stuttering augmentation (ref data.py:311-365): repeat values at
    random positions until the series grows by
    ``int(stutter_length * l)`` steps.  Faithful port of the reference's
    sequential shift-and-repeat loop, with ``np.random`` replaced by a
    per-document ``default_rng(seed + doc_id)`` so the output is
    deterministic and independent of partitioning.  Output column
    ``stuttered`` replaces nothing — the input columns pass through."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, stuttered array<int>"

    def run(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d, t in zip(pdf[id_col], pdf[tokens_col]):
                x = np.asarray(t, dtype=np.int64)
                out.append(
                    _stutter_one(x, stutter_length,
                                 np.random.default_rng(seed + int(d)))
                    .astype(np.int32)
                )
            res = pdf.copy()
            res["stuttered"] = out
            yield res

    return df.mapInPandas(run, schema)


def _stutter_one(x, stutter_length: float, rng):
    """One series: the reference loop (data.py:324-365) verbatim, on a
    1-D array with an injected Generator."""
    import numpy as np

    l = x.shape[0]
    additional = int(stutter_length * l)
    out = np.zeros(l + additional, dtype=x.dtype)
    out[:l] = x
    lengthened = 0
    prop_index = 0
    while lengthened < additional:
        stlength = int(rng.integers(1, additional - lengthened + 1))
        stindex = int(rng.integers(prop_index + 1, l + additional))
        if stindex >= l + lengthened - 1:
            out[l + lengthened - 1:] = x[-1]
            break
        start = stindex + 1
        length = l - (start - lengthened)
        to = stindex + stlength + 1
        out[to:to + length] = out[start:start + length].copy()
        out[stindex + 1:stindex + stlength + 1] = out[stindex]
        lengthened += stlength
        prop_index = stindex + stlength
    return out
