"""Public-dataset ingestion: UCR ``.txt`` and UEA ``.arff`` readers.

The reference's experiment harness loads UCR/UEA archives from disk
(``experiments/corbeille/corbeille/data.py:150-267``): univariate
datasets as ``<name>_TRAIN.txt`` / ``<name>_TEST.txt`` numpy-readable
matrices (first column = integer class label, rest = the series,
delimiter comma or whitespace), multivariate ones as UEA relational
``.arff`` files, with NaNs repaired by per-dimension LOCF (position 0
-> 0).  This module maps both formats into the engine's series data
model — rows ``(doc_id, label, series, n_tok)`` ready for
:func:`fruits_spark.engine.executor.extract_features` (univariate:
``series array<double>``; multivariate: ``array<array<double>>`` for
the ``multivariate=True`` path).

Scale notes: UCR/UEA archives are experiment inputs (MBs), not the
100 TB path — the ``.txt`` branch still parses fully JVM-side
(``spark.read.text`` + split/cast, so a directory of large ``.txt``
shards would distribute fine), with only the NaN repair in a
vectorized ``mapInPandas`` (LOCF is a scan; Spark's array HOFs have no
linear-time scan).  The ``.arff`` relational parser is driver-side by
design: the UEA header grammar is stateful and the files are small;
label ids follow FIRST APPEARANCE order across train-then-test exactly
like the reference (pass the returned ``label_map`` of the train read
into the test read).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def replace_nan_locf(df: DataFrame, series_col: str = "series",
                     multivariate: bool = False) -> DataFrame:
    """Reference NaN repair (data.py:134-147): per dimension, position
    0 -> 0.0, later NaNs -> last repaired value (consecutive NaNs all
    receive the carried value).  Vectorized per Arrow batch."""
    import pandas as pd

    schema = df.schema

    def _repair_2d(X: np.ndarray) -> np.ndarray:
        # X: (dims, len) float64; LOCF along axis 1 with 0 at position 0
        if not np.isnan(X).any():
            return X
        X = X.copy()
        X[np.isnan(X[:, 0]), 0] = 0.0
        mask = ~np.isnan(X)
        idx = np.where(mask, np.arange(X.shape[1])[None, :], 0)
        np.maximum.accumulate(idx, axis=1, out=idx)
        return np.take_along_axis(X, idx, axis=1)

    def run(batches):
        for pdf in batches:
            fixed = []
            for s in pdf[series_col]:
                if multivariate:
                    X = np.array([np.asarray(d, dtype=np.float64) for d in s])
                    fixed.append([d for d in _repair_2d(X)])
                else:
                    X = np.asarray(s, dtype=np.float64)[None, :]
                    fixed.append(_repair_2d(X)[0])
            out = pdf.copy()
            out[series_col] = fixed
            yield out

    return df.mapInPandas(run, schema)


def read_ucr_txt(
    spark: SparkSession, file: str, repair_nan: bool = True
) -> DataFrame:
    """One UCR ``.txt`` split -> ``(doc_id, label, series, n_tok)``.

    Parsing is JVM-side: normalize the delimiter (comma or runs of
    whitespace) to single spaces, split, cast — column 1 is the integer
    class label, the rest the float64 series (reference data.py:179-192,
    incl. its auto delimiter sniff)."""
    lines = spark.read.text(file).where(F.length(F.trim("value")) > 0)
    parts = F.split(
        F.trim(F.regexp_replace(F.col("value"), r"[,\s]+", " ")), " "
    )
    df = (
        lines.select(
            F.monotonically_increasing_id().alias("doc_id"),
            parts.alias("_p"),
        )
        .select(
            "doc_id",
            F.element_at("_p", 1).cast("double").cast("int").alias("label"),
            F.expr(
                "transform(slice(_p, 2, size(_p) - 1), "
                "v -> cast(v AS double))"
            ).alias("series"),
        )
        .withColumn("n_tok", F.size("series").cast("int"))
    )
    if repair_nan:
        df = replace_nan_locf(df, "series")
    return df


def read_ucr_dir(spark: SparkSession, path: str,
                 repair_nan: bool = True) -> dict[str, DataFrame]:
    """A UCR dataset folder ``<path>/<name>_{TRAIN,TEST}.txt`` ->
    ``{"train": df, "test": df}`` (reference load() univariate branch)."""
    name = os.path.basename(os.path.normpath(path))
    return {
        split.lower(): read_ucr_txt(
            spark, os.path.join(path, f"{name}_{split}.txt"), repair_nan
        )
        for split in ("TRAIN", "TEST")
    }


# ---------------------------------------------------------------------------
# UEA relational .arff (multivariate)
# ---------------------------------------------------------------------------

#: driver-side parse cap for read_uea_arff (the largest UEA archive
#: files are ~100 MB; 300 MB of text ~ a few GB of Python lists)
ARFF_MAX_BYTES = 300 * 1024 * 1024


def parse_arff_relational(text: str):
    """Minimal parser for the UEA multivariate ``.arff`` layout: one
    relational attribute holding the (dims x steps) series (dimensions
    separated by ``\\n`` inside the quoted field) plus a class
    attribute.  Returns ``(series: list[list[list[float]]],
    labels: list[str])``.  Only the subset the UEA archive uses is
    supported — that is the subset the reference reads via scipy
    (which this container does not ship)."""
    series: list = []
    labels: list = []
    in_data = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("%"):
            continue
        low = line.lower()
        if not in_data:
            if low.startswith("@data"):
                in_data = True
            continue
        # data row: '<dim1 csv>\n<dim2 csv>...',label
        if line.startswith("'"):
            endq = line.rindex("'")
            field, rest = line[1:endq], line[endq + 1:]
            label = rest.lstrip(",").strip()
            dims = [
                [float(v) for v in dim.split(",")]
                for dim in field.split("\\n")
            ]
        else:
            # univariate-in-arff fallback: csv row with trailing label
            vals = line.split(",")
            label = vals[-1].strip()
            dims = [[float(v) for v in vals[:-1]]]
        series.append(dims)
        labels.append(label)
    return series, labels


def read_uea_arff(
    spark: SparkSession,
    file: str,
    label_map: dict[str, int] | None = None,
    repair_nan: bool = True,
):
    """One UEA ``.arff`` split -> ``(df, label_map)`` with
    ``df = (doc_id, label, series array<array<double>>, n_tok)``.

    ``label_map`` assigns integer ids by FIRST APPEARANCE order and is
    extended in place across calls — pass the train split's map into
    the test read to reproduce the reference's train-then-test label
    numbering (data.py:238-252).

    The parse is DRIVER-SIDE by design (stateful UEA header grammar
    over MB-scale archive files); a size guard refuses anything that
    would balloon driver memory — repartition+distribute is the wrong
    fix for a format whose real archives top out ~100 MB."""
    sz = os.path.getsize(file)
    if sz > ARFF_MAX_BYTES:
        raise ValueError(
            f"{file} is {sz / 1e6:.0f} MB — parse_arff_relational is "
            f"driver-side and capped at {ARFF_MAX_BYTES / 1e6:.0f} MB; "
            "real UEA archives are well under this. Raise ARFF_MAX_BYTES "
            "only if the driver has the memory."
        )
    with open(file, encoding="utf8") as f:
        series, labels = parse_arff_relational(f.read())
    if label_map is None:
        label_map = {}
    for lb in labels:
        if lb not in label_map:
            label_map[lb] = len(label_map)
    rows = [
        (i, label_map[lb], s, len(s[0]) if s else 0)
        for i, (s, lb) in enumerate(zip(series, labels))
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, label int, series array<array<double>>, n_tok int",
    )
    if repair_nan:
        df = replace_nan_locf(df, "series", multivariate=True)
    return df, label_map
