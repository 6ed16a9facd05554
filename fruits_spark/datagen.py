"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Produces the engine's input shape from ``BASELINE.json`` ``input_hint``:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Properties (all seeded, no wall-clock):
  * Zipf-skewed ``source`` over ``n_sources`` shards (one source holds a
    large share of rows -> exercises salting).
  * variable lengths in [min_len, max_len], plus guaranteed length-1 /
    length-2 edge cases.
  * entire (source, bucket) combinations absent -> real gaps for
    gap-fill tests.

Tokens are generated with a splitmix-style integer hash of
``(doc_index, position)`` so any row is reproducible in isolation — the
same formula can be evaluated in SQL for cross-engine oracles.
"""

from __future__ import annotations

import numpy as np

TOKEN_MOD = 50257  # GPT-2-ish vocab size


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def token_at(doc_index: np.ndarray, pos: np.ndarray, mod: int = TOKEN_MOD) -> np.ndarray:
    """Deterministic token value for (doc, position)."""
    h = _mix(
        doc_index.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + pos.astype(np.uint64)
        + np.uint64(1)
    )
    return (h % np.uint64(mod)).astype(np.int32)


def generate_pandas(n_docs: int, seed: int = 42, **kw):
    """Return a pandas DataFrame with the token-table schema (same rows
    the distributed generator produces)."""
    return generate_pandas_range(0, n_docs, n_docs, seed, **kw)


def generate_spark(spark, n_docs: int, seed: int = 42, partitions: int = 32, **kw):
    """Distributed generator: builds the table *on executors* from a range
    — the driver never materializes rows, so it scales to any n_docs.
    """
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("tokens", ArrayType(IntegerType(), False), False),
            StructField("n_tok", IntegerType(), False),
            StructField("source", StringType(), False),
        ]
    )

    def gen_batch(iterator):
        for pdf in iterator:
            lo, hi = int(pdf["id"].min()), int(pdf["id"].max()) + 1
            sub = generate_pandas_range(lo, hi, n_docs, seed, **kw)
            yield sub

    base = spark.range(0, n_docs, 1, partitions)
    return base.mapInPandas(gen_batch, schema)


def generate_pandas_range(lo: int, hi: int, n_docs: int, seed: int = 42, **kw):
    """Rows [lo, hi) of the same table ``generate_pandas(n_docs, seed)``
    would produce — per-row determinism means any executor can generate
    its slice independently of the others."""
    import pandas as pd

    n_sources = kw.get("n_sources", 20)
    min_len = kw.get("min_len", 5)
    max_len = kw.get("max_len", 512)
    gap_sources = kw.get("gap_sources", (7, 13))
    token_mod = kw.get("token_mod", TOKEN_MOD)

    idx = np.arange(lo, hi, dtype=np.int64)
    zipf_w = 1.0 / np.arange(1, n_sources + 1) ** 1.5
    zipf_w /= zipf_w.sum()
    cdf = np.cumsum(zipf_w)
    # per-row deterministic uniform from the hash (independent of range
    # splits, unlike a sequential RNG stream)
    u = _mix(idx.astype(np.uint64) + np.uint64(seed) * np.uint64(0x2545F491)).astype(
        np.float64
    ) / float(2**64)
    src_id = np.searchsorted(cdf, u, side="right")
    u2 = _mix(
        idx.astype(np.uint64) * np.uint64(3) + np.uint64(seed)
    ).astype(np.float64) / float(2**64)
    lengths = (min_len + (u2 * (max_len - min_len + 1)).astype(np.int64)).clip(
        min_len, max_len
    )
    small = idx < 3
    lengths[small] = np.array([1, 2, 2])[idx[small]]
    for g in gap_sources:
        mask = (src_id == g) & (idx % 10 < 5)
        src_id[mask] = 0
    tokens = [
        token_at(np.full(ln, i, dtype=np.int64), np.arange(ln), token_mod)
        for i, ln in zip(idx, lengths)
    ]
    return pd.DataFrame(
        {
            "doc_id": [f"src{s}-{i:09d}" for s, i in zip(src_id, idx)],
            "tokens": tokens,
            "n_tok": lengths.astype(np.int32),
            "source": [f"src{s}" for s in src_id],
        }
    )


# ---------------------------------------------------------------------------
# multisine: controlled-waveform synthetic for parity sweeps over known
# spectra (reference: experiments/corbeille/corbeille/data.py:25-123)
# ---------------------------------------------------------------------------

def multisine_sizes(total: int, n_classes: int) -> list[int]:
    """Per-class example counts with the reference's remainder layout
    (data.py:70-81: leftover examples go to classes remain % n_classes,
    counting the remainder down)."""
    per = total // n_classes
    sizes = [per] * n_classes
    remain = total - per * n_classes
    while remain > 0:
        sizes[remain % n_classes] += 1
        remain -= 1
    return sizes


def multisine_models(
    length: int = 100,
    n_classes: int = 2,
    used_sines: int = 3,
    coefficients: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Class model curves ``(n_classes, length)``: sum_i a_i *
    sin(f_i * x + p_i) over x = linspace(0, 2*pi, length), coefficients
    ``(n_classes, used_sines, 3)`` = [amplitude, frequency, phaseshift]
    drawn uniform [0, 2) when not given (reference defaults)."""
    if coefficients is None:
        rng = np.random.default_rng(seed)
        coefficients = 2 * rng.random((n_classes, used_sines, 3))
    coefficients = np.asarray(coefficients, dtype=np.float64)
    x = np.linspace(0, 2 * np.pi, num=length)
    a = coefficients[:, :, 0][:, :, None]
    f = coefficients[:, :, 1][:, :, None]
    p = coefficients[:, :, 2][:, :, None]
    return (a * np.sin(f * x[None, None, :] + p)).sum(axis=1)


def multisine_spark(
    spark,
    n_rows: int = 100,
    length: int = 100,
    n_classes: int = 2,
    used_sines: int = 3,
    coefficients: np.ndarray | None = None,
    noise_std: float = 0.5,
    seed: int = 0,
):
    """One multisine split as a DataFrame ``(doc_id long, label int,
    tokens array<double>, n_tok int)`` — generate train and test by
    calling twice with different ``seed``.

    Spark-first: the class models (tiny: n_classes x length doubles)
    inline as array literals; the per-(row, position) Gaussian noise is
    a hash -> Box-Muller projection evaluated JVM-side, so the table
    never exists on the driver, any slice is reproducible in isolation,
    and the values are independent of partitioning (unlike F.randn).
    Class labels follow the reference's contiguous block layout
    (:func:`multisine_sizes`)."""
    from pyspark.sql import functions as F

    models = multisine_models(length, n_classes, used_sines,
                              coefficients, seed)
    sizes = multisine_sizes(n_rows, n_classes)
    bounds = np.cumsum(sizes)
    label_case = "CASE " + " ".join(
        f"WHEN id < {int(b)} THEN {i}" for i, b in enumerate(bounds)
    ) + " END"
    model_arr = (
        "array(" + ", ".join(
            "array(" + ", ".join(f"{v!r}d" for v in row) + ")"
            for row in models
        ) + ")"
    )
    if noise_std > 0:
        # Box-Muller on two xxhash64-derived uniforms in (0, 1)
        u = (
            "((pmod(xxhash64({salt}, id, j, {seed}), 16777216) + 0.5d)"
            " / 16777216.0d)"
        )
        noise = (
            f"{noise_std!r}d * sqrt(-2.0d * ln({u.format(salt=1, seed=seed)}))"
            f" * cos(2.0d * pi() * {u.format(salt=2, seed=seed)})"
        )
    else:
        noise = "0.0d"
    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.expr(label_case).cast("int").alias("label"),
        F.expr(
            f"transform(sequence(0, {length - 1}), j -> "
            f"element_at({model_arr}, {label_case} + 1)[j] + {noise})"
        ).alias("tokens"),
        F.lit(length).cast("int").alias("n_tok"),
    )
