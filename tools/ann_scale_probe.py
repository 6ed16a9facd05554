"""IVF vs brute-force ANN at scale: wall time + recall on a synthetic
100k x 64-d clustered embedding table.

Usage: python tools/ann_scale_probe.py [n_vectors] [cores]

Generates a deterministic clustered corpus fully JVM-side (no data
files), then measures exact cosine_topk against ivf_topk at a probe
fraction of ~nprobe/n_centroids, reporting wall seconds (min of
SPARK_GRAFT_PROBE_REPS warmed repeats, default 2 — the shared host's
protocol; see CLAUDE.md) and recall@10.  This quantifies the
candidate-shrink claim at a size where pruning matters (the sf0.1
recall grid's 2000 vectors fit in one list)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from _probe_metrics import ShuffleMeter, UI_EXTRA, fmt_bytes  # noqa: E402


def synth_embeddings(spark, n: int, d: int = 64, n_clusters: int = 50):
    """Deterministic clustered vectors: center(c)[j] = sin(1.7*(c+1)*j),
    point = center + 0.35 * sin(0.37 * (vec_id+1) * j) — pure
    projection, reproducible in any engine, never the zero vector."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {d}), j -> "
            f"sin(1.7d * cast(id % {n_clusters} + 1 as double) * j) + "
            f"0.35d * sin(0.37d * cast(id + 1 as double) * j))"
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from fruits_spark.engine.session import build_session
    from fruits_spark.pipeline import cosine_topk, ivf_topk

    spark = build_session(
        master=f"local[{cores}]", shuffle_partitions=cores,
        app="ann-scale", extra=UI_EXTRA,
    )

    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
    emb = synth_embeddings(spark, n).cache()
    emb.count()
    n_queries, k = 20, 10
    off = n // 2  # queries disjoint from the first-N seed window
    meter = ShuffleMeter(spark)

    def min_of(fn):
        best, out = float("inf"), None
        for _ in range(reps):
            meter.delta()
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            w, rd = meter.delta()
            if dt < best:
                best, out = dt, r
        return best, out, f"shuffle_w={fmt_bytes(w)} shuffle_r={fmt_bytes(rd)}"

    t_exact, exact, sh_exact = min_of(
        lambda: cosine_topk(emb, n_queries=n_queries, k=k, shards=32,
                            query_offset=off).collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["cand_id"])

    for n_cent, nprobe in ((64, 4), (256, 8)):
        t_ivf, res, sh_ivf = min_of(
            lambda: ivf_topk(
                emb, n_centroids=n_cent, n_queries=n_queries,
                nprobe=nprobe, k=k, shards=32, train_iters=2,
                query_offset=off,
            ).collect()
        )
        got = {}
        for r in res:
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        rec = sum(
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ) / len(truth)
        print(
            f"n={n} exact={t_exact:.1f}s ({sh_exact})  "
            f"ivf[{n_cent}x{nprobe}]="
            f"{t_ivf:.1f}s ({sh_ivf})  speedup={t_exact / t_ivf:.1f}x  "
            f"recall@{k}={rec:.3f}  scan_frac~{nprobe / n_cent:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
