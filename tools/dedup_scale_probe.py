"""Dedup ops at scale: wall time + planted-pair recall on a synthetic
100k-doc corpus with known near-duplicates.

Usage: python tools/dedup_scale_probe.py [n_docs] [cores]

Corpus: 60-word documents over a 5000-word vocabulary, fully JVM-side;
every 10th document shares 55 of its 60 words with its predecessor
(shingle Jaccard ~0.8) — the planted near-dup pairs.  Measures exact
dedup, MinHash-LSH candidate generation (xxhash64, 16 hashes x 4
bands), and SimHash, reporting wall seconds, candidate volume, and
recall of the planted pairs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from _probe_metrics import ShuffleMeter, UI_EXTRA, fmt_bytes  # noqa: E402


def synth_docs(spark, n: int, n_words: int = 60, vocab: int = 5000):
    # word j of doc i comes from doc i-1 for j >= 5 when i % 10 == 0:
    # 55/60 words shared with the predecessor = a planted near-dup.
    # Words are xxhash64-derived (not a linear formula — a first draft
    # used (37*id + 101*j) % vocab, which makes docs i and i+vocab/gcd
    # IDENTICAL and explodes candidate volume with artifact pairs)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(0, {n_words - 1}), j -> "
            f"concat('w', cast(pmod(xxhash64(CASE WHEN id % 10 = 0 AND "
            f"id > 0 AND j >= 5 THEN id - 1 ELSE id END, j), {vocab}) "
            f"as string))))"
        ).alias("text"),
    )


def _run_embed_probe(spark, n, min_of):
    # embedding near-dup (LSH hyperplane blocking): clusters of ~50
    # vectors each (cluster count scales with n, cluster SIZE stays
    # constant — the realistic near-dup shape, so candidate pairs and
    # shuffle volume must grow ~linearly with n, which is the claim
    # this probe exists to check)
    import numpy as np

    from fruits_spark.pipeline import embedding_near_dups

    # SCALE RULE (measured the hard way): the hyperplane bit count must
    # grow with the corpus — b ≈ log2(n / target_bucket_size).  A fixed
    # 8-bit blocking (256 buckets) at 1M docs makes ~4k-vector buckets
    # and ~2e9 verify pairs (quadratic); 12 bits restores ~250-vector
    # buckets and linear candidate growth.
    bits = max(8, int(np.ceil(np.log2(max(n, 1) / 400))))
    rng_h = np.random.default_rng(42)
    planes = rng_h.choice(np.array([-1.0, 1.0]), size=(bits, 64))
    n_clusters = max(50, n // 50)
    # cluster centers use HASH-derived phases so distinct clusters are
    # decorrelated (a multiplicative sin(1.7*c*j) formula makes many
    # center pairs cosine-similar — measured 30.5M "true" pairs at 1M
    # docs, a superlinear corpus artifact, not an algorithm property)
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), j -> "
            f"sin(pmod(xxhash64(id % {n_clusters}, j), 6283) / 1000.0d) + "
            "0.35d * sin(0.37d * cast(id + 1 as double) * j))"
        ).alias("embedding"),
    ).cache()
    emb.count()
    # both verifiers: per-pair zip_with (expr) vs per-bucket int64 gram
    # (pandas) — identical pairs, very different cost on dense buckets.
    # The expr verify at n >= 1M is hours-slow; skip it there.
    if n <= 200_000:
        t_em, sh_em = min_of(
            lambda: embedding_near_dups(emb, planes, threshold=0.9).count()
        )
        n_em = embedding_near_dups(emb, planes, threshold=0.9).count()
        print(f"n={n} embed_near_dup[{bits}bit,expr] {t_em:.1f}s "
              f"pairs={n_em} {sh_em}", flush=True)
    t_eg, sh_eg = min_of(
        lambda: embedding_near_dups(
            emb, planes, threshold=0.9, verify="pandas"
        ).count()
    )
    n_eg = embedding_near_dups(
        emb, planes, threshold=0.9, verify="pandas"
    ).count()
    print(f"n={n} embed_near_dup[{bits}bit,gram] {t_eg:.1f}s pairs={n_eg} "
          f"{sh_eg}", flush=True)
    emb.unpersist()



def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from fruits_spark.engine.session import build_session
    from fruits_spark.pipeline import (
        exact_duplicates, jaccard_pairs, minhash_lsh_candidates, simhash,
    )

    spark = build_session(
        master=f"local[{cores}]", shuffle_partitions=cores,
        app="dedup-scale", extra=UI_EXTRA,
    )

    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
    # e.g. SPARK_GRAFT_PROBE_OPS=embed or exact,minhash,simhash,embed,jaccard
    ops = set(
        os.environ.get(
            "SPARK_GRAFT_PROBE_OPS", "exact,minhash,simhash,embed,jaccard"
        ).split(",")
    )
    docs = synth_docs(spark, n).cache()
    docs.count()
    planted = {(i - 1, i) for i in range(10, n, 10)}
    meter = ShuffleMeter(spark)

    def min_of(fn):
        """Warmed min-of-reps wall plus the shuffle write/read bytes of
        ONE run (shuffle volume is deterministic per plan)."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        meter.delta()
        fn()
        w, r = meter.delta()
        return best, f"shuffle_w={fmt_bytes(w)} shuffle_r={fmt_bytes(r)}"

    if "exact" in ops:
        t_ex, sh_ex = min_of(lambda: exact_duplicates(docs).count())
        nd = exact_duplicates(docs).count()
        print(f"n={n} exact_dup {t_ex:.1f}s groups={nd} {sh_ex}", flush=True)

    if "minhash" in ops:
        t_lsh, sh_lsh = min_of(
            lambda: minhash_lsh_candidates(docs, n_hashes=16, bands=4).count()
        )
        cand = minhash_lsh_candidates(docs, n_hashes=16, bands=4).cache()
        n_cand = cand.count()
        hits = {
            (r["doc_a"], r["doc_b"])
            for r in cand.join(
                spark.createDataFrame(
                    [(a, b) for a, b in planted], "doc_a long, doc_b long"
                ),
                ["doc_a", "doc_b"],
            ).collect()
        }
        rec = len(hits) / len(planted)
        print(f"n={n} minhash_lsh {t_lsh:.1f}s candidates={n_cand} "
              f"planted_recall={rec:.3f} "
              f"cand_frac={n_cand / (n * (n - 1) / 2):.2e} {sh_lsh}",
              flush=True)
        cand.unpersist()

    if "simhash" in ops:
        t_sh, sh_sh = min_of(lambda: simhash(docs).count())
        sh = simhash(docs).count()
        print(f"n={n} simhash fingerprints {t_sh:.1f}s rows={sh} {sh_sh}",
              flush=True)

    if "embed" in ops:
        _run_embed_probe(spark, n, min_of)

    if "jaccard" not in ops:
        spark.stop()
        return
    # capped exact Jaccard — the corpus-scale variant of the
    # verification oracle (stop-shingle cut bounds the self-join)
    t_j, sh_j = min_of(
        lambda: jaccard_pairs(
            docs, threshold=0.5, max_shingle_freq=100
        ).count()
    )
    jp = jaccard_pairs(docs, threshold=0.5, max_shingle_freq=100)
    n_jp = jp.count()
    j_hits = jp.join(
        spark.createDataFrame(
            [(a, b) for a, b in planted], "doc_a long, doc_b long"
        ),
        ["doc_a", "doc_b"],
    ).count()
    print(f"n={n} jaccard_capped {t_j:.1f}s pairs={n_jp} "
          f"planted_recall={j_hits / len(planted):.3f} {sh_j}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
