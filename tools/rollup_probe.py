"""Probe: where does the bench's rollup_t1k_salted + gapfill time go?

Interleaved warmed min-of-N (host is noisy — BENCH.md protocol) over:
  A  plain rollup_tier                 (one shuffle)
  B  rollup_tier_salted n_salts=16    (two shuffles; bench headline)
  C  rollup_tier_salted n_salts=4
  D  gap_fill as-is                    (spine join + wide fillna)
  E  gap_fill with broadcast spine
Run: python tools/rollup_probe.py [n_docs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    from fruits_spark.engine.session import build_session
    from fruits_spark.engine import rollup as RU
    from fruits_spark.engine.executor import extract_features, feature_columns

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = build_session(master="local[32]", shuffle_partitions=32,
                          app="rollup-probe")
    toks = B.ensure_tokens(spark, n_docs, f"/tmp/fruits_bench/tokens_{n_docs}")
    fplan = B._flagship_plan()
    fc = feature_columns(fplan)
    feats = extract_features(toks, fplan).cache()
    print("n_docs", feats.count(), "n_feat_cols", len(fc))

    def t1k_plain():
        RU.rollup_tier(feats, RU.Tier("t1k", 1000), 1024, fc).count()

    def t1k_s16():
        RU.rollup_tier_salted(feats, RU.Tier("t1k", 1000), 1024, fc,
                              n_salts=16).count()

    def t1k_s4():
        RU.rollup_tier_salted(feats, RU.Tier("t1k", 1000), 1024, fc,
                              n_salts=4).count()

    t1k = RU.rollup_tier_salted(feats, RU.Tier("t1k", 1000), 1024, fc,
                                n_salts=16).cache()
    t1k.count()
    spine = RU.bucket_spine(t1k, 1024)

    def gf_asis():
        RU.gap_fill(t1k, spine, fill_cols={f"sum_{fc[0]}": 0}).count()

    bspine = F.broadcast(spine)

    def gf_bcast():
        RU.gap_fill(t1k, bspine, fill_cols={f"sum_{fc[0]}": 0}).count()

    variants = {
        "A_plain": t1k_plain, "B_s16": t1k_s16, "C_s4": t1k_s4,
        "D_gf": gf_asis, "E_gf_bcast": gf_bcast,
    }
    best = {k: float("inf") for k in variants}
    for fn in variants.values():  # warm
        fn()
    for _ in range(4):
        for k, fn in variants.items():
            t0 = time.time()
            fn()
            best[k] = min(best[k], time.time() - t0)
    print({k: round(v, 3) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
