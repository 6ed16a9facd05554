"""Worker-side time split of the extraction scan.

Usage: python tools/extract_split.py [n_docs] [cores]

Runs the flagship extraction once with ExtractStats time accumulators
and prints where the Python-worker time goes: Arrow batch -> flat
(values, offsets) flattening, the numpy kernels, and the output frame
build.  The 'accounted fraction' row compares summed worker time
against wall * cores — the remainder is JVM scan/Arrow encode,
scheduling, and idle tail, i.e. time no UDF-side optimization can
touch."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import bench as B
    from fruits_spark.engine.executor import ExtractStats, extract_features
    from fruits_spark.engine.session import build_session

    spark = build_session(
        master=f"local[{cores}]", shuffle_partitions=cores, app="split"
    )
    toks = B.ensure_tokens(
        spark, n_docs, f"/tmp/fruits_bench/tokens_{n_docs}"
    )
    fplan = B._flagship_plan()
    B.warmup(spark, toks, fplan, full=False)
    stats = ExtractStats(spark)
    t0 = time.time()
    extract_features(toks, fplan, stats=stats).count()
    wall = time.time() - t0
    d = stats.as_dict()
    tot_us = d["flatten_us"] + d["kernel_us"] + d["emit_us"]
    print(f"wall {wall:.2f} s   worker-cpu {tot_us / 1e6:.2f} s "
          f"({cores} cores)")
    for k in ("flatten_us", "kernel_us", "emit_us"):
        print(f"  {k:12s} {d[k] / 1e6:7.2f} s  {100 * d[k] / tot_us:5.1f}%")
    print(f"tokens {d['tokens']}  batches {d['batches']}")
    print(f"accounted fraction of wall*cores: "
          f"{tot_us / 1e6 / (wall * cores):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
