"""Self-check harness mimicking the driver's correctness gate:
run each queries() entry on Spark and its oracle_sql() in DuckDB at
sf0.01; compare row count, column set, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]

sf_dir must be a driver test-data directory holding ALL the oracle
parquet tables (default /root/testdata/sf0.01).  NOTE: the repo's own
local `sf0.01/` directory is NOT one of these — it holds only bench
token data and will be rejected here.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"rowcount spark={len(a)} oracle={len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return problems
    a, b = norm(a), norm(b)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(
                    av.astype(float), bv.astype(float),
                    rtol=0, atol=0, equal_nan=True,
                )
                if not ok:
                    bad = np.nonzero(
                        ~np.isclose(av.astype(float), bv.astype(float),
                                    rtol=0, atol=0, equal_nan=True)
                    )[0][:3]
                    problems.append(
                        f"col {c}: {len(bad)}+ mismatches, e.g. "
                        + ", ".join(
                            f"[{i}] {av.iloc[i]!r} vs {bv.iloc[i]!r}" for i in bad
                        )
                    )
            else:
                if not av.equals(bv):
                    bad = np.nonzero((av != bv).to_numpy())[0][:3]
                    problems.append(
                        f"col {c}: mismatches e.g. "
                        + ", ".join(
                            f"[{i}] {av.iloc[i]!r} vs {bv.iloc[i]!r}" for i in bad
                        )
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    missing = [t for t in TABLES if not os.path.exists(f"{sf_dir}/{t}.parquet")]
    if missing:
        print(f"error: {sf_dir} is not an oracle test-data directory — "
              f"missing tables: {' '.join(missing)}")
        print(f"expected all of: {' '.join(TABLES)}")
        print("hint: driver data lives at /root/testdata/sf{0.001,0.01,0.1}; "
              "the repo-local sf0.01/ holds only bench token data")
        return 2

    import __spark_entry__ as entrymod
    from fruits_spark.engine.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8, app="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
