"""Host memory-bandwidth probe: quantifies the ceiling behind the
local[8] -> local[32] scaling knee (BENCH.md).

Runs a STREAM-triad-like numpy pass (a = b + s*c over float64 arrays
far larger than LLC) in N independent processes pinned to the same
host, and reports aggregate GB/s at each worker count.  If aggregate
bandwidth stops growing between 8 and 32 workers, a memory-bound kernel
cannot scale past that knee on ONE node — while a real cluster adds
a full memory subsystem per executor node, which is the regime the
north rule's N -> 4N executor comparison targets.

Usage: python tools/bandwidth_probe.py [workers ...]  (default 1 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 20_000_000  # 3 arrays x 160 MB per worker >> any LLC
REPS = 5


N_STREAMS = 4  # triad touches: read b, read c, write tmp, (re)read tmp -> a


def _triad(barrier, q):
    import numpy as np

    b = np.ones(N)
    c = np.full(N, 2.0)
    a = np.empty(N)
    tmp = np.empty(N)
    # warm (page-in, incl. tmp — no allocation inside the timed loop)
    np.multiply(c, 3.0, out=tmp)
    np.add(b, tmp, out=a)
    barrier.wait()  # all workers hammer memory SIMULTANEOUSLY
    t0 = time.time()
    for _ in range(REPS):
        np.multiply(c, 3.0, out=tmp)
        np.add(b, tmp, out=a)
    q.put((t0, time.time()))


def run(workers: int) -> dict:
    barrier = mp.Barrier(workers)
    q = mp.Queue()
    ps = [mp.Process(target=_triad, args=(barrier, q)) for _ in range(workers)]
    for p in ps:
        p.start()
    spans = [q.get() for _ in ps]
    for p in ps:
        p.join()
    # aggregate over the SHARED window: total bytes / (last end - first
    # start) — per-worker best-of rates overstate when runs stagger
    wall = max(e for _, e in spans) - min(s for s, _ in spans)
    total_bytes = workers * REPS * N_STREAMS * 8 * N
    return {
        "workers": workers,
        "aggregate_gbs": round(total_bytes / wall / 1e9, 1),
        "per_worker_gbs": round(total_bytes / wall / 1e9 / workers, 2),
        "wall_sec": round(wall, 1),
    }


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    out = [run(c) for c in counts]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
