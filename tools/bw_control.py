"""Memory-bandwidth control for the scaling evidence: aggregate streaming
copy throughput of K concurrent processes, start-synchronized by a
barrier and measured over a fixed work quota each. On one box, DRAM
bandwidth is shared; a real 4N-node cluster multiplies it with nodes.

Usage: python tools/bw_control.py <procs> [mb_per_proc] [reps]
Prints one JSON line {"procs": K, "agg_gb_per_sec": X, ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, reps: int, barrier, out) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)  # warm / fault pages
    barrier.wait()
    t0 = time.monotonic()
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.monotonic() - t0
    out.put((reps * 2 * a.nbytes, dt))


def main() -> None:
    procs = int(sys.argv[1])
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [
        mp.Process(target=_worker, args=(mb, reps, barrier, q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    total_bytes = sum(r[0] for r in res)
    max_dt = max(r[1] for r in res)  # all start together; slowest defines wall
    print(
        json.dumps(
            {
                "procs": procs,
                "agg_gb_per_sec": round(total_bytes / max_dt / 1e9, 2),
                "slowest_proc_sec": round(max_dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
