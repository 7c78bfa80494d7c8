"""Memory-bandwidth control for the scaling evidence: aggregate copy
throughput of K concurrent processes each streaming a large numpy buffer.
On one box, DRAM bandwidth is shared — this control shows how much
headroom 8 -> 32 workers actually has for memory-bound work, which is
what the optimized crawl round has become (the Python-CPU stages that
used to dominate are gone). A real 4N-node cluster multiplies bandwidth
with nodes; this box does not.

Usage: python tools/bw_control.py <procs> [mb_per_proc]
Prints one JSON line {"procs": K, "gb_per_sec": X}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, out) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.monotonic()
    reps = 8
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.monotonic() - t0
    out.put(reps * 2 * a.nbytes / dt)  # read + write bytes per second


def main() -> None:
    procs = int(sys.argv[1])
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(mb, q)) for _ in range(procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    total_bytes = procs * 8 * 2 * mb * 1024 * 1024
    print(
        json.dumps(
            {
                "procs": procs,
                "gb_per_sec": round(total_bytes / wall / 1e9, 1),
                "per_proc_gb_per_sec": round(sum(rates) / len(rates) / 1e9, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
