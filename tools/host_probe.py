#!/usr/bin/env python
"""Engine-independent host-window quality probe.

The shared-host benchmarking problem (BENCH/BASELINE.md round-4/5
protocol notes): wall-clock for byte-identical legs swings 2-4x with
invisible co-tenant load, and the *parallel* legs degrade more than
single-threaded ones — which corrupts N-vs-4N scaling pairs
asymmetrically. loadavg only sees this box's own runqueue, not the
host's, so it cannot adjudicate window quality.

This probe measures the two things the scaling pair actually depends
on — how much parallel headroom the box delivers *right now* on each
contention axis:

  * cpu — sha256 over a cache-resident 1 MB buffer (pure scheduling
          headroom, no memory-bus traffic);
  * mem — streaming sums over a buffer far larger than LLC (the
          memory-bandwidth axis that actually collapses under
          co-tenant load, and the one the engine's parallel legs are
          bound by — see the 8->32 plateau analysis).

For each axis: t1 = seconds for ONE worker; tn = per-worker mean for
`--workers` concurrent processes doing the same work (perfect box:
tn ~= t1); headroom = t1/tn in (0, 1].

Protocol: record one probe line immediately before each bench leg; a
north-rule pair is only adjudicable when both legs' probes show
mem_headroom in the same band and cpu t1 within ~10% of each other
(same-speed window). The probe costs ~15 s and does not touch the page
cache or tmpfs.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import time


def _hash_mb(mb: int) -> float:
    buf = os.urandom(1 << 20)
    t0 = time.monotonic()
    h = hashlib.sha256()
    for _ in range(mb):
        h.update(buf)
    return time.monotonic() - t0


def _stream_mb(mb: int) -> float:
    """Memory-bandwidth-bound variant: sum a buffer far larger than LLC.

    sha256 on a 1 MB buffer is cache-resident and measures only CPU
    scheduling headroom (it reads 1.0 even under heavy co-tenant memory
    traffic); the engine's parallel legs are bound by the memory plane,
    so window adjudication needs this axis too.
    """
    import numpy as np

    arr = np.random.randint(0, 255, size=(mb, 1 << 17), dtype=np.uint64)  # mb MB
    t0 = time.monotonic()
    s = 0
    for _ in range(8):
        s += int(arr.sum())
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=2048, help="MB hashed per worker")
    ap.add_argument(
        "--stream-mb", type=int, default=512, help="MB streamed per worker"
    )
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    out = {"load1": round(os.getloadavg()[0], 2), "workers": args.workers}
    for name, fn, mb in (
        ("cpu", _hash_mb, args.mb),
        ("mem", _stream_mb, args.stream_mb),
    ):
        t1 = fn(mb)
        with mp.Pool(args.workers) as pool:
            times = pool.map(fn, [mb] * args.workers)
        # per-worker mean is the honest "parallel speed" (pool wall adds
        # fork/IPC cost that is not the host's fault)
        tn = sum(times) / len(times)
        out[f"{name}_t1_sec"] = round(t1, 3)
        out[f"{name}_tn_sec"] = round(tn, 3)
        out[f"{name}_headroom"] = round(t1 / tn, 3) if tn else None
        out[f"{name}_mb"] = mb
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
