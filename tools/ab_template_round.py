#!/usr/bin/env python
"""Interleaved A/B + scaling-pair harness over the prebuilt 20M template.

Runs ONE engine round using the code at the checkout given as argv[1]
against a fresh tmpfs copy of the 20M store template, optionally
re-batched to pop only part of the frontier (short legs = more
interleave repetitions per host window, which is what makes the
comparison noise-robust). Prints one JSON line with wall time, phases
and the load average at leg start/end.

Two uses, both driven by an alternating chain so neighbor noise cancels:
  * code adjudication: A=<HEAD> vs B=<r4 checkout> at the same
    (cores, batch) — the VERDICT round-4 protocol, at the 20M shape;
  * the north-rule pair: HEAD at 2 vs 8 cores, SPARK_GRAFT_REFERENCE_PARSER=1
    (per-row parse CPU dominates — the compute-bound regime the rule's
    N->4N criterion describes).

Usage: python tools/ab_template_round.py <repo> <cores> <batch> [label]
Env: SPARK_GRAFT_STORE_TEMPLATE (required), SPARK_GRAFT_SHUFFLE_MULT,
     SPARK_GRAFT_SCRATCH (default /dev/shm), SPARK_GRAFT_REFERENCE_PARSER.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    cores = int(sys.argv[2])
    batch = int(sys.argv[3])
    label = sys.argv[4] if len(sys.argv) > 4 else os.path.basename(repo)
    sys.path.insert(0, repo)

    template = os.environ["SPARK_GRAFT_STORE_TEMPLATE"]
    mult = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "3"))

    from ethereum_raw_data_crawler_spark.plans.rounds import CrawlEngine
    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(
        cores=cores, shuffle_partitions=cores * mult, app_name=f"ab-{label}"
    )

    root = tempfile.mkdtemp(
        prefix=f"ab_{label}_", dir=os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm")
    )
    load1_start = os.getloadavg()[0]
    try:
        subprocess.run(["cp", "-a", template, os.path.join(root, "store")], check=True)
        # re-batch the COPY so one leg pops `batch` of the 20M frontier
        # (the template stays pristine; resume() reads the rewritten cfg)
        cfg_path = os.path.join(root, "store", "config.json")
        with open(cfg_path) as fh:
            saved = json.load(fh)
        saved["cfg"]["batch_size"] = batch
        with open(cfg_path, "w") as fh:
            json.dump(saved, fh)
        eng = CrawlEngine.resume(spark, os.path.join(root, "store"))
        t0 = time.monotonic()
        stats = eng.run(max_rounds=1)
        wall = time.monotonic() - t0
        fetched = sum(s["fetched"] for s in stats)
        print(
            json.dumps(
                {
                    "label": label,
                    "cores": cores,
                    "batch": batch,
                    "wall_sec": round(wall, 2),
                    "urls_per_sec": round(fetched / wall, 1) if wall else 0.0,
                    "fetched": fetched,
                    "load1_start": round(load1_start, 2),
                    "load1_end": round(os.getloadavg()[0], 2),
                    "phases_ms": stats[0].get("phases_ms") if stats else None,
                    "discovered": stats[0].get("discovered") if stats else None,
                    "fetch_join": os.environ.get("SPARK_GRAFT_FETCH_JOIN", "shj"),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
