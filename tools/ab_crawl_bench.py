#!/usr/bin/env python
"""Interleaved A/B harness for the 1M crawl-round bench.

Runs ONE engine round (single attempt, no best-of-N) using the code at
the repo checkout given as argv[1], against the shared deterministic
corpus cache, and prints one JSON line with wall time + phase breakdown.

Interleave two checkouts (A,B,A,B,...) in one host window so neighbor
noise cancels and only the code delta remains — the adjudication
protocol VERDICT.md round 4 asked for.

Usage: python tools/ab_crawl_bench.py /path/to/checkout [n_pages] [label]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    label = sys.argv[3] if len(sys.argv) > 3 else os.path.basename(repo)
    sys.path.insert(0, repo)

    import pandas as pd

    from ethereum_raw_data_crawler_spark.config import CrawlConfig
    from ethereum_raw_data_crawler_spark.plans.rounds import CrawlEngine
    from ethereum_raw_data_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="ab_crawl")

    corpus_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft_bench_cache"),
        f"benchx_{n_pages}",
    )
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        raise FileNotFoundError(f"corpus missing: {corpus_dir}")

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(corpus_dir, "robots.parquet"))
    politeness_pdf = pd.read_parquet(os.path.join(corpus_dir, "politeness.parquet"))
    politeness_pdf["budget_per_round"] = n_pages
    politeness = spark.createDataFrame(politeness_pdf)

    root = tempfile.mkdtemp(prefix=f"ab_crawl_{label}_")
    load1 = os.getloadavg()[0]
    try:
        cfg = CrawlConfig(batch_size=n_pages)
        eng = CrawlEngine.create(
            spark, root, pages, seeds, robots, politeness, None, cfg,
            n_buckets=64, prune_pop=False,
        )
        t0 = time.monotonic()
        stats = eng.run(max_rounds=1)
        wall = time.monotonic() - t0
        fetched = sum(s["fetched"] for s in stats)
        print(
            json.dumps(
                {
                    "label": label,
                    "wall_sec": round(wall, 3),
                    "urls_per_sec": round(fetched / wall, 1) if wall else 0.0,
                    "fetched": fetched,
                    "load1_at_start": round(load1, 2),
                    "phases_ms": stats[0].get("phases_ms") if stats else None,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
