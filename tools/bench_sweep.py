"""Time EVERY registry query (spark side) at $SPARK_GRAFT_SF_DIR.

The round-6 optimization sweep instrument: one warm + N timed runs per
query, printed as a sorted table so the next hotspot is visible. Not part
of the driver bench contract (bench.py is frozen).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/bench_sweep.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from ethereum_raw_data_crawler_spark.queries import spark_queries
    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="bench_sweep")
    out = {}
    for name, fn in spark_queries().items():
        if name.startswith("crawl_"):
            continue  # rows-only crawl reads: covered by the crawl bench
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            fn(spark, sf_dir).collect()  # warm
            ts = []
            for _ in range(repeats):
                t0 = time.monotonic()
                fn(spark, sf_dir).collect()
                ts.append(time.monotonic() - t0)
            out[name] = min(ts)
        except Exception as e:  # keep sweeping; report at the end
            out[name] = float("nan")
            print(f"{name}: ERROR {e}", flush=True)
    for name, t in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.3f}s  {name}")
    print(f"total {sum(v for v in out.values() if v == v):.2f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
